#!/usr/bin/env python
"""Benchmark harness: MLUPS/chip on the D2Q9 cylinder grid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: 5000 MLUPS/chip (BASELINE.md north-star target; the C++ reference
publishes no throughput numbers at all).

Times the pure compute path (chunked scan, no host IO) on the default
2048x512 grid — the reference's workload (LBMConfig.h:39-41) — in the
TPU-native f32 production dtype.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def bench(nx=2048, ny=512, backend="pallas", chunk_len=280, chunks=8,
          warmup=2, precision="f32", mesh_shape=(1, 1), verbose=False,
          reynolds=200.0):
    import jax
    import numpy as np

    from tpulbm.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    from tpulbm.config import SimulationParams, tau_for_reynolds
    from tpulbm.models import make_problem
    from tpulbm.parallel.mesh import make_mesh
    from tpulbm.parallel.sharded_step import make_chunk_fn, shard_state

    # the driver metric is at Re=200 (the re200 preset's stable parameters)
    params = SimulationParams(nx=nx, ny=ny, precision=precision,
                              backend=backend, mesh_shape=mesh_shape,
                              inlet_velocity=0.05,
                              tau=tau_for_reynolds(reynolds, 0.05, ny))
    problem = make_problem(params)
    n_dev = mesh_shape[0] * mesh_shape[1]
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n_dev])
    chunk = make_chunk_fn(problem, mesh, chunk_len, backend=backend)
    f, solid = shard_state(mesh, problem.initial_state(), problem.solid)

    def sync(arr):
        # On the remote-TPU platform block_until_ready returns immediately;
        # a tiny device_get is the reliable fence.
        jax.block_until_ready(arr)
        jax.device_get(arr[0, 0, :1])

    for _ in range(warmup):
        f = chunk(f, solid)
    sync(f)

    t0 = time.perf_counter()
    for _ in range(chunks):
        f = chunk(f, solid)
    sync(f)
    dt = time.perf_counter() - t0

    assert bool(np.isfinite(np.asarray(jax.device_get(f))).all()), "unstable"
    steps = chunks * chunk_len
    mlups = nx * ny * steps / dt / 1e6
    if verbose:
        print(f"# {backend} {nx}x{ny} {precision}: {steps} steps in {dt:.3f}s "
              f"→ {mlups:.0f} MLUPS", file=sys.stderr)
    return mlups, dt, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas", choices=["pallas", "jax"])
    ap.add_argument("--nx", type=int, default=2048)
    ap.add_argument("--ny", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--chunk-len", type=int, default=280)
    ap.add_argument("--precision", default="f32")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    backend = args.backend
    try:
        mlups, dt, steps = bench(nx=args.nx, ny=args.ny, backend=backend,
                                 chunk_len=args.chunk_len, chunks=args.chunks,
                                 precision=args.precision, verbose=args.verbose)
    except Exception as e:  # pallas unavailable → honest fallback, flagged
        if backend != "jax":
            print(f"# pallas backend failed ({type(e).__name__}: {e}); "
                  f"falling back to jax", file=sys.stderr)
            backend = "jax"
            mlups, dt, steps = bench(nx=args.nx, ny=args.ny, backend=backend,
                                     chunk_len=args.chunk_len,
                                     chunks=args.chunks,
                                     precision=args.precision,
                                     verbose=args.verbose)
        else:
            raise

    baseline = 5000.0
    print(json.dumps({
        "metric": "MLUPS/chip, D2Q9 cylinder 2048x512 f32 Re=200",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / baseline, 4),
        "backend": backend,
        "steps": steps,
        "wall_seconds": round(dt, 3),
        "wall_clock_per_1k_steps_s": round(dt / steps * 1000, 4),
    }))


if __name__ == "__main__":
    main()

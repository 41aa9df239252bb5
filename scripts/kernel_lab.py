#!/usr/bin/env python
"""Ablation lab for the D3Q19 tiled kernel: where does the time go?

The production 256^3 kernel (tpulbm/ops/step_pallas3d.py) sustains ~2.6
GLUPS — ~75 G raw pop-updates/s including the 1.5x y-overlap recompute —
against the ~103 G the 2-D kernels reach on the same VPU. BENCH.md's
dead-end ledger killed every *tuning* lever (deeper blocking, bigger
tiles, fewer ring slots, unroll, z-edge rewrites); the next lift needs a
structural change, and picking one blind is how dead ends happen.

This harness times the same slab-pipeline structure (y-tiled planes,
4-slot raw DMA ring, 2-slot out ring, fori_loop cascade over z) with
phases toggled, on a no-solid duct the size of the production benchmark:

  dma       ring DMA in + out only (the pure-bandwidth floor)
  collide   dma + BGK collide            (VPU: moments + equilibrium)
  stream    dma + pull-streaming rolls   (VPU/VMEM: 19 plane copies)
  bcs       dma + BC strip sweep         (edge sanitize/walls/inlet/outlet)
  full      dma + collide + stream + bcs (~ production N=1, mask-free)

Each variant is ONE substep per kernel launch (no temporal blocking) so
the phase costs superpose cleanly; compare `full` against the production
bench (bench.py --nz) to see what blocking buys on top.

Usage (TPU):   python scripts/kernel_lab.py --size 256 --iters 30
       (CPU):  python scripts/kernel_lab.py --size 32 --interpret --iters 1

Prints one JSON line per variant: effective MLUPS (output cells), raw
pop-rate (G pop-updates/s over the full Wy compute height), GB/s of DMA
traffic. Diagnostic tool only — not part of the product compute path.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulbm import lattice as lat_mod
from tpulbm.ops.step_pallas3d import _Cfg3d, _collide_planes

H = 8  # y-halo rows per side (sublane alignment), as in production


def make_lab_kernel(nz, ny, nx, Ty, *, do_collide, do_stream, do_bcs,
                    interpret=False, vmem_mb=13):
    """One-substep kernel over a pre-padded f of shape (Q, nz, ny+2H, nx).

    Mirrors the production tile geometry: grid over ny//Ty y-tiles, each
    tile DMAs (Q, Wy=Ty+2H, nx) plane slabs through a 4-slot ring, runs
    the enabled phases, and writes back the center Ty rows.
    """
    lat = lat_mod.D3Q19
    Q = lat.Q
    Wy = Ty + 2 * H
    n_ty = ny // Ty
    assert ny % Ty == 0
    u_in = 0.05
    eq_in = tuple(
        float(w * (1.0 + 3.0 * c[0] * u_in + 4.5 * (c[0] * u_in) ** 2
                   - 1.5 * u_in * u_in))
        for w, c in zip(lat.w, lat.c))
    cfg = _Cfg3d(
        Q=Q, c=tuple(tuple(int(v) for v in row) for row in lat.c),
        w=tuple(float(v) for v in lat.w),
        opp=tuple(int(v) for v in lat.opposite),
        inv_tau=1.0 / 0.6, omega_minus=None, mrt_uv=None, smag=0.0,
        eq_in=eq_in, src=None, has_solid=False, bounce_back=False,
        walls_y=True, walls_z=True, inlet_equilibrium=True,
        outlet_zero_grad=True, nz=nz, ny=Wy, nx=nx)

    def kernel(f_ref, out_ref, fa, ob, sem_f, sem_ob):
        tyi = pl.program_id(0)
        ya = pl.multiple_of(tyi * Ty, 8 if not interpret else 1)
        yc = pl.multiple_of(tyi * Ty + H, 8 if not interpret else 1)

        def f_dma(z):
            return pltpu.make_async_copy(
                f_ref.at[:, z, pl.ds(ya, Wy), :], fa.at[z % 4],
                sem_f.at[z % 4])

        def out_dma(z):
            return pltpu.make_async_copy(
                ob.at[z % 2, :, H:H + Ty, :],
                out_ref.at[:, z, pl.ds(yc, Ty), :], sem_ob.at[z % 2])

        def collide(slot):
            fw = [fa[slot, i] for i in range(Q)]
            fp = _collide_planes(cfg, fw, None)
            for i in range(Q):
                fa[slot, i] = fp[i]

        eq_plane = [jnp.full((Wy, nx), cfg.eq_in[i], jnp.float32)
                    for i in range(Q)]

        f_dma(0).start()
        if nz > 1:
            f_dma(1).start()
        f_dma(0).wait()
        if do_collide:
            collide(0)

        def loop(z, carry):
            @pl.when(z + 1 < nz)
            def _():
                f_dma(z + 1).wait()
                if do_collide:
                    collide((z + 1) % 4)

            @pl.when(z + 2 < nz)
            def _():
                f_dma(z + 2).start()

            oslot = z % 2

            @pl.when(z >= 2)
            def _():
                out_dma(z - 2).wait()

            cur = z % 4
            for i in range(Q):
                cx, cy, cz = cfg.c[i]
                if do_stream:
                    if cz == 0:
                        plane = fa[cur, i]
                    elif cz > 0:
                        plane = fa[(z - 1) % 4, i]
                    else:
                        plane = fa[(z + 1) % 4, i]
                    if cy:
                        plane = pltpu.roll(plane, cy % Wy, axis=0)
                    if cx:
                        plane = pltpu.roll(plane, cx % nx, axis=1)
                else:
                    plane = fa[cur, i]
                ob[oslot, i] = plane

            if do_stream:
                @pl.when(z == 0)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] > 0:
                            ob[oslot, i] = eq_plane[i]

                @pl.when(z == nz - 1)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] < 0:
                            ob[oslot, i] = eq_plane[i]

            if do_bcs:
                # edge sanitize (x) + walls (y/z) + inlet/outlet, strip ops
                # on the output slot — the production sweep minus the mask
                # guards (no solid here)
                for i in range(Q):
                    cx, cy, cz = cfg.c[i]
                    if cx:
                        xc = 0 if cx > 0 else nx - 1
                        if cz > 0:
                            val = jnp.where(z == 0, cfg.eq_in[i], 0.0)
                        elif cz < 0:
                            val = jnp.where(z == nz - 1, cfg.eq_in[i], 0.0)
                        else:
                            val = jnp.float32(0.0)
                        ob[oslot, i, :, xc:xc + 1] = jnp.broadcast_to(
                            val, (Wy, 1)).astype(jnp.float32)
                    if cy > 0:
                        @pl.when(tyi == 0)
                        def _(i=i):
                            ob[oslot, i, H:H + 1, :] = ob[
                                oslot, cfg.opp[i], H:H + 1, :]
                    elif cy < 0:
                        @pl.when(tyi == n_ty - 1)
                        def _(i=i):
                            ob[oslot, i, H + Ty - 1:H + Ty, :] = ob[
                                oslot, cfg.opp[i], H + Ty - 1:H + Ty, :]

                @pl.when(z == 0)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] > 0:
                            ob[oslot, i] = ob[oslot, cfg.opp[i]]

                @pl.when(z == nz - 1)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] < 0:
                            ob[oslot, i] = ob[oslot, cfg.opp[i]]

                for i in range(Q):
                    ob[oslot, i, :, 0:1] = jnp.full((Wy, 1), cfg.eq_in[i],
                                                    jnp.float32)
                    ob[oslot, i, :, nx - 1:nx] = ob[oslot, i, :,
                                                    nx - 2:nx - 1]

            out_dma(z).start()
            return carry

        lax.fori_loop(0, nz, loop, 0, unroll=False)
        if nz >= 2:
            out_dma(nz - 2).wait()
        out_dma(nz - 1).wait()

    vmem = int(vmem_mb * 1024 * 1024)
    # input and output share the padded (Q, nz, ny + 2H, nx) shape so
    # iterations chain through a lax.fori_loop inside ONE jit program (a
    # per-iteration dispatch would pay the 50-400 ms relay latency). Only
    # the center rows are written; the pad rows of the chained value are
    # garbage after the first iteration, which is harmless for timing
    # (TPU f32 NaN arithmetic runs at full rate) but means the outputs
    # carry no physics.
    call = pl.pallas_call(
        kernel,
        grid=(n_ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nz, ny + 2 * H, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, Q, Wy, nx), jnp.float32),
            pltpu.VMEM((2, Q, Wy, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem + 3 * 1024 * 1024),
        interpret=interpret,
    )
    return call, Q, Wy


VARIANTS = {
    "dma": dict(do_collide=False, do_stream=False, do_bcs=False),
    "collide": dict(do_collide=True, do_stream=False, do_bcs=False),
    "stream": dict(do_collide=False, do_stream=True, do_bcs=False),
    "bcs": dict(do_collide=False, do_stream=False, do_bcs=True),
    "full": dict(do_collide=True, do_stream=True, do_bcs=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256, help="cube edge")
    ap.add_argument("--ty", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--variants", default="dma,collide,stream,bcs,full")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    from tpulbm.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    n = args.size
    nz = ny = nx = n
    Ty = args.ty

    rng = np.random.default_rng(0)
    for name in args.variants.split(","):
        call, Q, Wy = make_lab_kernel(nz, ny, nx, Ty,
                                      interpret=args.interpret,
                                      **VARIANTS[name])
        # pre-padded input: (Q, nz, ny + 2H, nx), positive everywhere so
        # collide's 1/rho is safe on the first iteration
        f = jnp.asarray(
            rng.uniform(0.02, 0.08, (Q, nz, ny + 2 * H, nx)).astype(
                np.float32))

        @functools.partial(jax.jit, static_argnums=1)
        def run(f, iters, _call=call):
            return lax.fori_loop(0, iters, lambda i, g: _call(g), f)

        f = run(f, 2)
        jax.device_get(f[0, 0, H, :1])

        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            g = run(f, args.iters)
            jax.device_get(g[0, 0, H, :1])
            best = min(best, time.perf_counter() - t0)

        cells = nz * ny * nx * args.iters
        mlups = cells / best / 1e6
        raw_pops = cells * Q * (Wy / Ty) / best / 1e9
        # traffic: slab reads (Wy/Ty of f) + center write
        gbs = cells * Q * 4 * (Wy / Ty + 1) / best / 1e9
        print(json.dumps({
            "variant": name, "size": n, "ty": Ty, "iters": args.iters,
            "mlups_effective": round(mlups, 1),
            "raw_gpops": round(raw_pops, 2),
            "dma_gbs_min": round(gbs, 1),
            "best_s": round(best, 3)}), flush=True)


if __name__ == "__main__":
    main()

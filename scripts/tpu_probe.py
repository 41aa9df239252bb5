#!/usr/bin/env python
"""On-silicon probe ladder: run every Pallas kernel family on the REAL TPU
and assert it matches the jax tier (the oracle) on the same chip.

Round 3 shipped a batch of fused kernels while the TPU relay was wedged;
they were interpret-mode-equivalent only (ROADMAP "Known next levers" #0).
Interpret mode and Mosaic-on-silicon are exactly the layer that can diverge
(the dense-MRT form compiled in interpret mode and overflowed scoped-vmem
on hardware) — so each config below runs BOTH backends on the TPU for a
few chunks and compares the raw f state.

Usage (one TPU process at a time — never run two concurrently):
    python scripts/tpu_probe.py [--only name1,name2] [--fresh]

Results append to runs/tpu_probe_r05.jsonl; configs already recorded with
ok=true are skipped on re-runs (remote compiles cost 30-90 s/program, so
the ladder is resumable). A pallas run that silently demotes to the jax
tier (a "falling back" warning) is recorded as DEMOTED, not verified.
Configs carrying an expected blocking depth additionally assert the
chunk fn actually chose that depth (a silent fall-through to a shallower
kernel would otherwise make the probe vacuous).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "runs", "tpu_probe_r05.jsonl")


def configs():
    """name -> (SimulationParams, n_chunks, chunk_len, env_overrides)."""
    from tpulbm.config import PRESETS, SimulationParams

    cyl = dict(nx=256, ny=64, tau=0.55, inlet_velocity=0.05,
               precision="f32")
    out = {}
    # --- collision-operator ladder on the cylinder (2-D kernels) ---
    out["trt"] = (SimulationParams(collision="trt", **cyl), 2, 10, {})
    out["mrt"] = (SimulationParams(collision="mrt", **cyl), 2, 10, {})
    out["kbc"] = (SimulationParams(collision="kbc", **cyl), 2, 10, {})
    out["regularized"] = (SimulationParams(collision="regularized", **cyl),
                          2, 10, {})
    out["les2d"] = (SimulationParams(smagorinsky=0.17, **cyl), 2, 10, {})
    out["power-law"] = (SimulationParams(power_law_n=0.7, **cyl), 2, 10, {})
    # bouzidi curved walls fused (q table riding the slab pipeline)
    out["bouzidi"] = (SimulationParams(obstacle_bc="bouzidi", **cyl),
                      2, 10, {})
    out["bouzidi-moving"] = (SimulationParams(obstacle_bc="bouzidi",
                                              cylinder_omega=0.02, **cyl),
                             2, 10, {})
    # blocked bouzidi: the q table through the N-step cascade (q slab ring
    # + q halo rows for the ghost chains). TPULBM_PALLAS_TY=8 keeps
    # n_ty >= N+1 at this small probe grid; the depth assertion guards
    # against a silent fall-through to the 1-step kernel.
    out["bouzidi-blocked"] = (SimulationParams(obstacle_bc="bouzidi", **cyl),
                              2, 12, {"TPULBM_SUBSTEPS": "4",
                                      "TPULBM_PALLAS_TY": "8"}, 4)
    out["bouzidi-moving-blocked"] = (
        SimulationParams(obstacle_bc="bouzidi", cylinder_omega=0.02, **cyl),
        2, 12, {"TPULBM_SUBSTEPS": "4", "TPULBM_PALLAS_TY": "8"}, 4)
    # blocked halo-overlap split (TPULBM_HALO_OVERLAP composed with the
    # N-step cascade, VERDICT r4 #5): three ranged calls per N steps —
    # interior range on raw-local chains, edge ranges on the exchanged
    # rings, outputs stitched via aliasing. ny=384 so the TPU's Ty%8 rule
    # still leaves >= 3*(N+1) slabs; the depth assertion guards against a
    # silent fall-through to the 1-step split or the monolithic kernel.
    ov_cyl = dict(nx=256, ny=384, tau=0.55, inlet_velocity=0.05,
                  precision="f32")
    out["overlap-blocked"] = (SimulationParams(**ov_cyl), 2, 12,
                              {"TPULBM_HALO_OVERLAP": "1",
                               "TPULBM_SUBSTEPS": "4"}, 4)
    out["overlap-blocked-bouzidi"] = (
        SimulationParams(obstacle_bc="bouzidi", **ov_cyl), 2, 12,
        {"TPULBM_HALO_OVERLAP": "1", "TPULBM_SUBSTEPS": "4"}, 4)
    # lane-padded unaligned width (nx=250 pads to 256 lanes in-kernel)
    out["lane-padded"] = (SimulationParams(nx=250, ny=64, tau=0.55,
                                           inlet_velocity=0.05,
                                           precision="f32"), 2, 10, {})
    # x-tiled kernel (forced single-device tiling — the wide-grid path)
    out["x-tiled"] = (SimulationParams(**cyl), 2, 10,
                      {"TPULBM_FORCE_TILED": "1"})
    # --- thermal family (fused 14-plane kernel) ---
    out["thermal-rb"] = (PRESETS["rayleigh-benard"].replace(
        precision="f32"), 2, 10, {})
    out["thermal-rb-les"] = (PRESETS["rayleigh-benard"].replace(
        precision="f32", smagorinsky=0.17), 2, 10, {})
    out["heated-cavity"] = (PRESETS["heated-cavity"].replace(
        precision="f32"), 2, 10, {})
    out["passive-scalar"] = (SimulationParams(
        nx=128, ny=64, problem="passive-scalar", tau=0.8, thermal_tau=0.7,
        inlet_velocity=0.05, periodic_x=True, cylinder_radius=0.0,
        precision="f32"), 2, 10, {})
    # --- multiphase (psi-stencil pipeline, depth-2 rings) ---
    out["multiphase"] = (SimulationParams(
        nx=256, ny=64, problem="multiphase", tau=1.0, shan_chen_g=-5.0,
        cylinder_radius=0.15, cylinder_x=0.5, cylinder_y=0.5,
        inlet_velocity=0.0, precision="f32"), 2, 10, {})
    # x-halo (stitched x-sharded) multiphase on one chip: periodic
    # ring_cols wrap the shard's own edges, so the depth-2 stitched
    # Mosaic program must match the full-width jax tier exactly
    out["multiphase-xhalo"] = (SimulationParams(
        nx=256, ny=64, problem="multiphase", tau=1.0, shan_chen_g=-5.0,
        cylinder_radius=0.15, cylinder_x=0.5, cylinder_y=0.5,
        inlet_velocity=0.0, precision="f32"), 2, 10,
        {"TPULBM_FORCE_XHALO": "1"})
    # --- periodic boxes (wrapped rings) ---
    out["periodic-2d"] = (PRESETS["taylor-green"].replace(
        precision="f32"), 2, 10, {})
    out["periodic-3d"] = (PRESETS["taylor-green"].replace(
        nx=128, ny=64, nz=32, precision="f32"), 1, 6, {})
    # --- Kolmogorov forcing (in-kernel coords, blocked ladder) ---
    out["kolmogorov-2d"] = (PRESETS["kolmogorov"].replace(
        precision="f32"), 2, 10, {})
    out["kolmogorov-2d-tiled"] = (PRESETS["kolmogorov"].replace(
        precision="f32"), 2, 10, {"TPULBM_FORCE_TILED": "1"})
    out["kolmogorov-3d"] = (PRESETS["kolmogorov3d"].replace(
        nx=128, ny=64, nz=32, precision="f32"), 1, 6, {})
    # y-tiled periodic kernels (in-kernel wrapped z ring planes + per-tile
    # force coords — the path big periodic boxes and sharded meshes take)
    out["periodic-3d-tiled"] = (PRESETS["taylor-green"].replace(
        nx=128, ny=64, nz=32, precision="f32"), 1, 6,
        {"TPULBM_FORCE_TILED": "1"})
    out["kolmogorov-3d-tiled"] = (PRESETS["kolmogorov3d"].replace(
        nx=128, ny=64, nz=32, precision="f32"), 1, 6,
        {"TPULBM_FORCE_TILED": "1"})
    # blocked periodic: the extended z sweep (wrapped refetches, no zc)
    out["periodic-3d-blocked"] = (PRESETS["taylor-green"].replace(
        nx=128, ny=64, nz=32, precision="f32"), 1, 6,
        {"TPULBM_FORCE_TILED": "1", "TPULBM_SUBSTEPS": "3"})
    out["kolmogorov-3d-blocked"] = (PRESETS["kolmogorov3d"].replace(
        nx=128, ny=64, nz=32, precision="f32"), 1, 6,
        {"TPULBM_FORCE_TILED": "1", "TPULBM_SUBSTEPS": "3"})
    # --- 3-D kernels ---
    out["d3q19"] = (SimulationParams(nx=128, ny=32, nz=32,
                                     problem="cylinder3d", tau=0.6,
                                     inlet_velocity=0.05,
                                     precision="f32"), 1, 6, {})
    out["d3q27"] = (SimulationParams(nx=128, ny=32, nz=32,
                                     problem="cylinder3d", lattice3d="d3q27",
                                     tau=0.6, inlet_velocity=0.05,
                                     precision="f32"), 1, 6, {})
    out["les3d"] = (SimulationParams(nx=128, ny=32, nz=32,
                                     problem="cylinder3d", tau=0.55,
                                     inlet_velocity=0.05, smagorinsky=0.17,
                                     precision="f32"), 1, 6, {})
    out["d3q19-regularized"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="cylinder3d", tau=0.6,
        collision="regularized", inlet_velocity=0.05,
        precision="f32"), 1, 6, {})
    out["d3q19-powerlaw"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="cylinder3d", tau=0.6,
        power_law_n=0.7, inlet_velocity=0.05, precision="f32"), 1, 6, {})
    # 3-D bouzidi through the y-tiled kernel (q slab, center rows only)
    out["bouzidi-3d"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="cylinder3d", tau=0.6,
        obstacle_bc="bouzidi", inlet_velocity=0.05, cylinder_radius=0.23,
        precision="f32"), 1, 6, {"TPULBM_SUBSTEPS": "1"}, 1)
    # 3-D blocked bouzidi: q tiles widened to the buffer height, halo rows
    # via qb/qt DMAs + ring_rows_3d of the link table
    out["bouzidi-3d-blocked"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="cylinder3d", tau=0.6,
        obstacle_bc="bouzidi", inlet_velocity=0.05, cylinder_radius=0.23,
        precision="f32"), 1, 6, {"TPULBM_SUBSTEPS": "3"}, 3)
    # mixed-periodicity duct (periodic x, walls y+z): the y-tiled kernel
    # wraps x via native lane rolls; blocked cascade
    out["duct-3d"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="poiseuille", tau=0.8,
        body_force=(1e-5, 0.0), inlet_velocity=0.0,
        precision="f32"), 1, 6, {})
    # inlet-piercing solid: the pierced edge keeps its ghost-sanitize
    # strip live (eq ghost columns) under the fluid-masked inlet
    out["piercing-solid-3d"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="cylinder3d", tau=0.6,
        obstacle_bc="bounce_back", inlet_velocity=0.05, cylinder_y=0.5,
        cylinder_radius=0.2, precision="f32"), 1, 6, {})
    # x-halo (stitched x-sharded) tiles on one chip: ring_cols degenerates
    # to the physical-edge eq blocks, exercising the exact Mosaic program
    # an x-sharded shard runs — incl. the q slab at owned columns
    out["d3q19-xhalo"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="cylinder3d", tau=0.6,
        inlet_velocity=0.05, precision="f32"), 1, 6,
        {"TPULBM_FORCE_XHALO": "1"})
    out["bouzidi-3d-xhalo"] = (SimulationParams(
        nx=128, ny=32, nz=32, problem="cylinder3d", tau=0.6,
        obstacle_bc="bouzidi", inlet_velocity=0.05, cylinder_radius=0.23,
        precision="f32"), 1, 6, {"TPULBM_FORCE_XHALO": "1"})
    return out


def run_backend(params, backend, n_chunks, chunk_len, expect_depth=None):
    """Run n_chunks x chunk_len steps; return (np_state, seconds, warns)."""
    import jax
    import numpy as np
    from tpulbm.models import make_problem
    from tpulbm.parallel.mesh import make_mesh
    from tpulbm.parallel.sharded_step import make_chunk_fn, shard_state

    params = params.replace(backend=backend)
    problem = make_problem(params)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    caught = []
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        chunk = make_chunk_fn(problem, mesh, chunk_len, backend=backend)
        caught = [str(x.message) for x in w]
    if expect_depth is not None and backend == "pallas":
        got_depth = getattr(chunk, "pallas_substeps", None)
        d3 = getattr(chunk, "pallas3d_depths", None)
        if d3:
            got_depth = d3[0]
        if got_depth != expect_depth:
            raise RuntimeError(
                f"expected blocking depth {expect_depth}, dispatch chose "
                f"{got_depth} (silent fall-through — probe would be vacuous)")
    solid = problem.solid if problem.solid is not None else \
        np.zeros(problem.spatial_shape, bool)
    f, solid = shard_state(mesh, problem.initial_state(), solid)
    f = chunk(f, solid)                       # compile + first chunk
    jax.device_get(f.addressable_shards[0].data[0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(n_chunks - 1):
        f = chunk(f, solid)
    out = np.asarray(jax.device_get(f))
    dt = time.perf_counter() - t0
    return out, dt, caught


def probe_thermal_x_halo(preset_name):
    """Silicon probe for the x-SHARDED thermal kernel (x_halo=True).

    Only one real chip exists, so emulate a 2-shard x decomposition on it:
    split the grid into two x-halves, build the halo.ring_cols /
    ring_rows_ext ring contents by plain slicing (no ppermute), run the
    stitched-halo kernel per half for n steps, and compare the reassembled
    state to the rolled jax oracle. Verifies exactly what a multi-chip
    x-sharded mesh would run per shard (Mosaic compile + numerics); the
    ring exchange itself is gated by the CPU shard_map tests."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpulbm.config import PRESETS
    from tpulbm.models import make_problem
    from tpulbm.ops.step_thermal import make_step_thermal
    from tpulbm.ops.step_thermal_pallas import make_local_step_thermal_pallas

    name = f"thermal-x-halo-{preset_name}"
    rec = {"name": name, "chunks": 1, "chunk_len": 20, "grid": "256x64"}
    try:
        params = PRESETS[preset_name].replace(precision="f32", nx=256,
                                              ny=64)
        pr = make_problem(params)
        n_steps = 20

        step_ref = jax.jit(make_step_thermal(pr))
        s = jnp.asarray(pr.initial_state())
        ref = s
        for _ in range(n_steps):
            ref = step_ref(ref)
        ref = np.asarray(jax.device_get(ref))

        nxl = params.nx // 2
        kern = make_local_step_thermal_pallas(pr, (params.ny, nxl),
                                              interpret=False, x_halo=True)
        Hx = kern.halo_width
        eq = jnp.asarray(pr.ghost_ring_values(), jnp.float32)
        Qs = eq.shape[0]
        periodic_x = pr.periodic_x
        eq_cols = jnp.broadcast_to(eq[:, None, None],
                                   (Qs, params.ny, Hx))
        eq_rows = jnp.broadcast_to(eq[:, None, None],
                                   (Qs, 1, nxl + 2 * Hx))
        fl_a = jnp.array([1, 1, 0 if periodic_x else 1, 0], jnp.int32)
        fl_b = jnp.array([1, 1, 0, 0 if periodic_x else 1], jnp.int32)

        def rings(me, other, is_left):
            # ring_cols semantics, sliced instead of ppermuted: depth-1
            # meaningful columns (right-aligned in rl, left-aligned in rr),
            # eq fill elsewhere / at physical walls_x edges
            west_open = periodic_x or not is_left
            east_open = periodic_x or is_left
            rl = eq_cols.at[:, :, Hx - 1].set(other[:, :, -1]) \
                if west_open else eq_cols
            rr = eq_cols.at[:, :, 0].set(other[:, :, 0]) \
                if east_open else eq_cols
            return rl, rr

        @jax.jit
        def two_shard_step(a, b):
            rl_a, rr_a = rings(a, b, True)
            rl_b, rr_b = rings(b, a, False)
            # both presets have physical y walls: rb/rt content is
            # overridden in-kernel by the ghost equilibrium (flags y=1)
            a2 = kern(a, eq_rows, eq_rows, fl_a, rl_a, rr_a)
            b2 = kern(b, eq_rows, eq_rows, fl_b, rl_b, rr_b)
            return a2, b2

        a, b = s[:, :, :nxl], s[:, :, nxl:]
        for _ in range(n_steps):
            a, b = two_shard_step(a, b)
        got = np.concatenate([np.asarray(jax.device_get(a)),
                              np.asarray(jax.device_get(b))], axis=-1)
        err = float(np.max(np.abs(got - ref) /
                           (np.abs(ref) * 5e-6 + 1e-7)))
        ok = err <= 2.0
        rec.update(ok=bool(ok), status="PASS" if ok else "MISMATCH",
                   rel_err_units=round(err, 3))
    except Exception as e:
        rec.update(ok=False, status="ERROR",
                   error=f"{type(e).__name__}: {e}")
    return rec


SPECIAL_PROBES = {
    "thermal-x-halo-rb": lambda: probe_thermal_x_halo("rayleigh-benard"),
    "thermal-x-halo-cavity": lambda: probe_thermal_x_halo("heated-cavity"),
}


def probe_one(name, params, n_chunks, chunk_len, env, expect_depth=None):
    old_env = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        rec = {"name": name, "chunks": n_chunks, "chunk_len": chunk_len,
               "grid": f"{params.nx}x{params.ny}" +
                       (f"x{params.nz}" if params.nz else "")}
        if expect_depth is not None:
            rec["depth"] = expect_depth
        ref, _, _ = run_backend(params, "jax", n_chunks, chunk_len)
        got, dt, warns = run_backend(params, "pallas", n_chunks, chunk_len,
                                     expect_depth=expect_depth)
        demoted = [w for w in warns if "falling back" in w
                   or "jax tier" in w]
        if demoted:
            rec.update(ok=False, status="DEMOTED", warning=demoted[0])
            return rec
        import numpy as np
        err = float(np.max(np.abs(got - ref) /
                           (np.abs(ref) * 5e-6 + 1e-7)))
        # bound 2.0 units (unit = rtol 5e-6 + atol 1e-7, the interpret-mode
        # gate tolerance): on silicon the two tiers compile through
        # different fma contractions, and the measured drift of the
        # KNOWN-good BGK kernels after 20 steps is ~0.5 units — 2 units
        # keeps that roundoff-growth headroom while still catching real
        # divergences (the KBC guard bug measured 119 units).
        ok = err <= 2.0
        rec.update(ok=bool(ok), status="PASS" if ok else "MISMATCH",
                   rel_err_units=round(err, 3),
                   pallas_extra_chunks_s=round(dt, 3))
        return rec
    except Exception as e:
        rec.update(ok=False, status="ERROR",
                   error=f"{type(e).__name__}: {e}")
        return rec
    finally:
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated config names")
    ap.add_argument("--fresh", action="store_true",
                    help="re-run configs already recorded ok")
    args = ap.parse_args()

    from tpulbm.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    done = set()
    if os.path.exists(RESULTS) and not args.fresh:
        with open(RESULTS) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if r.get("ok"):
                    done.add(r["name"])

    cfgs = configs()
    names = (args.only.split(",") if args.only
             else list(cfgs) + list(SPECIAL_PROBES))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    n_fail = 0
    for name in names:
        if name in done:
            print(f"# {name}: already ok, skipping", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        if name in SPECIAL_PROBES:
            rec = SPECIAL_PROBES[name]()
            rec["wall_s"] = round(time.perf_counter() - t0, 1)
            with open(RESULTS, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
            if not rec["ok"]:
                n_fail += 1
            continue
        params, n_chunks, chunk_len, env, *opt = cfgs[name]
        expect_depth = opt[0] if opt else None
        rec = probe_one(name, params, n_chunks, chunk_len, env,
                        expect_depth=expect_depth)
        rec["wall_s"] = round(time.perf_counter() - t0, 1)
        with open(RESULTS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        if not rec["ok"]:
            n_fail += 1
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""The distributed chunked time-stepper: shard_map + lax.scan.

TPU-native equivalent of the reference's Solver::run hot loop
(LBMSolver.h:43-78): the per-step sequence collision → halo exchange →
streaming → BCs runs entirely on-device for `chunk_len` steps under one
`lax.scan` inside one `shard_map` region; host interaction (forces, VTK,
stability abort) happens only at chunk boundaries (runner.py), replacing the
reference's every-step MPI_Allreduce sync (LBMSolver.h:60; SURVEY §6: its
scalability ceiling).

Layout: global state f is (Q, [z,] ny, nx) sharded over a ('y','x') device
mesh; inside the region each shard steps a halo-padded local block, with the
ring refreshed by two-phase ppermute (parallel/halo.py).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.base import Problem
from ..ops.step_jax import make_local_step_padded
from . import halo
from .mesh import local_block_shape


def _blocking_split(chunk_len: int, n_sub: int):
    """Factor chunk_len into [(depth, iters), ...] segments led by depth
    n_sub with a shallower tail, so temporal blocking engages at ANY output
    cadence — e.g. the production default of 140 steps/interval becomes
    46×3 + 1×2 instead of silently dropping to depth 2 (140 % 3 != 0).
    Returns None when n_sub cannot lead (chunk too short)."""
    if n_sub == 3:
        k2 = (0, 2, 1)[chunk_len % 3]
        k3 = (chunk_len - 2 * k2) // 3
        if k3 < 1:
            return None
        return [(3, k3)] + ([(2, k2)] if k2 else [])
    if n_sub == 2:
        k2, k1 = divmod(chunk_len, 2)
        if k2 < 1:
            return None
        return [(2, k2)] + ([(1, k1)] if k1 else [])
    return [(n_sub, chunk_len // n_sub)] if chunk_len % n_sub == 0 else None


def make_chunk_fn(problem: Problem, mesh: Mesh, chunk_len: int,
                  backend: str = "jax", _raw: bool = False):
    """Build a jitted fn(f, solid) -> f advanced by chunk_len steps.

    f: global (Q, *spatial) array (sharded or to-be-sharded); donated.
    solid: global bool mask (or None-placeholder of zeros when no obstacle).
    _raw: return the un-jitted shard_map callable (for composition inside a
    larger jit, e.g. make_super_chunk_fn).
    """
    spatial = problem.spatial_shape
    ndim = len(spatial)
    local_shape = local_block_shape(mesh, spatial)
    mesh_shape = tuple(mesh.devices.shape)
    eq_ring = problem.ghost_ring_values()
    has_solid = problem.solid is not None

    if backend not in ("jax", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    local_step = None
    bz_q = None
    pallas_substeps = None   # 2-D generic ladder's blocking depth (introspection)
    if problem.obstacle_bc == "bouzidi" and has_solid:
        from ..ops.bouzidi import link_tables
        bz_q = link_tables(problem)
    thermal_pallas = None
    if problem.thermal is not None:
        # double-population (thermal) problems: fused 1-step pallas kernel
        # (f32, y-sharded meshes — x pulls are full-width lane rolls;
        # x-walled cavities lane-pad unaligned widths, periodic grids need
        # aligned nx), else their dedicated padded step through the SAME
        # generic ring/scan body below — only the collision/BC core differs.
        if backend == "pallas":
            try:
                from ..ops.step_thermal_pallas import \
                    make_local_step_thermal_pallas
                th_xh = mesh_shape[1] != 1
                # unaligned local widths lane-pad: dead fixed-point columns
                # on full-width walled cavities; LIVE shadow columns of the
                # east neighbor on x-sharded meshes (halo.ring_cols_padded,
                # refreshed per step — works for walled AND periodic x).
                # Interpret mode needs no alignment: the x-halo pad only
                # engages there under TPULBM_FORCE_PAD (tests), like the
                # generic 2-D kernels.
                th_align = (-local_shape[-1]) % 128
                if th_xh:
                    th_pad = (th_align if jax.default_backend() != "cpu"
                              else int(os.environ.get("TPULBM_FORCE_PAD",
                                                      "0")))
                else:
                    th_pad = th_align if problem.walls_x else 0
                thermal_pallas = make_local_step_thermal_pallas(
                    problem, (local_shape[0], local_shape[1] + th_pad),
                    pad_x=th_pad, x_halo=th_xh)
            except ValueError as e:
                import warnings
                warnings.warn(f"pallas backend unavailable for this "
                              f"thermal config ({e}); falling back to "
                              f"backend='jax'")
        if thermal_pallas is None:
            from ..ops.step_thermal import make_local_step_padded_thermal
            local_step = make_local_step_padded_thermal(problem, local_shape)
            backend = "jax"

    mp_steps = None
    mp_pallas = None
    if problem.shan_chen:
        # Shan-Chen multiphase: the collision has a 1-cell psi stencil.
        # The fused kernel takes depth-2 pre-collision rings and collides
        # the inner ring row in-kernel (one exchange per step); the jax
        # tier's padded body exchanges halos TWICE per step instead
        # (refresh -> collide interior -> refresh -> stream).
        if backend == "pallas":
            try:
                from ..ops.step_multiphase_pallas import \
                    make_local_step_multiphase_pallas
                # TPULBM_FORCE_XHALO routes single-shard-x runs through the
                # stitched x-halo kernel (silicon probes on a 1-chip host:
                # periodic ring_cols wrap the shard's own edges, so the
                # result matches the full-width kernel exactly)
                mp_xh = (mesh_shape[1] != 1
                         or bool(os.environ.get("TPULBM_FORCE_XHALO")))
                mp_pallas = make_local_step_multiphase_pallas(
                    problem, local_shape, x_halo=mp_xh)
            except ValueError as e:
                import warnings
                warnings.warn(f"pallas backend unavailable for this "
                              f"multiphase config ({e}); falling back to "
                              f"backend='jax'")
        if mp_pallas is None:
            from ..ops.step_multiphase import make_local_steps_multiphase
            mp_steps = make_local_steps_multiphase(problem, local_shape)
            backend = "jax"

    pallas3d_step = None
    pallas3d_plan = None   # [(stepper, n_iters), ...] mixed blocking depths
    if backend == "pallas" and ndim == 3:
        from ..ops.step_pallas3d import (make_local_step_pallas3d,
                                         make_local_step_pallas3d_tiled)
        # x-sharded meshes stitch ppermute'd halo columns into the tile
        # buffers (x_halo mode — the 2-D x-tiled design one dimension up)
        # TPULBM_FORCE_XHALO routes single-shard-x runs through the
        # stitched x-halo tiles (silicon probes on a 1-chip host: ring_cols
        # degenerates to the eq ghost blocks a physical-edge shard sees)
        x_sharded3d = (mesh_shape[1] != 1
                       or bool(os.environ.get("TPULBM_FORCE_XHALO")))
        # fully periodic 3-D boxes: the full-plane kernel wraps natively
        # (y/x rolls + two z ring-plane inputs); the y-tiled 1-step kernel
        # wraps on (my, 1) meshes (periodic ring rows + in-kernel wrapped
        # z ring planes). Temporal blocking across the z wrap is not
        # built (the tiled builder declines it).
        periodic3d = problem.periodic_y or problem.periodic_z
        try:
            # Temporal blocking cuts the HBM traffic of this DMA-bound
            # kernel by ~1/N; deeper N shrinks Ty until the y-overlap
            # waste (Wy/Ty) eats the gain and the kernel goes VPU-bound.
            # Measured at 256³ on v5e: N=2 2,361 / N=3 2,452 / N=4 1,596
            # MLUPS — so prefer N=3, with a depth-2 (or depth-1) tail
            # segment when the chunk length doesn't divide
            # (_blocking_split), both under a Ty >= 4H guard.
            # TPULBM_SUBSTEPS forces a depth, TPULBM_NO_FUSED2 disables
            # blocking.
            # periodic boxes block too (the extended-sweep kernel refetches
            # the 2N wrapped planes instead of holding ghost scratch)
            if not os.environ.get("TPULBM_NO_FUSED2"):
                forced = os.environ.get("TPULBM_SUBSTEPS")
                if forced:
                    n = int(forced)
                    splits = ([_blocking_split(chunk_len, n)]
                              if n > 1 and chunk_len % n == 0 else [])
                else:
                    splits = [s for s in
                              (_blocking_split(chunk_len, n) for n in (3, 2))
                              if s is not None]
                for split in splits:
                    steppers: dict | None = {}
                    for depth, _ in split:
                        st = make_local_step_pallas3d_tiled(
                            problem, local_shape, depth, x_halo=x_sharded3d)
                        if st is None or not (
                                forced or depth == 1
                                or st.tile_height >= 4 * st.halo_height):
                            steppers = None
                            break
                        steppers[depth] = st
                    if steppers:
                        pallas3d_plan = [(steppers[d], k) for d, k in split]
                        break
            if (pallas3d_plan is None and mesh_shape == (1, 1)
                    and bz_q is None
                    and not (problem.periodic_x and not periodic3d)
                    and not os.environ.get("TPULBM_FORCE_TILED")):
                # full-plane 1-step kernel: no halo-row overhead (does not
                # thread the bouzidi q table; pins x edges, so
                # mixed-periodicity ducts route to the tiled kernel)
                pallas3d_step = make_local_step_pallas3d(problem,
                                                         local_shape)
            if pallas3d_step is None and pallas3d_plan is None:
                # y-tiled 1-step: big planes and/or sharded meshes (incl.
                # fully periodic boxes on (my, 1) meshes — wrapped ring
                # rows + in-kernel wrapped z ring planes)
                st = make_local_step_pallas3d_tiled(
                    problem, local_shape, 1, x_halo=x_sharded3d)
                if st is not None:
                    pallas3d_plan = [(st, chunk_len)]
        except ValueError as e:
            import warnings
            warnings.warn(f"pallas backend unavailable for this config "
                          f"({e}); falling back to backend='jax'")
            backend = "jax"
        if (backend == "pallas" and pallas3d_step is None
                and pallas3d_plan is None):
            import warnings
            warnings.warn("no 3-D pallas configuration covers this setup "
                          "(VMEM / mesh / periodicity); falling back to "
                          "backend='jax'")
            backend = "jax"
    # generic single-phase 2-D kernel ladder — skipped when a dedicated
    # fused kernel (thermal / multiphase) already owns the body: building
    # the generic steppers for those stacked/stencil states would be
    # wasted work and could emit a spurious fallback warning
    generic2d = (backend == "pallas" and ndim == 2
                 and thermal_pallas is None and mp_pallas is None)
    if generic2d:
        from ..ops.step_pallas import (make_local_step_pallas,
                                       make_local_step_pallas2)
        from ..ops.step_pallas_tiled import make_local_step_tiled
        # The full-width slab kernels assume the local block spans the whole
        # x extent (x pulls are lane rolls + edge sanitize); x-sharded meshes
        # take the x-tiled kernel, which stitches ppermute'd halo columns.
        # TPULBM_FORCE_TILED routes single-shard-x runs to it too (tests).
        x_sharded = (mesh_shape[1] != 1
                     or bool(os.environ.get("TPULBM_FORCE_TILED")))
        pallas_step = None

        # Lane padding: the full-width kernels can run ANY local width by
        # padding the slab buffers to the next 128-lane multiple — the dead
        # columns are pinned to the frozen ghost equilibrium every substep
        # and sliced off after the chunk scan (pad/unpad once per chunk, not
        # per step). Closes the ~18x cliff a round-number grid (e.g.
        # 1000x400) used to hit by silently degrading to the jax tier; the
        # reference runs any divisible grid (LBMGrid.h:366-392).
        # TPULBM_FORCE_PAD=N forces N pad lanes in interpret mode (tests).
        if jax.default_backend() != "cpu":
            pad2 = (-local_shape[-1]) % 128
        else:
            pad2 = int(os.environ.get("TPULBM_FORCE_PAD", "0"))
        pal_shape = (local_shape[0], local_shape[-1] + pad2)
        if pad2 and problem.periodic_x:
            # padded periodic grids must take the x-tiled kernel: the
            # full-width kernels stream x via whole-width lane rolls, which
            # would wrap through the pad columns; the tiled kernel streams
            # via halo rings where the pad is a live wrap shadow
            # (halo.ring_cols_padded).
            x_sharded = True

        def _pallas_possible():
            # hard constraints: D2Q9 + f32 everywhere. Unaligned local
            # widths lane-pad on EVERY mesh shape (full-width kernels pin
            # dead pad columns; the x-tiled kernel additionally keeps
            # interior shards' pad columns as live shadow copies of the
            # east neighbor, halo.ring_cols_padded) — the only residue is
            # a degenerate shard too narrow to source its own halo sends.
            from ..ops.step_pallas import _physics_cfg_fields
            _physics_cfg_fields(problem)  # raises for D≠2 / f64
            if x_sharded and pad2 and local_shape[-1] < pad2 + 4:
                raise ValueError(
                    f"x-sharded lane padding needs local nx >= pad + 4, "
                    f"got nx={local_shape[-1]} pad={pad2}")

        try:
            _pallas_possible()
        except ValueError as e:
            # layout/dtype constraints — degrade gracefully
            import warnings
            warnings.warn(f"pallas backend unavailable for this config "
                          f"({e}); falling back to backend='jax'")
            backend = "jax"
        if backend == "pallas" and not x_sharded:
            try:
                pallas_step = make_local_step_pallas(problem, pal_shape,
                                                     pad_x=pad2)
            except ValueError:
                # full-width slabs exceed VMEM at this nx — the x-tiled
                # kernel (block below) covers wide rows; keep pallas alive
                pallas_step = None
    pallas_ranged = None
    pallas_rangedN = None
    ranged_substeps = 1
    if generic2d and backend == "pallas":
        # Halo-overlap mode (TPULBM_HALO_OVERLAP, flag-gated): split each
        # step into an interior kernel with NO data dependency on the
        # ppermute'd rings plus two edge-range kernels that consume them, so
        # XLA can overlap the halo exchange with the interior compute
        # (VERDICT r2 #5 — prep for real multi-chip ICI). Single-chip it
        # adds two kernel launches per step, which is why it is not the
        # default. Round 5 (VERDICT r4 #5): the split COMPOSES with N-step
        # temporal blocking via the ranged N-cascade (three slab ranges of
        # >= N+1 slabs each; interior chains are raw local rows), and
        # force_fn / bouzidi thread through it like the monolithic blocked
        # kernel — the 1-step ranged kernel remains the fallback for chunk
        # lengths that don't block (it still excludes force_fn/bouzidi).
        if os.environ.get("TPULBM_HALO_OVERLAP") and not x_sharded:
            if not os.environ.get("TPULBM_NO_FUSED2"):
                from ..ops.step_pallas import make_local_step_pallasN
                forced = os.environ.get("TPULBM_SUBSTEPS")
                for n_sub in ([int(forced)] if forced else [4, 3, 2]):
                    if n_sub < 2 or chunk_len % n_sub:
                        continue
                    st = make_local_step_pallasN(problem, pal_shape, n_sub,
                                                 pad_x=pad2, ranged=True)
                    if st is not None and st.n_ty >= 3 * (n_sub + 1):
                        pallas_rangedN = st
                        ranged_substeps = n_sub
                        break
            if (pallas_rangedN is None and problem.force_fn is None
                    and bz_q is None):
                from ..ops.step_pallas import make_local_step_pallas_ranged
                try:
                    pallas_ranged = make_local_step_pallas_ranged(
                        problem, pal_shape, pad_x=pad2)
                except ValueError:
                    pallas_ranged = None
                if pallas_ranged is not None and pallas_ranged.n_ty < 3:
                    pallas_ranged = None  # no interior slabs to overlap with
    if generic2d and backend == "pallas":
        # temporal blocking: N timesteps per HBM round trip when the chunk
        # length divides by N and the local block has enough slabs. Prefer
        # the deepest blocking that fits — full-width slabs first, x-tiled
        # slabs when the width doesn't fit VMEM (or the mesh is x-sharded).
        # TPULBM_SUBSTEPS forces a depth, TPULBM_NO_FUSED2 disables blocking.
        pallas_step2 = None
        pallas_tiled = None
        pallas_substeps = ranged_substeps if pallas_rangedN is not None else 1
        if (pallas_ranged is None and pallas_rangedN is None
                and not os.environ.get("TPULBM_NO_FUSED2")):
            forced = os.environ.get("TPULBM_SUBSTEPS")
            candidates = [int(forced)] if forced else [4, 3, 2]
            from ..ops.step_pallas import make_local_step_pallasN
            for n_sub in candidates:
                if n_sub == 1 or chunk_len % n_sub:
                    continue
                stepper = None
                if not x_sharded:
                    # bouzidi blocks via the N-step cascade at ANY depth
                    # (the specialized 2-step kernel has no q plumbing)
                    builder = (make_local_step_pallas2
                               if n_sub == 2 and bz_q is None
                               else lambda p, s, pad_x:
                               make_local_step_pallasN(p, s, n_sub,
                                                       pad_x=pad_x))
                    try:
                        stepper = builder(problem, pal_shape, pad_x=pad2)
                    except ValueError:
                        stepper = None  # no slab height fits VMEM at this depth
                if stepper is not None:
                    pallas_step2 = stepper
                    pallas_substeps = n_sub
                    break
                stepper = make_local_step_tiled(problem, pal_shape, n_sub,
                                                pad_x=pad2)
                if stepper is not None:
                    pallas_tiled = stepper
                    pallas_substeps = n_sub
                    break
        if (pallas_step2 is None and pallas_tiled is None
                and pallas_step is None and pallas_ranged is None
                and pallas_rangedN is None):
            # x-sharded mesh with no fitting tiled depth: try depth 1
            pallas_tiled = make_local_step_tiled(problem, pal_shape, 1,
                                                 pad_x=pad2)
            pallas_substeps = 1
            if pallas_tiled is None:
                import warnings
                warnings.warn("no pallas tile configuration fits this local "
                              "block; falling back to backend='jax'")
                backend = "jax"
                local_step = make_local_step_padded(problem, local_shape)
    if (backend == "jax" and local_step is None
            and problem.thermal is None and mp_steps is None):
        # plain jax tier, or a pallas request demoted above (layout/dtype);
        # thermal / multiphase local steps are built in their own blocks
        local_step = make_local_step_padded(problem, local_shape)

    ring_kw = dict(eq_ring=eq_ring, mesh_shape=mesh_shape,
                   periodic_x=problem.periodic_x,
                   periodic_y=problem.periodic_y,
                   periodic_z=problem.periodic_z)

    def body_jax(f_local, solid_local, bz_local=None):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        offsets = (0,) * (ndim - 2) + (iy * local_shape[-2], ix * local_shape[-1])
        solid_arg = solid_local if has_solid else None
        solid_pad = None
        if has_solid and problem.obstacle_bc == "bounce_back":
            # built once per chunk (outside the scan), not once per step
            solid_pad = halo.pad_mask(solid_local, mesh_shape=mesh_shape,
                                      periodic_x=problem.periodic_x)
        fpad = halo.make_padded(f_local, eq_ring)

        if mp_steps is not None:
            collide_mp, stream_mp = mp_steps

            def one_step(fp, _):
                # double exchange: collide needs neighbor psi (pre-
                # collision f), streaming needs the neighbors' POST-
                # collision edges — see ops/step_multiphase.py
                fp = halo.refresh_ring(fp, **ring_kw)
                fp = collide_mp(fp, offsets)
                fp = halo.refresh_ring(fp, **ring_kw)
                fp = stream_mp(fp, offsets)
                return fp, None
        else:
            def one_step(fp, _):
                fp = halo.refresh_ring(fp, **ring_kw)
                if bz_local is None:
                    fp = local_step(fp, solid_arg, offsets, solid_pad)
                else:
                    fp = local_step(fp, solid_arg, offsets, solid_pad,
                                    bz_local)
                return fp, None

        fpad, _ = lax.scan(one_step, fpad, None, length=chunk_len)
        center = (slice(None),) + (slice(1, -1),) * ndim
        return fpad[center]

    def body_pallas3d(f_local, solid_local, bz_local=None):
        mask = solid_local.astype(jnp.float32) if has_solid else None

        def one_step(f, _):
            return pallas3d_step(f, mask), None

        f_local, _ = lax.scan(one_step, f_local, None, length=chunk_len)
        return f_local

    def body_pallas3d_tiled(f_local, solid_local, bz_local=None):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        nyl3, nxl3 = local_shape[-2], local_shape[-1]
        y0 = iy * nyl3
        x0 = ix * nxl3
        # physical-edge flags (zeroed on periodic axes — no wall/sanitize
        # strips there) + the shard's global offsets for in-kernel force
        # coordinates (flags[4]/flags[5])
        nope = jnp.zeros((), jnp.bool_)
        flags = jnp.stack([
            (y0 == 0) if not problem.periodic_y else nope,
            (y0 + nyl3 == problem.params.ny)
            if not problem.periodic_y else nope,
            (x0 == 0) if not problem.periodic_x else nope,
            (x0 + nxl3 == problem.params.nx)
            if not problem.periodic_x else nope]).astype(jnp.int32)
        flags = jnp.concatenate(
            [flags, jnp.stack([y0, x0]).astype(jnp.int32)])

        def run_segment(f_local, stepper, n_iters):
            """Scan one blocking-depth segment (its halo depths / tile
            heights / mask rings are per-stepper — interpret mode shrinks H
            with the depth, so segments cannot share ring buffers)."""
            H = stepper.halo_height
            N3 = stepper.depth
            Hx3 = stepper.halo_width
            x_halo3 = stepper.x_halo

            def rings_for(arr, ring):
                """(rl, rr, rb, rt) halo inputs for one (Q, nz, nyl, nxl)
                array; rl/rr are None in the full-width (y-only) mode."""
                if x_halo3:
                    rl, rr = halo.ring_cols_3d(arr, eq_ring=ring,
                                               mesh_shape=mesh_shape,
                                               depth=N3, H=Hx3,
                                               periodic_x=problem.periodic_x)
                    rb, rt = halo.ring_rows_ext_3d(
                        arr, rl, rr, eq_ring=ring, mesh_shape=mesh_shape,
                        depth=H, periodic_y=problem.periodic_y)
                    return rl, rr, rb, rt
                rb, rt = halo.ring_rows_3d(arr, eq_ring=ring,
                                           mesh_shape=mesh_shape, depth=H,
                                           periodic_y=problem.periodic_y)
                return None, None, rb, rt

            mask = mrb = mrt = ml = mr = tyflags = None
            if has_solid:
                mask = solid_local.astype(jnp.float32)
                zr = np.zeros(1, np.float32)
                ml4, mr4, mrb4, mrt4 = rings_for(mask[None], zr)
                mrb, mrt = mrb4[0], mrt4[0]
                if x_halo3:
                    ml, mr = ml4[0], mr4[0]
                # per-tile solid flags from the (traced) shard y-offset
                # against the static solid y-range (the z range is baked in
                # the kernel). Tiles carry H halo-row copies whose post-BC
                # values feed the center during later substeps, so the
                # intersection test is widened by the halo height.
                ty = stepper.tile_height
                starts = y0 + jnp.arange(stepper.n_ty) * ty
                if stepper.solid_yrange is None:
                    tyflags = jnp.zeros((stepper.n_ty,), jnp.int32)
                else:
                    lo, hi = stepper.solid_yrange
                    tyflags = ((starts - H <= hi)
                               & (starts + ty + H > lo)).astype(jnp.int32)

            bzrb = bzrt = None
            if bz_local is not None and N3 > 1:
                # q halo rows for the blocked cascade's halo-row cut-link
                # rewrite — static geometry, exchanged once per segment
                # (out-of-domain rows carry q = -1: no cut link)
                neg = np.full((bz_local.shape[0],), -1.0, np.float32)
                bzrb, bzrt = halo.ring_rows_3d(
                    bz_local, eq_ring=neg, mesh_shape=mesh_shape, depth=H,
                    periodic_y=problem.periodic_y)

            def n_steps(f, _):
                rl, rr, rb, rt = rings_for(f, eq_ring)
                return stepper(f, rb, rt, flags, mask, mrb, mrt,
                               tyflags, rl, rr, ml, mr,
                               bzq=bz_local, bzrb=bzrb, bzrt=bzrt), None

            f_local, _ = lax.scan(n_steps, f_local, None, length=n_iters)
            return f_local

        for stepper, n_iters in pallas3d_plan:
            f_local = run_segment(f_local, stepper, n_iters)
        return f_local

    # static row bounding box of the solid mask, for per-slab obstacle skip
    solid_rows = None
    if has_solid and ndim == 2:
        rows = np.nonzero(problem.solid.any(axis=1))[0]
        if len(rows):
            solid_rows = (int(rows.min()), int(rows.max()))
            if bz_q is not None:
                # bouzidi cut links live at FLUID cells one row outside the
                # solid bounding box — widen so their slabs get the q DMA
                solid_rows = (solid_rows[0] - 1, solid_rows[1] + 1)

    def body_pallas(f_local, solid_local, bz_local=None):
        iy = lax.axis_index("y")
        nyl, nxl = local_shape[-2], local_shape[-1]
        y0 = iy * nyl
        # periodic_y: no shard owns a physical y edge — the kernels' y-edge
        # ghost sanitize and wall strips are flag-driven and must stay off
        # (the rings carry real wrapped data, halo.ring_rows periodic_y)
        phys_y = not problem.periodic_y
        flags = jnp.stack([
            (y0 == 0) & phys_y,
            (y0 + nyl == problem.params.ny) & phys_y,
            jnp.array(True), jnp.array(True)]).astype(jnp.int32)
        if problem.force_fn is not None:
            # flags[4] = shard's global y offset: the 1-step kernel rebuilds
            # global force coordinates in-kernel (step_pallas._collide_rows)
            flags = jnp.concatenate(
                [flags, jnp.asarray(y0, jnp.int32).reshape(1)])
        if pad2:
            # lane-pad once per CHUNK: the scan carries the padded state
            # (dead columns stay pinned to eq inside the kernel), the owned
            # columns are sliced back after the scan
            Qn = problem.lattice.Q
            eqb = jnp.broadcast_to(
                jnp.asarray(eq_ring, f_local.dtype).reshape(Qn, 1, 1),
                (Qn, nyl, pad2))
            f_local = jnp.concatenate([f_local, eqb], axis=-1)
            if has_solid:
                solid_local = jnp.concatenate(
                    [solid_local,
                     jnp.zeros((nyl, pad2), solid_local.dtype)], axis=-1)
            if bz_local is not None:
                # pad columns carry q = -1 (no cut link) in every plane
                bz_local = jnp.concatenate(
                    [bz_local, jnp.full((bz_local.shape[0], nyl, pad2),
                                        -1.0, bz_local.dtype)], axis=-1)

        def sflags_for(stepper):
            # int32 (n_ty,): does slab t of this shard intersect the solid
            # bounding box (static geometry, traced shard offset)
            if not has_solid:
                return None
            ty = stepper.tile_height
            starts = y0 + jnp.arange(stepper.n_ty) * ty
            if solid_rows is None:
                return jnp.zeros((stepper.n_ty,), jnp.int32)
            lo, hi = solid_rows
            return ((starts <= hi) & (starts + ty > lo)).astype(jnp.int32)

        def mask_rings(depth):
            if not has_solid:
                return None, None, None
            mask = solid_local.astype(jnp.float32)
            # neighbors' solid edge rows, once per chunk (the mask is static)
            mrb, mrt = halo.ring_rows(mask[None],
                                      eq_ring=np.zeros(1, np.float32),
                                      mesh_shape=mesh_shape, depth=depth)
            return mask, mrb[0], mrt[0]  # (depth, nxl)

        if pallas_step2 is not None:
            depth = pallas_substeps
            mask, mrb, mrt = mask_rings(depth)
            sflags = sflags_for(pallas_step2)
            bzrb = bzrt = None
            if bz_local is not None:
                # q halo rows for the blocked kernel's ghost-chain BCs —
                # static geometry, exchanged once per chunk like the mask
                # rings; out-of-domain rows carry q = -1 (no cut link)
                neg_ring = np.full((bz_local.shape[0],), -1.0, np.float32)
                bzrb, bzrt = halo.ring_rows(bz_local, eq_ring=neg_ring,
                                            mesh_shape=mesh_shape,
                                            depth=depth)

            def n_steps(f, _):
                rb, rt = halo.ring_rows(f, eq_ring=eq_ring,
                                        mesh_shape=mesh_shape, depth=depth,
                                        periodic_y=problem.periodic_y)
                return pallas_step2(f, rb, rt, flags, mask, mrb, mrt,
                                    sflags, bzq=bz_local, bzrb=bzrb,
                                    bzrt=bzrt), None

            f_local, _ = lax.scan(n_steps, f_local, None,
                                  length=chunk_len // depth)
            return f_local[..., :nxl] if pad2 else f_local

        mask, mrb, mrt = mask_rings(1)

        sflags = sflags_for(pallas_step)

        def one_step(f, _):
            rb, rt = halo.ring_rows(f, eq_ring=eq_ring, mesh_shape=mesh_shape,
                                    periodic_y=problem.periodic_y)
            return pallas_step(f, rb, rt, flags, mask, mrb, mrt, sflags,
                               bzq=bz_local), None

        f_local, _ = lax.scan(one_step, f_local, None, length=chunk_len)
        return f_local[..., :nxl] if pad2 else f_local

    def body_pallas_overlap(f_local, solid_local):
        """Interior/edge split (TPULBM_HALO_OVERLAP): the interior call's
        ring rows are LOCAL raw rows of f, so it does not depend on the
        ppermute; the two edge calls consume the exchanged rings and write
        into the interior call's output buffer via aliasing. The output
        buffers ping-pong through the scan carry, so no per-step allocation
        or copy is introduced."""
        iy = lax.axis_index("y")
        nyl, nxl = local_shape[-2], local_shape[-1]
        y0 = iy * nyl
        phys_y = not problem.periodic_y
        flags = jnp.stack([
            (y0 == 0) & phys_y,
            (y0 + nyl == problem.params.ny) & phys_y,
            jnp.array(True), jnp.array(True)]).astype(jnp.int32)
        if pad2:
            Qn = problem.lattice.Q
            eqb = jnp.broadcast_to(
                jnp.asarray(eq_ring, f_local.dtype).reshape(Qn, 1, 1),
                (Qn, nyl, pad2))
            f_local = jnp.concatenate([f_local, eqb], axis=-1)
            if has_solid:
                solid_local = jnp.concatenate(
                    [solid_local,
                     jnp.zeros((nyl, pad2), solid_local.dtype)], axis=-1)
        Ty = pallas_ranged.tile_height
        n_ty = pallas_ranged.n_ty
        b_int = jnp.asarray(np.array([1, n_ty - 1], np.int32))
        b_bot = jnp.asarray(np.array([0, 1], np.int32))
        b_top = jnp.asarray(np.array([n_ty - 1, n_ty], np.int32))

        sflags = None
        mask = mrb = mrt = None
        mrow = {}
        if has_solid:
            mask = solid_local.astype(jnp.float32)
            zr = np.zeros(1, np.float32)
            mrb3, mrt3 = halo.ring_rows(mask[None], eq_ring=zr,
                                        mesh_shape=mesh_shape, depth=1)
            mrb, mrt = mrb3[0], mrt3[0]
            mrow = {r: mask[r:r + 1, :]
                    for r in (Ty - 1, Ty, nyl - Ty - 1, nyl - Ty)}
            ty_s = pallas_ranged.tile_height
            starts = y0 + jnp.arange(n_ty) * ty_s
            if solid_rows is None:
                sflags = jnp.zeros((n_ty,), jnp.int32)
            else:
                lo, hi = solid_rows
                sflags = ((starts <= hi)
                          & (starts + ty_s > lo)).astype(jnp.int32)

        def one_step(carry, _):
            f, scratch = carry
            rb, rt = halo.ring_rows(f, eq_ring=eq_ring,
                                    mesh_shape=mesh_shape,
                                    periodic_y=problem.periodic_y)
            # interior first: no ring dependency → overlaps the ppermute
            o = pallas_ranged(f, f[:, Ty - 1:Ty, :],
                              f[:, nyl - Ty:nyl - Ty + 1, :], flags, b_int,
                              scratch, mask, mrow.get(Ty - 1),
                              mrow.get(nyl - Ty), sflags)
            o = pallas_ranged(f, rb, f[:, Ty:Ty + 1, :], flags, b_bot,
                              o, mask, mrb, mrow.get(Ty), sflags)
            o = pallas_ranged(f, f[:, nyl - Ty - 1:nyl - Ty, :], rt, flags,
                              b_top, o, mask, mrow.get(nyl - Ty - 1), mrt,
                              sflags)
            return (o, f), None

        scratch0 = jnp.zeros_like(f_local)
        (f_local, _), _ = lax.scan(one_step, (f_local, scratch0), None,
                                   length=chunk_len)
        return f_local[..., :nxl] if pad2 else f_local

    def body_pallas_overlapN(f_local, solid_local, bz_local=None):
        """Interior/edge split COMPOSED with N-step temporal blocking
        (TPULBM_HALO_OVERLAP, VERDICT r4 #5): three ranged N-cascade calls
        per N steps — the interior range's depth-N ghost chains are RAW
        LOCAL rows of f just outside its slab range (the cascade recomputes
        their trapezoid exactly as the monolithic kernel does at shard
        edges), so it has no data dependency on the ppermute; the two edge
        ranges consume the exchanged depth-N rings and write into the
        interior call's output via aliasing. Output buffers ping-pong
        through the scan carry. force_fn and bouzidi thread through like
        the monolithic blocked kernel (q chains: local slices inside,
        exchanged rings at the edges)."""
        iy = lax.axis_index("y")
        nyl, nxl = local_shape[-2], local_shape[-1]
        y0 = iy * nyl
        phys_y = not problem.periodic_y
        flags = jnp.stack([
            (y0 == 0) & phys_y,
            (y0 + nyl == problem.params.ny) & phys_y,
            jnp.array(True), jnp.array(True)]).astype(jnp.int32)
        if problem.force_fn is not None:
            flags = jnp.concatenate(
                [flags, jnp.asarray(y0, jnp.int32).reshape(1)])
        if pad2:
            Qn = problem.lattice.Q
            eqb = jnp.broadcast_to(
                jnp.asarray(eq_ring, f_local.dtype).reshape(Qn, 1, 1),
                (Qn, nyl, pad2))
            f_local = jnp.concatenate([f_local, eqb], axis=-1)
            if has_solid:
                solid_local = jnp.concatenate(
                    [solid_local,
                     jnp.zeros((nyl, pad2), solid_local.dtype)], axis=-1)
            if bz_local is not None:
                bz_local = jnp.concatenate(
                    [bz_local, jnp.full((bz_local.shape[0], nyl, pad2),
                                        -1.0, bz_local.dtype)], axis=-1)

        N = ranged_substeps
        Ty = pallas_rangedN.tile_height
        n_ty = pallas_rangedN.n_ty
        e = N + 1                              # edge-range width in slabs
        lo_r, hi_r = e * Ty, (n_ty - e) * Ty   # interior row range
        b_int = jnp.asarray(np.array([e, n_ty - e], np.int32))
        b_bot = jnp.asarray(np.array([0, e], np.int32))
        b_top = jnp.asarray(np.array([n_ty - e, n_ty], np.int32))

        mask = mrb = mrt = sflags = None
        if has_solid:
            mask = solid_local.astype(jnp.float32)
            mrb3, mrt3 = halo.ring_rows(mask[None],
                                        eq_ring=np.zeros(1, np.float32),
                                        mesh_shape=mesh_shape, depth=N)
            mrb, mrt = mrb3[0], mrt3[0]
            starts = y0 + jnp.arange(n_ty) * Ty
            if solid_rows is None:
                sflags = jnp.zeros((n_ty,), jnp.int32)
            else:
                slo, shi = solid_rows
                sflags = ((starts <= shi)
                          & (starts + Ty > slo)).astype(jnp.int32)
        bzrb = bzrt = None
        if bz_local is not None:
            neg_ring = np.full((bz_local.shape[0],), -1.0, np.float32)
            bzrb, bzrt = halo.ring_rows(bz_local, eq_ring=neg_ring,
                                        mesh_shape=mesh_shape, depth=N)

        def mrows(r0):
            # local chain rows (static geometry, per chunk)
            return mask[r0:r0 + N, :] if mask is not None else None

        def qrows(r0):
            return (bz_local[:, r0:r0 + N, :]
                    if bz_local is not None else None)

        def n_steps(carry, _):
            f, scratch = carry
            rb, rt = halo.ring_rows(f, eq_ring=eq_ring,
                                    mesh_shape=mesh_shape, depth=N,
                                    periodic_y=problem.periodic_y)
            # interior first: raw-local chains → overlaps the ppermute
            o = pallas_rangedN(
                f, f[:, lo_r - N:lo_r, :], f[:, hi_r:hi_r + N, :], flags,
                mask=mask, mrb=mrows(lo_r - N), mrt=mrows(hi_r),
                sflags=sflags, bzq=bz_local, bzrb=qrows(lo_r - N),
                bzrt=qrows(hi_r), bounds=b_int, out_init=scratch)
            o = pallas_rangedN(
                f, rb, f[:, lo_r:lo_r + N, :], flags,
                mask=mask, mrb=mrb, mrt=mrows(lo_r), sflags=sflags,
                bzq=bz_local, bzrb=bzrb, bzrt=qrows(lo_r),
                bounds=b_bot, out_init=o)
            o = pallas_rangedN(
                f, f[:, hi_r - N:hi_r, :], rt, flags,
                mask=mask, mrb=mrows(hi_r - N), mrt=mrt, sflags=sflags,
                bzq=bz_local, bzrb=qrows(hi_r - N), bzrt=bzrt,
                bounds=b_top, out_init=o)
            return (o, f), None

        scratch0 = jnp.zeros_like(f_local)
        (f_local, _), _ = lax.scan(n_steps, (f_local, scratch0), None,
                                   length=chunk_len // N)
        return f_local[..., :nxl] if pad2 else f_local

    def body_pallas_tiled(f_local, solid_local, bz_local=None):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        nyl, nxl = local_shape[-2], local_shape[-1]
        y0 = iy * nyl
        x0 = ix * nxl
        phys_y = not problem.periodic_y   # periodic: every y edge interior
        flags = jnp.stack([
            (y0 == 0) & phys_y,
            (y0 + nyl == problem.params.ny) & phys_y,
            (x0 == 0), (x0 + nxl == problem.params.nx)]).astype(jnp.int32)
        if problem.force_fn is not None:
            # flags[4]/flags[5] = shard's global (y, x) offsets: the tiled
            # kernel rebuilds global force coordinates in-kernel per tile
            # (step_pallas_tiled — buffer col b ↦ flags[5] + tx·Tx − H + b)
            flags = jnp.concatenate(
                [flags, jnp.asarray(y0, jnp.int32).reshape(1),
                 jnp.asarray(x0, jnp.int32).reshape(1)])
        N = pallas_tiled.depth
        H = pallas_tiled.halo_width
        padx = pallas_tiled.pad_x
        if padx:
            # lane-pad once per CHUNK (scan carries the padded state). The
            # pad columns of interior shards are live shadow copies of the
            # east neighbor's first padx columns, refreshed from the halo
            # exchange's `fill` every step BEFORE the extended y-rings are
            # built; at the physical east edge they are dead (eq-pinned
            # in-kernel). Initial eq fill is overwritten by the first
            # stitch everywhere it matters.
            Qn = problem.lattice.Q
            eqb = jnp.broadcast_to(
                jnp.asarray(eq_ring, f_local.dtype).reshape(Qn, 1, 1),
                (Qn, nyl, padx))
            f_local = jnp.concatenate([f_local, eqb], axis=-1)
            if bz_local is not None:
                # pad columns carry q = -1 (no cut link): dead on the
                # physical-east shard, and on interior shards the shadow
                # columns' rewrite is the east neighbor's job (their
                # post-step values are overwritten by the next stitch)
                bz_local = jnp.concatenate(
                    [bz_local, jnp.full((bz_local.shape[0], nyl, padx),
                                        -1.0, bz_local.dtype)], axis=-1)

        # per-y-slab solid flags (static geometry, traced shard offset)
        sflags = None
        if has_solid:
            ty = pallas_tiled.tile_height
            starts = y0 + jnp.arange(pallas_tiled.n_ty) * ty
            if solid_rows is None:
                sflags = jnp.zeros((pallas_tiled.n_ty,), jnp.int32)
            else:
                lo, hi = solid_rows
                sflags = ((starts <= hi) & (starts + ty > lo)).astype(jnp.int32)

        mask = ml = mr = mrb = mrt = None
        if has_solid:
            mask = solid_local.astype(jnp.float32)
            zr = np.zeros(1, np.float32)
            if padx:
                # static geometry: pad + stitch the shadow columns once per
                # chunk (same frame as f's pad — the east neighbor's first
                # padx mask columns), then build the rings on the padded mask
                mask = jnp.concatenate(
                    [mask, jnp.zeros((nyl, padx), mask.dtype)], axis=-1)
                ml3, mr3, mfill = halo.ring_cols_padded(
                    mask[None], eq_ring=zr, mesh_shape=mesh_shape, depth=N,
                    H=H, periodic_x=problem.periodic_x, pad_x=padx)
                mask = jnp.concatenate([mask[..., :nxl], mfill[0]], axis=-1)
            else:
                ml3, mr3 = halo.ring_cols(mask[None], eq_ring=zr,
                                          mesh_shape=mesh_shape, depth=N, H=H,
                                          periodic_x=problem.periodic_x)
            mrb3, mrt3 = halo.ring_rows_ext(mask[None], ml3, mr3, eq_ring=zr,
                                            mesh_shape=mesh_shape, depth=N,
                                            periodic_y=problem.periodic_y)
            ml, mr, mrb, mrt = ml3[0], mr3[0], mrb3[0], mrt3[0]

        def n_steps(f, _):
            if padx:
                rl, rr, fill = halo.ring_cols_padded(
                    f, eq_ring=eq_ring, mesh_shape=mesh_shape, depth=N, H=H,
                    periodic_x=problem.periodic_x, pad_x=padx)
                # refresh the shadow columns from the east neighbor BEFORE
                # the row rings (their sends span the full padded width)
                f = jnp.concatenate([f[..., :nxl], fill], axis=-1)
            else:
                rl, rr = halo.ring_cols(f, eq_ring=eq_ring,
                                        mesh_shape=mesh_shape, depth=N, H=H,
                                        periodic_x=problem.periodic_x)
            rb, rt = halo.ring_rows_ext(f, rl, rr, eq_ring=eq_ring,
                                        mesh_shape=mesh_shape, depth=N,
                                        periodic_y=problem.periodic_y)
            return pallas_tiled(f, rb, rt, rl, rr, flags, mask, mrb, mrt,
                                ml, mr, sflags, bzq=bz_local), None

        f_local, _ = lax.scan(n_steps, f_local, None,
                              length=chunk_len // N)
        return f_local[..., :nxl] if padx else f_local

    def body_thermal_pallas(f_local, solid_local):
        iy = lax.axis_index("y")
        nyl = local_shape[-2]
        y0 = iy * nyl
        # periodic_y (passive scalar): no shard owns a physical y edge —
        # the kernel's wall branches stay off and the rings carry real
        # wrapped rows (same flag discipline as body_pallas)
        phys_y = not problem.periodic_y
        nxl = local_shape[-1]
        if thermal_pallas.x_halo:
            ix = lax.axis_index("x")
            x0 = ix * nxl
            phys_x = not problem.periodic_x
            fx_l = (x0 == 0) & phys_x
            fx_r = (x0 + nxl == problem.params.nx) & phys_x
        else:
            fx_l = fx_r = jnp.array(True)
        flags = jnp.stack([
            (y0 == 0) & phys_y,
            (y0 + nyl == problem.params.ny) & phys_y,
            fx_l, fx_r]).astype(jnp.int32)
        padx = thermal_pallas.pad_x
        if padx:
            # unaligned width: append pad columns at their fixed-point
            # values. Full-width cavities keep them dead (the kernel
            # re-pins every step); x-sharded meshes refresh them per step
            # as live shadows of the east neighbor (ring_cols_padded)
            pad = jnp.broadcast_to(
                jnp.asarray(thermal_pallas.pad_vals,
                            f_local.dtype)[:, None, None],
                (f_local.shape[0], nyl, padx))
            f_local = jnp.concatenate([f_local, pad], axis=-1)
        pad_ring = np.asarray(thermal_pallas.pad_vals, np.float32)

        def one_step(f, _):
            if thermal_pallas.x_halo:
                # x-sharded: stitched-halo exchange (columns first, then
                # extended rows — corners carry diagonal-neighbor data)
                if padx:
                    rl, rr, fill = halo.ring_cols_padded(
                        f, eq_ring=pad_ring, mesh_shape=mesh_shape,
                        depth=1, H=thermal_pallas.halo_width,
                        periodic_x=problem.periodic_x, pad_x=padx)
                    # live shadow refresh BEFORE the extended rows (their
                    # row sends span the full padded width)
                    f = jnp.concatenate([f[..., :-padx], fill], axis=-1)
                else:
                    rl, rr = halo.ring_cols(f, eq_ring=eq_ring,
                                            mesh_shape=mesh_shape, depth=1,
                                            H=thermal_pallas.halo_width,
                                            periodic_x=problem.periodic_x)
                rb, rt = halo.ring_rows_ext(f, rl, rr, eq_ring=eq_ring,
                                            mesh_shape=mesh_shape, depth=1,
                                            periodic_y=problem.periodic_y)
                return thermal_pallas(f, rb, rt, flags, rl, rr), None
            rb, rt = halo.ring_rows(f, eq_ring=eq_ring,
                                    mesh_shape=mesh_shape,
                                    periodic_y=problem.periodic_y)
            return thermal_pallas(f, rb, rt, flags), None

        f_local, _ = lax.scan(one_step, f_local, None, length=chunk_len)
        return f_local[..., :nxl] if padx else f_local

    def body_multiphase_pallas(f_local, solid_local):
        iy = lax.axis_index("y")
        nyl = local_shape[-2]
        y0 = iy * nyl
        flags = jnp.stack([
            (y0 == 0), (y0 + nyl == problem.params.ny),
            jnp.array(True), jnp.array(True)]).astype(jnp.int32)

        def one_step(f, _):
            if mp_pallas.x_halo:
                # x-sharded: stitched-halo exchange at DEPTH 2 (the psi
                # stencil consumes one column of validity, the stream the
                # other); extended rows carry diagonal corners
                rl, rr = halo.ring_cols(f, eq_ring=eq_ring,
                                        mesh_shape=mesh_shape, depth=2,
                                        H=mp_pallas.halo_width,
                                        periodic_x=problem.periodic_x)
                rb, rt = halo.ring_rows_ext(f, rl, rr, eq_ring=eq_ring,
                                            mesh_shape=mesh_shape, depth=2,
                                            periodic_y=problem.periodic_y)
                return mp_pallas(f, rb, rt, flags, rl, rr), None
            rb, rt = halo.ring_rows(f, eq_ring=eq_ring,
                                    mesh_shape=mesh_shape, depth=2)
            return mp_pallas(f, rb, rt, flags), None

        f_local, _ = lax.scan(one_step, f_local, None, length=chunk_len)
        return f_local

    if thermal_pallas is not None:
        body = body_thermal_pallas
    elif mp_pallas is not None:
        body = body_multiphase_pallas
    elif backend == "pallas":
        if ndim == 3:
            body = (body_pallas3d if pallas3d_step is not None
                    else body_pallas3d_tiled)
            if pallas3d_step is None:
                assert sum(st.depth * k for st, k in pallas3d_plan) \
                    == chunk_len
        elif pallas_rangedN is not None:
            body = body_pallas_overlapN
        elif pallas_ranged is not None:
            body = body_pallas_overlap
        elif pallas_tiled is not None:
            body = body_pallas_tiled
        else:
            body = body_pallas
    else:
        body = body_jax

    spec_f = P(*((None,) + (None,) * (ndim - 2) + ("y", "x")))
    spec_m = P(*((None,) * (ndim - 2) + ("y", "x")))
    plan_depths_any = ([st.depth for st, _ in pallas3d_plan]
                       if pallas3d_plan else None)
    # check_vma=False: pallas_call out_shapes don't carry vma annotations
    if bz_q is None:
        sharded = shard_map(body, mesh=mesh, in_specs=(spec_f, spec_m),
                            out_specs=spec_f, check_vma=False)
        sharded.pallas_substeps = pallas_substeps
        sharded.pallas3d_depths = plan_depths_any
        if _raw:
            return sharded
        jitted = jax.jit(sharded, donate_argnums=(0,))

        def chunk_nb(f, solid):
            return jitted(f, solid)

        chunk_nb.pallas_substeps = pallas_substeps
        chunk_nb.pallas3d_depths = plan_depths_any
        return chunk_nb
    # bouzidi: the q table rides as a third REAL argument sharded like f
    # (passing it by closure would bake a grid-sized constant into the
    # program); raw callers read .bouzidi_q and thread it themselves
    # (make_super_chunk_fn), the jitted wrapper binds it here
    sharded = shard_map(body, mesh=mesh, in_specs=(spec_f, spec_m, spec_f),
                        out_specs=spec_f, check_vma=False)
    q_dev = jax.device_put(bz_q, NamedSharding(mesh, spec_f))
    sharded.bouzidi_q = q_dev
    sharded.pallas_substeps = pallas_substeps
    plan_depths = plan_depths_any
    sharded.pallas3d_depths = plan_depths
    if _raw:
        return sharded
    jitted = jax.jit(sharded, donate_argnums=(0,))

    def chunk(f, solid):
        return jitted(f, solid, q_dev)

    chunk.bouzidi_q = q_dev
    chunk.pallas_substeps = pallas_substeps
    chunk.pallas3d_depths = plan_depths
    return chunk


def make_super_chunk_fn(problem: Problem, mesh: Mesh, interval_len: int,
                        n_intervals: int, backend: str = "jax",
                        with_fields: bool = False,
                        with_stats: bool = False):
    """fn(f, solid) -> (f', diags): advances n_intervals × interval_len steps
    with ONE host round trip, recording per-interval diagnostics on device.

    diags = (forces (n_intervals, D), max_vel (n_intervals,), stable
    (n_intervals,)), each evaluated at the interval-start states — the
    reference's output cadence (LBMSolver.h:52-67) — so a long run needs
    ~n_intervals× fewer host↔device synchronizations (each costs 50-300 ms
    through a remote-TPU relay).

    with_fields=True appends per-interval macroscopic fields
    (rho (n_intervals, *spatial), u (n_intervals, D, *spatial)) to diags:
    VTK frames then cost ONE batched gather per n_intervals frames instead
    of a per-frame device stall — the fully-async answer to the reference's
    serialized gather+write on the critical path (LBMSolver.h:269-362).
    """
    from ..ops import diagnostics, forces as forces_mod

    chunk = make_chunk_fn(problem, mesh, interval_len, backend=backend,
                          _raw=True)
    has_solid = problem.solid is not None
    forces_fn = forces_mod.forces_fn(problem) if has_solid else None
    maxv_fn = diagnostics.max_velocity_fn(problem)
    stable_fn = diagnostics.stability_fn(problem)
    fields_fn = diagnostics.fields_fn(problem) if with_fields else None
    nu_fn = temp_fn = None
    if problem.thermal is not None:
        from ..ops.step_thermal import nusselt, temperature
        nu_fn = lambda s: nusselt(problem, s)  # noqa: E731
        temp_fn = lambda s: temperature(problem, s)  # noqa: E731
    pr_fn = (diagnostics.probes_fn(problem)
             if getattr(problem.params, "probe_points", ()) else None)

    q_dev = getattr(chunk, "bouzidi_q", None)

    if not with_stats:
        def fn(f, solid, qv=None):
            def interval(fc, _):
                if forces_fn is None:
                    force = jnp.zeros(2)
                elif qv is not None:
                    force = forces_fn(fc, qv)   # bouzidi cut-link form
                else:
                    force = forces_fn(fc)
                diag = (force, maxv_fn(fc), stable_fn(fc))
                if nu_fn is not None:  # thermal: per-interval Nusselt trace
                    diag = diag + (nu_fn(fc),)
                if pr_fn is not None:  # point probes ride the same trip
                    diag = diag + (pr_fn(fc),)
                if fields_fn is not None:
                    diag = diag + tuple(fields_fn(fc))
                    if temp_fn is not None:  # thermal VTK frames carry T
                        diag = diag + (temp_fn(fc),)
                fnext = chunk(fc, solid) if qv is None else chunk(fc, solid, qv)
                return fnext, diag

            return lax.scan(interval, f, None, length=n_intervals)

        jitted = jax.jit(fn, donate_argnums=(0,))
        if q_dev is None:
            return jitted
        return lambda f, solid: jitted(f, solid, q_dev)

    # Reynolds-statistics variant: fn(f, stats, n_skip, solid) ->
    # ((f', stats'), diags). stats = (count, sum_rho, sum_u, sum_uu)
    # accumulates one sample per interval-start state (the same states the
    # diagnostics see), skipping the first n_skip intervals of this window
    # (a TRACED scalar — the runner uses it to honor stats_from without a
    # recompile per window). The sums live sharded on device across super-
    # chunk calls; the host only ever sees the finalized means.
    stats_fn = diagnostics.stats_sample_fn(problem)

    def fn_stats(f, stats, n_skip, solid, qv=None):
        def interval(carry, k):
            fc, (cnt, s_rho, s_u, s_uu) = carry
            if forces_fn is None:
                force = jnp.zeros(2)
            elif qv is not None:
                force = forces_fn(fc, qv)   # bouzidi cut-link form
            else:
                force = forces_fn(fc)
            diag = (force, maxv_fn(fc), stable_fn(fc))
            if nu_fn is not None:
                diag = diag + (nu_fn(fc),)
            if pr_fn is not None:
                diag = diag + (pr_fn(fc),)
            if fields_fn is not None:
                diag = diag + tuple(fields_fn(fc))
                if temp_fn is not None:
                    diag = diag + (temp_fn(fc),)
            rho, u, uu = stats_fn(fc)
            w = (k >= n_skip).astype(s_rho.dtype)
            st = (cnt + w, s_rho + w * rho, s_u + w * u, s_uu + w * uu)
            fnext = chunk(fc, solid) if qv is None else chunk(fc, solid, qv)
            return (fnext, st), diag

        return lax.scan(interval, (f, stats), jnp.arange(n_intervals))

    jitted = jax.jit(fn_stats, donate_argnums=(0, 1))
    if q_dev is None:
        return jitted
    return lambda f, stats, n_skip, solid: jitted(f, stats, n_skip, solid,
                                                  q_dev)


def shard_mask(mesh: Mesh, mask):
    """Place a (…, ny, nx) mask/field with the canonical ('y','x') sharding."""
    spec = P(*((None,) * (mask.ndim - 2) + ("y", "x")))
    return jax.device_put(mask, NamedSharding(mesh, spec))


def shard_state(mesh: Mesh, f, solid=None):
    """Place global arrays with the canonical ('y','x') sharding."""
    ndim = f.ndim - 1
    spec_f = P(*((None,) + (None,) * (ndim - 2) + ("y", "x")))
    f = jax.device_put(f, NamedSharding(mesh, spec_f))
    if solid is not None:
        solid = shard_mask(mesh, solid)
    return f, solid


def shard_initial_state(problem: Problem, mesh: Mesh):
    """Sharded (f, solid) with f BUILT ON DEVICE — numerically identical to
    shard_state(mesh, problem.initial_state(), problem.solid), but only the
    Q-free solid mask crosses host→device. The Q-sized f (1.3 GB at 256³)
    is a broadcast + select the TPU materializes directly into each shard;
    over a slow host link this turns minutes of transfer into milliseconds.
    """
    from .. import physics

    if (problem.thermal is not None or problem.init_rho_map is not None
            or problem.init_fields is not None):
        # thermal (conductive T profile + seed mode), multiphase
        # (droplet/band rho map) and analytic-field (Taylor-Green /
        # shear-layer init_fields) initial states are not uniform
        # broadcasts (models/base.initial_state) — build on host; those
        # grids are far below the sizes this fast path targets
        return shard_state(mesh, problem.initial_state(), problem.solid)

    ndim = len(problem.spatial_shape)
    spec_f = P(*((None,) + (None,) * (ndim - 2) + ("y", "x")))
    feq = problem.ghost_ring_values()                       # (Q,) host
    shape = (problem.lattice.Q,) + problem.spatial_shape
    bshape = (problem.lattice.Q,) + (1,) * ndim

    solid = None
    if problem.solid is not None:
        solid = shard_mask(mesh, problem.solid)
        rest = physics.rest_equilibrium(problem.lattice, problem.dtype)

        def build(s):
            f = jnp.broadcast_to(jnp.asarray(feq).reshape(bshape), shape)
            return jnp.where(s[None], jnp.asarray(rest).reshape(bshape), f)

        f = jax.jit(build, out_shardings=NamedSharding(mesh, spec_f))(solid)
    else:
        def build():
            return jnp.broadcast_to(jnp.asarray(feq).reshape(bshape), shape)

        f = jax.jit(build, out_shardings=NamedSharding(mesh, spec_f))()
    return f, solid

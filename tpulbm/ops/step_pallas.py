"""Fused collide-stream Pallas TPU kernel — the production hot path.

One kernel performs, per y-slab of the local block:
  HBM→VMEM DMA of a Ty-row slab (4-slot ring, prefetched 2 ahead) →
  moments + BGK relaxation (+ body force) once per slab, in place →
  pull-streaming of the output tile: y via cross-slab row concat, x via lane
  rolls, with ghost-equilibrium sanitize at the physical x edges →
  in-place boundary conditions on edge strips (walls / Zou-He inlet /
  Zou-He outlet / obstacle) →
  VMEM→HBM DMA of the output slab (async, double-buffered).

This is the TPU answer to the reference's separate OpenMP passes (collision
LBMSolver.h:84-126, streaming LBMSolver.h:128-145, BC sweep
LBMSolver.h:147-265): exactly one HBM read and one HBM write of f per step,
the budget required by BASELINE.md (~72 B/cell/step in f32). The AVX2
equilibrium kernels (LBMUtils.h:22-65) become plain vector expressions on
the 8×128 VPU.

Layout and constraints (Mosaic DMA tiling rules measured on v5e):
  * f is SoA (Q, nyl, nxl) f32, x = 128-lane minor dim. On real TPUs nxl
    must be a multiple of 128 and the slab height a multiple of 8 (interpret
    mode for CPU tests has no such limits).
  * y-halo ("ring") rows arrive as separate (Q, 1, nxl) inputs, produced by
    parallel/halo.ring_rows (ppermute over the 'y' mesh axis; frozen ghost
    equilibrium at physical edges). The kernel collides them locally.
  * The pallas backend shards over y only (mesh_x == 1). x-direction pulls
    wrap via lane roll; at non-periodic global x edges the wrapped lanes are
    overwritten with the frozen ghost equilibrium, reproducing the
    reference's never-updated edge ghosts (LBMGrid.h:185-213) exactly —
    including the corner-cell Zou-He interaction chain.

D2Q9 / f32 / 2-D. The jax backend covers f64, 3-D, and x-sharded meshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import Problem

# VMEM budget for slab/output/mask buffers (bytes); v5e has ~16 MiB more.
_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_ty(nyl: int, nxl: int, q: int, has_solid: bool,
             aligned: bool) -> int:
    """Largest slab height dividing nyl that fits the VMEM budget
    (4-slot f ring + 2-slot out ring + optional 4-slot mask ring)."""
    def usage(ty):
        per_row = nxl * 4
        return (4 * q * ty + 2 * q * ty + (4 * ty if has_solid else 0)) * per_row

    valid = [ty for ty in range(1, nyl + 1)
             if nyl % ty == 0 and usage(ty) <= _VMEM_BUDGET
             and (not aligned or ty % 8 == 0)]
    if not valid:
        raise ValueError(
            f"no y-slab of {nyl} rows fits VMEM (nx={nxl}); on TPU the local "
            f"ny must have a multiple-of-8 divisor small enough to tile")
    return max(valid)


def make_local_step_pallas(problem: Problem,
                           local_shape: tuple[int, ...],
                           interpret: bool | None = None):
    """Build step(f, rb, rt, flags, mask, mrb, mrt) -> f_new.

    f: (Q, nyl, nxl) local block; rb/rt: (Q, 1, nxl) ring rows below/above
    (see parallel/halo.ring_rows); flags: (4,) int32
    [is_bottom, is_top, is_left, is_right] for this shard; mask*: f32 solid
    masks (center block and ring rows) or None when the problem has no
    obstacle. Verified equivalent to the jax tier by tests/test_pallas.py.
    """
    lat = problem.lattice
    if lat.D != 2:
        raise ValueError("pallas backend is 2-D (D2Q9); use backend='jax' for 3-D")
    if problem.dtype != np.float32:
        raise ValueError("pallas backend is f32; use backend='jax' for f64")
    nyl, nxl = local_shape
    Q = lat.Q
    c = [(int(cx), int(cy)) for cx, cy in lat.c]
    w = [float(v) for v in lat.w]
    opp = [int(v) for v in lat.opposite]
    inv_tau = 1.0 / problem.params.tau
    u_in = float(problem.init_u[0])
    eq_in = [float(v) for v in problem.ghost_ring_values()]
    has_solid = problem.solid is not None
    bounce_back = has_solid and problem.obstacle_bc == "bounce_back"
    p = problem.params
    if problem.body_force:
        F = np.asarray(problem.body_force, np.float64)
        src = [float(3.0 * w[i] * (c[i][0] * F[0] + c[i][1] * F[1]))
               for i in range(Q)]
    else:
        src = None

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not interpret and nxl % 128 != 0:
        raise ValueError(f"pallas backend needs local nx % 128 == 0, got {nxl}")
    import os
    ty_env = os.environ.get("TPULBM_PALLAS_TY")
    if ty_env:
        Ty = int(ty_env)
        if nyl % Ty:
            raise ValueError(f"TPULBM_PALLAS_TY={Ty} does not divide ny={nyl}")
    else:
        Ty = _pick_ty(nyl, nxl, Q, has_solid, aligned=not interpret)
    n_ty = nyl // Ty

    def collide_rows(fw, solid_rows):
        """BGK relax a list of Q same-shape row blocks (LBMSolver.h:101-123)."""
        rho = fw[0]
        for i in range(1, Q):
            rho = rho + fw[i]
        mx = fw[1] - fw[3] + fw[5] - fw[6] - fw[7] + fw[8]
        my = fw[2] - fw[4] + fw[5] + fw[6] - fw[7] - fw[8]
        inv_rho = 1.0 / rho
        ux = mx * inv_rho
        uy = my * inv_rho
        base = 1.0 - 1.5 * (ux * ux + uy * uy)
        out = []
        for i in range(Q):
            cx, cy = c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = w[i] * rho * base
            fp = fw[i] - inv_tau * (fw[i] - feq)
            if src is not None and src[i]:
                fp = fp + src[i]
            if bounce_back:
                fp = jnp.where(solid_rows, fw[i], fp)  # collision skips solids
            out.append(fp)
        return out

    def kernel(flags_ref, f_ref, rb_ref, rt_ref, mask_ref, mrb_ref, mrt_ref,
               out_ref, fsl, ob, msl, sem_f, sem_ob, sem_m):
        fb, ft, fl, fr = (flags_ref[k] for k in range(4))

        def f_dma(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), :], fsl.at[t % 4],
                sem_f.at[t % 4])

        def m_dma(t):
            return pltpu.make_async_copy(
                mask_ref.at[pl.ds(t * Ty, Ty), :], msl.at[t % 4],
                sem_m.at[t % 4])

        def out_dma(t):
            return pltpu.make_async_copy(
                ob.at[t % 2], out_ref.at[:, pl.ds(t * Ty, Ty), :],
                sem_ob.at[t % 2])

        def start_in(t):
            f_dma(t).start()
            if has_solid:
                m_dma(t).start()

        def wait_in(t):
            f_dma(t).wait()
            if has_solid:
                m_dma(t).wait()

        def collide_slab(slot):
            fw = [fsl[slot, i] for i in range(Q)]
            solid_rows = (msl[slot] > 0.5) if bounce_back else None
            fp = collide_rows(fw, solid_rows)
            for i in range(Q):
                fsl[slot, i] = fp[i]

        # Collide the ring rows once (loop-invariant; pointwise — each shard
        # recomputes its neighbors' post-collision edge rows locally instead
        # of shipping them, see parallel/halo.py).
        rb_fp = collide_rows([rb_ref[i] for i in range(Q)],
                             (mrb_ref[...] > 0.5) if bounce_back else None)
        rt_fp = collide_rows([rt_ref[i] for i in range(Q)],
                             (mrt_ref[...] > 0.5) if bounce_back else None)

        # Prologue: slabs 0 and 1 in flight; slab 0 collided.
        start_in(0)
        if n_ty > 1:
            start_in(1)
        wait_in(0)
        collide_slab(0)

        def loop(t, carry):
            # finish + collide slab t+1; prefetch slab t+2
            @pl.when(t + 1 < n_ty)
            def _():
                wait_in(t + 1)
                collide_slab((t + 1) % 4)

            @pl.when(t + 2 < n_ty)
            def _():
                start_in(t + 2)

            oslot = t % 2

            @pl.when(t >= 2)
            def _():
                out_dma(t - 2).wait()

            # ---- pull streaming into the output slab ----
            cur_slot = t % 4
            for i in range(Q):
                cx, cy = c[i]
                cur = fsl[cur_slot, i]
                if cy == 0:
                    rows = cur
                elif cy > 0:  # pull from the row below
                    below = jnp.where(t == 0, rb_fp[i],
                                      fsl[(t - 1) % 4, i, Ty - 1:Ty, :])
                    rows = jnp.concatenate([below, cur[0:Ty - 1, :]], axis=0)
                else:         # pull from the row above
                    above = jnp.where(t == n_ty - 1, rt_fp[i],
                                      fsl[(t + 1) % 4, i, 0:1, :])
                    rows = jnp.concatenate([cur[1:Ty, :], above], axis=0)
                if cx:
                    rows = pltpu.roll(rows, cx % nxl, axis=1)
                ob[oslot, i] = rows

            # ---- ghost sanitize at physical x edges (LBMGrid.h:185-213):
            # lanes that wrapped across the domain edge read the frozen
            # inlet-equilibrium ghosts instead ----
            if not problem.periodic_x:
                for i in range(Q):
                    cx, _ = c[i]
                    if cx > 0:
                        @pl.when(fl == 1)
                        def _(i=i):
                            ob[oslot, i, :, 0:1] = jnp.full(
                                (Ty, 1), eq_in[i], jnp.float32)
                    elif cx < 0:
                        @pl.when(fr == 1)
                        def _(i=i):
                            ob[oslot, i, :, nxl - 1:nxl] = jnp.full(
                                (Ty, 1), eq_in[i], jnp.float32)

            # ---- walls (LBMSolver.h:153-176) ----
            if problem.walls_y:
                @pl.when(jnp.logical_and(t == 0, fb == 1))
                def _bottom():
                    for i in (2, 5, 6):  # f2<-f4, f5<-f7, f6<-f8
                        val = ob[oslot, opp[i], 0:1, :]
                        if has_solid:
                            fluid = msl[cur_slot, 0:1, :] < 0.5
                            val = jnp.where(fluid, val, ob[oslot, i, 0:1, :])
                        ob[oslot, i, 0:1, :] = val

                @pl.when(jnp.logical_and(t == n_ty - 1, ft == 1))
                def _top():
                    for i in (4, 7, 8):  # f4<-f2, f7<-f5, f8<-f6
                        val = ob[oslot, opp[i], Ty - 1:Ty, :]
                        if has_solid:
                            fluid = msl[cur_slot, Ty - 1:Ty, :] < 0.5
                            val = jnp.where(fluid, val,
                                            ob[oslot, i, Ty - 1:Ty, :])
                        ob[oslot, i, Ty - 1:Ty, :] = val

            # ---- Zou-He inlet, column 0 (LBMSolver.h:179-207) ----
            if problem.inlet_zou_he:
                @pl.when(fl == 1)
                def _inlet():
                    pr = [ob[oslot, i, :, 0:1] for i in range(Q)]
                    rho_bc = (pr[0] + pr[2] + pr[4]
                              + 2.0 * (pr[3] + pr[6] + pr[7])) / (1.0 - u_in)
                    ru = rho_bc * u_in
                    ht = 0.5 * (pr[2] - pr[4])
                    new = {1: pr[3] + (2.0 / 3.0) * ru,
                           5: pr[7] - ht + (1.0 / 6.0) * ru,
                           8: pr[6] + ht + (1.0 / 6.0) * ru}
                    for i, val in new.items():
                        if has_solid:
                            fluid = msl[cur_slot, :, 0:1] < 0.5
                            val = jnp.where(fluid, val, pr[i])
                        ob[oslot, i, :, 0:1] = val

            # ---- Zou-He pressure outlet, column nxl-1 (LBMSolver.h:210-236) ----
            if problem.outlet_zou_he:
                @pl.when(fr == 1)
                def _outlet():
                    xc = nxl - 1
                    pr = [ob[oslot, i, :, xc:xc + 1] for i in range(Q)]
                    u_out = -1.0 + (pr[0] + pr[2] + pr[4]
                                    + 2.0 * (pr[1] + pr[5] + pr[8]))  # rho=1
                    ht = 0.5 * (pr[2] - pr[4])
                    new = {3: pr[1] - (2.0 / 3.0) * u_out,
                           6: pr[8] - ht - (1.0 / 6.0) * u_out,
                           7: pr[5] + ht - (1.0 / 6.0) * u_out}
                    for i, val in new.items():
                        if has_solid:
                            fluid = msl[cur_slot, :, xc:xc + 1] < 0.5
                            val = jnp.where(fluid, val, pr[i])
                        ob[oslot, i, :, xc:xc + 1] = val

            # ---- obstacle (semantics: ops/boundaries.apply_obstacle) ----
            if has_solid:
                solid_c = msl[cur_slot] > 0.5
                if bounce_back:
                    snap = [ob[oslot, i] for i in range(Q)]
                    for i in range(Q):
                        ob[oslot, i] = jnp.where(solid_c, snap[opp[i]],
                                                 ob[oslot, i])
                else:  # reference-parity equilibrium wall: pin to w_i
                    for i in range(Q):
                        ob[oslot, i] = jnp.where(solid_c, w[i], ob[oslot, i])

            out_dma(t).start()
            return carry

        lax.fori_loop(0, n_ty, loop, 0, unroll=False)
        if n_ty >= 2:
            out_dma(n_ty - 2).wait()
        out_dma(n_ty - 1).wait()

    scratch_shapes = [
        pltpu.VMEM((4, Q, Ty, nxl), jnp.float32),     # f slabs (collided in place)
        pltpu.VMEM((2, Q, Ty, nxl), jnp.float32),     # output slabs
        pltpu.VMEM((4, Ty, nxl), jnp.float32),        # mask slabs
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((4,)),
    ]

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flags (4,) int32
            pl.BlockSpec(memory_space=pl.ANY),      # f (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rb (Q,1,nxl)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rt
            pl.BlockSpec(memory_space=pl.ANY),      # mask f32 (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask ring below (1,nxl)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask ring above
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nyl, nxl), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )

    zero_mask = np.zeros((nyl, nxl), np.float32)
    zero_row = np.zeros((1, nxl), np.float32)

    def step(f, rb, rt, flags, mask=None, mrb=None, mrt=None):
        if has_solid and mask is None:
            raise ValueError("pallas backend needs the solid mask")
        mask = jnp.asarray(zero_mask) if mask is None else mask
        mrb = jnp.asarray(zero_row) if mrb is None else mrb
        mrt = jnp.asarray(zero_row) if mrt is None else mrt
        return call(flags, f, rb, rt, mask, mrb, mrt)

    step.tile_height = Ty
    return step

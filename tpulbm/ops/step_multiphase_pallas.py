"""Fused Shan-Chen multiphase collide-stream Pallas kernel.

Same slab DMA pipeline as the thermal kernel (ops/step_thermal_pallas.py)
with one extra pipeline stage: the collision is NOT pointwise here — the
interaction force needs ψ of the ±1 neighbors — so each slab's ψ is
computed from the PRE-collision densities when its DMA lands, and slab t
is collided only once ψ(t+1)'s first row exists:

    iteration t:  wait DMA(t+2) → ψ(t+2) → collide(t+1)
                  → pull-stream(t) → walls → out-DMA(t)

Raw slabs live for 4 iterations (t−1 … t+2), exactly the 4-slot ring. The
y rings are DEPTH-2 pre-collision rows (halo.ring_rows(depth=2)): the
innermost ring row is collided in-kernel with the force from ψ(outer ring
row, slab edge row) — reproducing the neighbor's post-collision edge
bit-for-bit, like every other kernel family, so only pre-collision rows
travel over ICI and ONE exchange per step suffices (the jax tier's padded
body needs two). Physical-edge rings hold the frozen eq rows (ρ =
init_rho), which are exactly the phantom wetting fluid of
ops/step_multiphase. x is periodic: pulls and ψ neighbors are lane rolls.

No reference analog (the reference is single-phase). Equivalence vs the
jax tier: tests/test_multiphase.py (interpret mode) and the TPU probe.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import Problem

_VMEM_BUDGET = int(float(os.environ.get("TPULBM_VMEM_MB", "13"))
                   * 1024 * 1024)


@dataclasses.dataclass(frozen=True)
class _CfgM:
    Q: int
    c: tuple
    w: tuple
    opp: tuple
    inv_tau: float
    tau: float
    g: float
    rho0: float
    Ty: int
    nxl: int
    n_ty: int


def _psi_rows(cfg: _CfgM, fw):
    """ψ(ρ) of a list of Q same-shape row blocks (pre-collision)."""
    rho = fw[0]
    for i in range(1, cfg.Q):
        rho = rho + fw[i]
    return cfg.rho0 * (1.0 - jnp.exp(-rho / cfg.rho0))


def _force_rows(cfg: _CfgM, psi, below, above):
    """(Fx, Fy) on a row block from its ψ block and the ψ rows directly
    below/above it. Mirrors ops/step_multiphase.shan_chen_force (same i
    order, same per-direction accumulation)."""
    Ty = psi.shape[0]
    fx = fy = None
    for i in range(1, cfg.Q):
        cx, cy = cfg.c[i]
        if cy == 0:
            nb = psi
        elif cy > 0:  # ψ(y + 1)
            # Ty == 1 (ring-row blocks): the whole shifted block IS the
            # neighbor row — a psi[1:1] slice would be a zero-size vector,
            # which Mosaic-on-silicon rejects (round-4 on-TPU probe;
            # interpret mode concatenated it silently)
            nb = above if Ty == 1 else \
                jnp.concatenate([psi[1:Ty, :], above], axis=0)
        else:
            nb = below if Ty == 1 else \
                jnp.concatenate([below, psi[0:Ty - 1, :]], axis=0)
        if cx:
            nb = pltpu.roll(nb, (-cx) % cfg.nxl, axis=1)
        w = cfg.w[i]
        if cx:
            term = (w * cx) * nb
            fx = term if fx is None else fx + term
        if cy:
            term = (w * cy) * nb
            fy = term if fy is None else fy + term
    return (-cfg.g) * psi * fx, (-cfg.g) * psi * fy


def _collide_mp_rows(cfg: _CfgM, fw, Fx, Fy):
    """Velocity-shift BGK (physics.collide_shan_chen) on Q row blocks."""
    Q = cfg.Q
    rho = fw[0]
    for i in range(1, Q):
        rho = rho + fw[i]
    mx = fw[1] - fw[3] + fw[5] - fw[6] - fw[7] + fw[8]
    my = fw[2] - fw[4] + fw[5] + fw[6] - fw[7] - fw[8]
    ux = mx / rho + cfg.tau * Fx / rho
    uy = my / rho + cfg.tau * Fy / rho
    base = 1.0 - 1.5 * (ux * ux + uy * uy)
    out = []
    for i in range(Q):
        cx, cy = cfg.c[i]
        cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
        if cx or cy:
            feq = cfg.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
        else:
            feq = cfg.w[i] * rho * base
        out.append(fw[i] - cfg.inv_tau * (fw[i] - feq))
    return out


def make_local_step_multiphase_pallas(problem: Problem,
                                      local_shape: tuple[int, ...],
                                      interpret: bool | None = None,
                                      x_halo: bool = False):
    """1-step fused multiphase kernel: step(f, rb, rt, flags[, rl, rr])
    -> f_new.

    f: (Q, nyl, nxl); rb/rt: (Q, 2, nxl) DEPTH-2 pre-collision ring rows
    (domain-ordered: rb[:, 1] / rt[:, 0] are the innermost); flags: (4,)
    int32 [is_bottom, is_top, _, _]. Raises ValueError for configurations
    the kernel does not cover (f64, unaligned nx) — the chunk builder
    degrades to the jax tier with a warning.

    x_halo=True makes the kernel x-SHARDABLE (the thermal kernel's
    stitched-buffer scheme, VERDICT r4 #3a): each slab gains Hx halo
    columns per side from rl/rr = halo.ring_cols at DEPTH 2 — the ψ
    stencil consumes one column of validity (the interaction force needs
    ψ(x±1)) and the pull stream consumes the other, so the innermost
    halo column's post-collision value (which owned columns stream from)
    is computed from real neighbor data exactly as the neighbor computes
    it. The y rings arrive EXTENDED across the halo regions
    (halo.ring_rows_ext, depth 2 — diagonal corners); x pulls and ψ
    shifts stay plain lane rolls of the stitched width; only owned
    center columns are written back.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not problem.shan_chen:
        raise ValueError("multiphase kernel needs problem.shan_chen")
    if problem.dtype != np.float32:
        raise ValueError("multiphase pallas kernel is f32; use "
                         "backend='jax' for f64")
    lat = problem.lattice
    nyl, nxl = local_shape
    if not interpret and nxl % 128 != 0:
        raise ValueError(f"pallas backend needs local nx % 128 == 0, "
                         f"got {nxl}")
    g, rho0 = problem.shan_chen
    Q = lat.Q
    # x-halo width: 128-lane aligned on TPU; tiny (but >= the depth-2
    # validity the psi stencil + stream consume) in interpret mode
    Hx = (128 if not interpret else 2) if x_halo else 0
    Wx = nxl + 2 * Hx

    def usage(ty):
        # 4 raw + 2 out f-slabs + 4 ψ slabs (1 plane each)
        return (4 + 2) * Q * ty * Wx * 4 + 4 * ty * Wx * 4
    valid = [ty for ty in range(1, nyl + 1)
             if nyl % ty == 0 and usage(ty) <= _VMEM_BUDGET
             and (interpret or ty % 8 == 0)]
    if not valid:
        raise ValueError(f"no y-slab of {nyl} rows fits VMEM (nx={nxl})")
    Ty = max(valid)

    cfg = _CfgM(
        Q=Q, c=tuple((int(v[0]), int(v[1])) for v in lat.c),
        w=tuple(float(v) for v in lat.w),
        opp=tuple(int(v) for v in lat.opposite),
        inv_tau=1.0 / problem.params.tau, tau=float(problem.params.tau),
        g=float(g), rho0=float(rho0),
        Ty=Ty, nxl=Wx, n_ty=nyl // Ty)
    n_ty = cfg.n_ty
    f_in_bottom = [i for i in range(Q) if lat.c[i, 1] > 0]
    f_in_top = [i for i in range(Q) if lat.c[i, 1] < 0]

    def kernel(flags_ref, f_ref, rb_ref, rt_ref, *more):
        if x_halo:
            rl_ref, rr_ref, out_ref, fsl, psl, ob, sem_f, sem_ob, sem_x = more
        else:
            out_ref, fsl, psl, ob, sem_f, sem_ob = more
            rl_ref = rr_ref = sem_x = None

        def f_dma(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), :],
                fsl.at[t % 4, :, :, Hx:Hx + nxl], sem_f.at[t % 4])

        def x_dmas(t):
            return [pltpu.make_async_copy(
                        rl_ref.at[:, pl.ds(t * Ty, Ty), :],
                        fsl.at[t % 4, :, :, 0:Hx], sem_x.at[0, t % 4]),
                    pltpu.make_async_copy(
                        rr_ref.at[:, pl.ds(t * Ty, Ty), :],
                        fsl.at[t % 4, :, :, Hx + nxl:Wx], sem_x.at[1, t % 4])]

        def out_dma(t):
            return pltpu.make_async_copy(
                ob.at[t % 2, :, :, Hx:Hx + nxl],
                out_ref.at[:, pl.ds(t * Ty, Ty), :],
                sem_ob.at[t % 2])

        # ---- ring ψ (pre-collision; eq rows at physical edges are the
        # phantom wetting fluid, no masking needed) ----
        psb = _psi_rows(cfg, [rb_ref[i] for i in range(Q)])   # (2, nxl)
        pst = _psi_rows(cfg, [rt_ref[i] for i in range(Q)])

        def psi_slab(t):
            psl[t % 4] = _psi_rows(cfg, [fsl[t % 4, i] for i in range(Q)])

        def below_psi_row(t):
            """ψ row directly below slab t (pre-collision)."""
            if n_ty == 1:
                return psb[1:2, :]
            return jnp.where(t == 0, psb[1:2, :],
                             psl[(t - 1) % 4, Ty - 1:Ty, :])

        def above_psi_row(t):
            if n_ty == 1:
                return pst[0:1, :]
            return jnp.where(t == n_ty - 1, pst[0:1, :],
                             psl[(t + 1) % 4, 0:1, :])

        def collide_slab(t):
            slot = t % 4
            Fx, Fy = _force_rows(cfg, psl[slot], below_psi_row(t),
                                 above_psi_row(t))
            fp = _collide_mp_rows(cfg, [fsl[slot, i] for i in range(Q)],
                                  Fx, Fy)
            for i in range(Q):
                fsl[slot, i] = fp[i]

        def f_start(t):
            f_dma(t).start()
            if x_halo:
                for cp in x_dmas(t):
                    cp.start()

        def f_wait(t):
            f_dma(t).wait()
            if x_halo:
                for cp in x_dmas(t):
                    cp.wait()

        # ---- prologue: DMA slabs 0..2, ψ(0..1), collide(0), collide the
        # innermost ring rows (their force uses the outer ring ψ and the
        # slab edge ψ — reproducing the neighbor's post-collision edge) ----
        for j in range(min(3, n_ty)):
            f_start(j)
        f_wait(0)
        psi_slab(0)
        if n_ty > 1:
            f_wait(1)
            psi_slab(1)

        Fxb, Fyb = _force_rows(cfg, psb[1:2, :], psb[0:1, :],
                               psl[0, 0:1, :])
        rb_fp = _collide_mp_rows(cfg, [rb_ref[i, 1:2, :] for i in range(Q)],
                                 Fxb, Fyb)
        collide_slab(0)

        def loop(t, carry):
            @pl.when(t + 2 < n_ty)
            def _():
                f_wait(t + 2)
                psi_slab(t + 2)

            @pl.when(t + 1 < n_ty)
            def _():
                collide_slab(t + 1)

            oslot = t % 2

            @pl.when(t >= 2)
            def _():
                out_dma(t - 2).wait()

            # top ring row collided lazily: its force needs ψ of the LAST
            # slab, which only exists once that slab's DMA landed; the
            # expression reads psl[(n_ty-1)%4] every iteration but is only
            # consumed (via the t == n_ty-1 select below) when valid
            Fxt, Fyt = _force_rows(cfg, pst[0:1, :],
                                   psl[(n_ty - 1) % 4, Ty - 1:Ty, :],
                                   pst[1:2, :])
            rt_fp = _collide_mp_rows(cfg,
                                     [rt_ref[i, 0:1, :] for i in range(Q)],
                                     Fxt, Fyt)

            cur = t % 4
            for i in range(Q):
                cx, cy = cfg.c[i]
                if cy == 0:
                    rows = fsl[cur, i]
                elif cy > 0:
                    below = jnp.where(t == 0, rb_fp[i],
                                      fsl[(t - 1) % 4, i, Ty - 1:Ty, :])
                    rows = jnp.concatenate([below, fsl[cur, i, 0:Ty - 1, :]],
                                           axis=0)
                else:
                    above = jnp.where(t == n_ty - 1, rt_fp[i],
                                      fsl[(t + 1) % 4, i, 0:1, :])
                    rows = jnp.concatenate([fsl[cur, i, 1:Ty, :], above],
                                           axis=0)
                if cx:
                    rows = pltpu.roll(rows, cx % Wx, axis=1)
                ob[oslot, i] = rows

            # exact-mass walls (ops/step_multiphase conventions): incoming
            # populations at a physical wall row are the node's OWN
            # post-collision outward values
            fb, ft = flags_ref[0], flags_ref[1]

            @pl.when(jnp.logical_and(t == 0, fb == 1))
            def _bottom():
                for i in f_in_bottom:
                    ob[oslot, i, 0:1, :] = fsl[cur, cfg.opp[i], 0:1, :]

            @pl.when(jnp.logical_and(t == n_ty - 1, ft == 1))
            def _top():
                for i in f_in_top:
                    ob[oslot, i, Ty - 1:Ty, :] = \
                        fsl[cur, cfg.opp[i], Ty - 1:Ty, :]

            out_dma(t).start()

            @pl.when(t + 3 < n_ty)
            def _():
                f_start(t + 3)

            return carry

        lax.fori_loop(0, n_ty, loop, 0, unroll=False)
        if n_ty >= 2:
            out_dma(n_ty - 2).wait()
        out_dma(n_ty - 1).wait()

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # flags (4,) int32
        pl.BlockSpec(memory_space=pl.ANY),      # f (HBM)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rb (Q, 2, Wx)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rt
    ]
    scratch = [
        pltpu.VMEM((4, Q, Ty, Wx), jnp.float32),
        pltpu.VMEM((4, Ty, Wx), jnp.float32),
        pltpu.VMEM((2, Q, Ty, Wx), jnp.float32),
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if x_halo:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # rl (Q, nyl, Hx)
                     pl.BlockSpec(memory_space=pl.ANY)]   # rr
        scratch.append(pltpu.SemaphoreType.DMA((2, 4)))   # x-halo pieces
    call = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nyl, nxl), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )

    def step(f, rb, rt, flags, rl=None, rr=None):
        if not x_halo:
            return call(flags, f, rb, rt)
        if rl is None or rr is None:
            raise ValueError("x-sharded multiphase kernel needs rl/rr "
                             "ring columns")
        return call(flags, f, rb, rt, rl, rr)

    step.tile_height = Ty
    step.n_ty = n_ty
    step.x_halo = x_halo
    step.halo_width = Hx
    return step

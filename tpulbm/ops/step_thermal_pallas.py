"""Fused thermal (double-population) collide-stream Pallas kernel.

Same slab DMA pipeline as the isothermal 1-step kernel
(ops/step_pallas.py make_local_step_pallas) on the stacked
(Q_f + Q_g, ny, nx) state: one HBM read + one write of the state per
step, collide (BGK f + Boussinesq source, BGK g toward the
advection-diffusion equilibrium) fused with pull-streaming and the wall
BCs in VMEM. Thermal models are periodic in x, so x pulls are plain lane
rolls — no ghost sanitize columns at all (simpler than the cylinder
kernel). y slab boundaries use 1-row rings (parallel/halo.ring_rows);
ring rows are collided in-kernel exactly like the isothermal kernels
(collision is pointwise), with the physical bottom/top rows replaced by
the frozen ghost constants of ops/step_thermal._ghost_rows.

Wall BCs match ops/step_thermal.make_step_thermal bit-for-bit in
structure: f takes the node's OWN post-collision outward populations
(exact-mass full-way bounce-back — the slab is collided in place, so
they are at hand), g takes the half-link anti-bounce-back Dirichlet
closure against the just-streamed opposite.

The side-heated (de Vahl Davis) cavity is covered too: walls_x problems
get adiabatic no-slip x walls (BOTH populations take the post-collision
opposite on the edge columns, applied as full-width lane selects) and
the Boussinesq source rides whichever axis th.buoyancy_axis names.
Because x-walled grids never wrap, unaligned widths are lane-padded
(pad_x dead trailing columns pinned each step to their collision fixed
point: rest-equilibrium f, w_g*t_ref g), so e.g. the 96² benchmark grid
runs fused — the lane rolls push pad garbage only into edge columns the
wall BCs immediately rewrite.

No reference analog (the reference is isothermal and CPU-only).
Equivalence vs the jax tier: tests/test_thermal.py (interpret mode) and
the TPU probe.
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
from .step_thermal import _ghost_rows, _thermal_parts

_VMEM_BUDGET = int(float(os.environ.get("TPULBM_VMEM_MB", "13"))
                   * 1024 * 1024)


@dataclasses.dataclass(frozen=True)
class _CfgT:
    Qf: int
    Qs: int                 # total planes (f + g)
    c: tuple                # ((cx, cy), ...) for ALL planes
    w_f: tuple
    w_g: tuple              # scalar-lattice weights (g-plane order)
    opp: tuple              # opposite map for ALL planes (within each group)
    inv_tau: float
    inv_tau_g: float
    smag: float             # Smagorinsky Cs; 0 → plain BGK
    buoyancy: float
    baxis: int              # buoyancy axis: 1 = y (R-B), 0 = x (cavity)
    walls_x: bool           # adiabatic no-slip x walls (side-heated cavity)
    pad_x: int              # dead trailing lane-pad columns (walls_x only)
    pad_vals: tuple         # per-plane pad-column fixed point
    t_ref: float
    t_bottom: float
    t_top: float
    ghost_bottom: tuple     # frozen ghost row per plane at the bottom wall
    ghost_top: tuple
    Ty: int
    nxl: int
    n_ty: int


def _collide_thermal_rows(cfg: _CfgT, fw):
    """Thermal collide on a list of Qs same-shape row blocks (pointwise,
    safe on ring rows). Mirrors ops/step_thermal.collide_thermal."""
    Qf = cfg.Qf
    rho = fw[0]
    for i in range(1, Qf):
        rho = rho + fw[i]
    mx = fw[1] - fw[3] + fw[5] - fw[6] - fw[7] + fw[8]
    my = fw[2] - fw[4] + fw[5] + fw[6] - fw[7] - fw[8]
    inv_rho = 1.0 / rho
    ux = mx * inv_rho
    uy = my * inv_rho
    base = 1.0 - 1.5 * (ux * ux + uy * uy)
    T = fw[Qf]
    for i in range(Qf + 1, cfg.Qs):
        T = T + fw[i]
    fy = None
    if cfg.buoyancy:
        fy = cfg.buoyancy * (T - cfg.t_ref)
    out = []
    if cfg.smag:
        # Smagorinsky LES branch (ops/step_pallas._collide_rows): per-cell
        # tau_eff from the non-equilibrium stress in closed form
        devs = []
        for i in range(Qf):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = cfg.w_f[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = cfg.w_f[i] * rho * base
            devs.append(fw[i] - feq)
        pxx = devs[1] + devs[3] + devs[5] + devs[6] + devs[7] + devs[8]
        pyy = devs[2] + devs[4] + devs[5] + devs[6] + devs[7] + devs[8]
        pxy = devs[5] - devs[6] + devs[7] - devs[8]
        qbar = jnp.sqrt(2.0 * (pxx * pxx + pyy * pyy + 2.0 * (pxy * pxy)))
        tau0 = 1.0 / cfg.inv_tau
        inv_t = 2.0 / (tau0 + jnp.sqrt(
            tau0 * tau0 + (18.0 * cfg.smag * cfg.smag) * qbar * inv_rho))
        for i in range(Qf):
            cb = cfg.c[i][cfg.baxis]
            fp = fw[i] - inv_t * devs[i]
            if fy is not None and cb:
                fp = fp + (3.0 * cfg.w_f[i] * cb) * fy
            out.append(fp)
    else:
        for i in range(Qf):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = cfg.w_f[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = cfg.w_f[i] * rho * base
            fp = fw[i] - cfg.inv_tau * (fw[i] - feq)
            if fy is not None and cfg.c[i][cfg.baxis]:
                fp = fp + (3.0 * cfg.w_f[i] * cfg.c[i][cfg.baxis]) * fy
            out.append(fp)
    for k in range(cfg.Qs - Qf):
        i = Qf + k
        cx, cy = cfg.c[i]
        cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
        geq = cfg.w_g[k] * T if not (cx or cy) \
            else cfg.w_g[k] * T * (1.0 + 3.0 * cu)
        out.append(fw[i] - cfg.inv_tau_g * (fw[i] - geq))
    return out


def make_local_step_thermal_pallas(problem: Problem,
                                   local_shape: tuple[int, ...],
                                   interpret: bool | None = None,
                                   pad_x: int = 0,
                                   x_halo: bool = False):
    """1-step fused thermal kernel: step(s, rb, rt, flags[, rl, rr]) -> s_new.

    s: (Qs, nyl, nxl); rb/rt: (Qs, 1, nxl) ring rows; flags: (4,) int32
    [is_bottom, is_top, is_left, is_right] (the x entries gate the
    walls_x bounce — full-width callers pass 1). local_shape is the
    (possibly lane-padded) buffer shape; pad_x of its trailing columns
    are dead padding (only legal for walls_x problems — a periodic
    grid's lane rolls would wrap through the pad).

    x_halo=True makes the kernel x-SHARDABLE (the 3-D kernels' stitched
    buffer scheme): each slab gains Hx = 128 halo columns per side from
    ring inputs rl/rr = halo.ring_cols (Qs, nyl, Hx), the y ring rows
    arrive EXTENDED across the halo regions (halo.ring_rows_ext —
    diagonal corner data), x pulls stay plain lane rolls of the stitched
    (Ty, nxl + 2Hx) buffer (one substep needs one column of validity),
    and only the owned center columns are written back. Physical-x wall
    bounces fire only on shards whose flags mark them at the global x
    edges. Unaligned shard widths lane-pad (pad_x > 0): the chunk body
    refreshes the pad columns per step as LIVE shadow copies of the east
    neighbor's first columns (halo.ring_cols_padded — the 2-D generic
    kernels' scheme), so the in-kernel pad pin stays off and both the
    walled cavity AND periodic (wrap-shadow) geometries pad.

    Raises ValueError for configurations the kernel does not cover
    (f64, unaligned periodic/sharded nx) — the chunk builder degrades
    to the jax tier with a warning.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lat, lg, th = _thermal_parts(problem)
    if problem.dtype != np.float32:
        raise ValueError("thermal pallas kernel is f32; use backend='jax' "
                         "for f64")
    walls_x = bool(problem.walls_x)
    if not problem.periodic_x and not walls_x:
        raise ValueError("thermal pallas kernel covers x-periodic "
                         "(Rayleigh-Bénard) and x-walled (side-heated "
                         "cavity) geometries")
    if pad_x and not walls_x and not x_halo:
        raise ValueError("lane padding needs x walls (full-width periodic "
                         "lane rolls would wrap through the pad); x-sharded "
                         "meshes pad with live shadow columns instead")
    nyl, nxl = local_shape
    if not interpret and nxl % 128 != 0:
        raise ValueError(f"pallas backend needs padded local nx % 128 == 0, "
                         f"got {nxl}")
    Qf, Qs = lat.Q, problem.state_q
    c_all = np.concatenate([lat.c, lg.c], axis=0)
    opp = tuple(int(v) for v in lat.opposite) + tuple(
        Qf + int(v) for v in lg.opposite)
    gb, gt = _ghost_rows(problem)
    # pad-column fixed point: rest-equilibrium f (collides to itself at
    # rho=1, u=0), w_g*t_ref g (buoyancy source vanishes at T = t_ref)
    from .. import physics
    pad_vals = np.concatenate([physics.rest_equilibrium(lat, np.float32),
                               (lg.w * th.t_ref).astype(np.float32)])
    # x-halo width: 128-lane aligned on TPU; tiny in interpret mode
    Hx = (128 if not interpret else 2) if x_halo else 0
    Wx = nxl + 2 * Hx

    def usage(ty):
        return (4 + 2) * Qs * ty * Wx * 4
    valid = [ty for ty in range(1, nyl + 1)
             if nyl % ty == 0 and usage(ty) <= _VMEM_BUDGET
             and (interpret or ty % 8 == 0)]
    if not valid:
        raise ValueError(
            f"no y-slab of {nyl} rows fits VMEM (nx={nxl})")
    Ty = max(valid)

    cfg = _CfgT(
        Qf=Qf, Qs=Qs,
        c=tuple((int(v[0]), int(v[1])) for v in c_all),
        w_f=tuple(float(v) for v in lat.w),
        w_g=tuple(float(v) for v in lg.w),
        opp=opp,
        inv_tau=1.0 / problem.params.tau,
        inv_tau_g=1.0 / th.tau_g,
        smag=float(problem.smagorinsky),
        buoyancy=float(th.buoyancy),
        baxis=int(th.buoyancy_axis),
        walls_x=walls_x,
        pad_x=int(pad_x),
        pad_vals=tuple(float(v) for v in pad_vals),
        t_ref=float(th.t_ref),
        t_bottom=float(th.t_bottom),
        t_top=float(th.t_top),
        ghost_bottom=tuple(float(v) for v in gb),
        ghost_top=tuple(float(v) for v in gt),
        Ty=Ty, nxl=Wx, n_ty=nyl // Ty,
    )
    n_ty = cfg.n_ty

    # inward plane index sets at each wall (f bounces, g anti-bounces)
    f_in_bottom = [i for i in range(Qf) if c_all[i, 1] > 0]
    f_in_top = [i for i in range(Qf) if c_all[i, 1] < 0]
    g_in_bottom = [i for i in range(Qf, Qs) if c_all[i, 1] > 0]
    g_in_top = [i for i in range(Qf, Qs) if c_all[i, 1] < 0]

    def kernel(flags_ref, s_ref, rb_ref, rt_ref, *more):
        if x_halo:
            rl_ref, rr_ref, out_ref, fsl, ob, sem_f, sem_ob, sem_x = more
        else:
            out_ref, fsl, ob, sem_f, sem_ob = more
            rl_ref = rr_ref = sem_x = None
        fb, ft = flags_ref[0], flags_ref[1]
        fxl, fxr = flags_ref[2], flags_ref[3]

        def f_dma(t):
            return pltpu.make_async_copy(
                s_ref.at[:, pl.ds(t * Ty, Ty), :],
                fsl.at[t % 4, :, :, Hx:Hx + nxl], sem_f.at[t % 4])

        def x_dmas(t):
            return [pltpu.make_async_copy(
                        rl_ref.at[:, pl.ds(t * Ty, Ty), :],
                        fsl.at[t % 4, :, :, 0:Hx], sem_x.at[0, t % 4]),
                    pltpu.make_async_copy(
                        rr_ref.at[:, pl.ds(t * Ty, Ty), :],
                        fsl.at[t % 4, :, :, Hx + nxl:Wx], sem_x.at[1, t % 4])]

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

        def out_dma(t):
            return pltpu.make_async_copy(
                ob.at[t % 2, :, :, Hx:Hx + nxl],
                out_ref.at[:, pl.ds(t * Ty, Ty), :], sem_ob.at[t % 2])

        def collide_slab(slot):
            fp = _collide_thermal_rows(cfg, [fsl[slot, i]
                                             for i in range(Qs)])
            for i in range(Qs):
                fsl[slot, i] = fp[i]

        # ring rows: collide like the slab rows (pointwise); at the
        # physical walls replace with the frozen ghost constants (NOT a
        # collision fixed point here — buoyancy kicks any T != t_ref row)
        rb_fp = _collide_thermal_rows(cfg, [rb_ref[i] for i in range(Qs)])
        rt_fp = _collide_thermal_rows(cfg, [rt_ref[i] for i in range(Qs)])
        for i in range(Qs):
            rb_fp[i] = jnp.where(fb == 1, cfg.ghost_bottom[i], rb_fp[i])
            rt_fp[i] = jnp.where(ft == 1, cfg.ghost_top[i], rt_fp[i])

        f_start(0)
        if n_ty > 1:
            f_start(1)
        f_wait(0)
        collide_slab(0)

        def loop(t, carry):
            @pl.when(t + 1 < n_ty)
            def _():
                f_wait(t + 1)
                collide_slab((t + 1) % 4)

            @pl.when(t + 2 < n_ty)
            def _():
                f_start(t + 2)

            oslot = t % 2

            @pl.when(t >= 2)
            def _():
                out_dma(t - 2).wait()

            cur = t % 4
            col = lax.broadcasted_iota(jnp.int32, (Ty, Wx), 1)
            xl = Hx                         # physical west-wall column
            xr = Hx + nxl - 1 - cfg.pad_x   # physical east-wall column
            for i in range(Qs):
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
                if cfg.walls_x and cx:
                    # adiabatic no-slip x walls: BOTH populations take the
                    # node's own post-collision opposite on the physical
                    # edge column (ops/step_thermal.make_step_thermal);
                    # the lane roll put wrap/pad garbage exactly here. On
                    # x-sharded meshes only the global-edge shards bounce
                    # (flags[2]/flags[3]); interior shards' edge columns
                    # stream from the stitched halo instead.
                    fe = fxl if cx > 0 else fxr
                    rows = jnp.where(
                        jnp.logical_and(col == (xl if cx > 0 else xr),
                                        fe == 1),
                        fsl[cur, cfg.opp[i]], rows)
                if cfg.pad_x and not x_halo:
                    # re-pin the dead pad columns to their fixed point
                    # (x-halo pads are live shadows the chunk body
                    # refreshes per step — no in-kernel pin)
                    rows = jnp.where(col > xr, cfg.pad_vals[i], rows)
                ob[oslot, i] = rows

            # wall BCs (ops/step_thermal conventions)
            @pl.when(jnp.logical_and(t == 0, fb == 1))
            def _bottom():
                for i in f_in_bottom:
                    ob[oslot, i, 0:1, :] = fsl[cur, cfg.opp[i], 0:1, :]
                for i in g_in_bottom:
                    wsum = cfg.w_g[i - Qf] + cfg.w_g[cfg.opp[i] - Qf]
                    ob[oslot, i, 0:1, :] = (
                        wsum * cfg.t_bottom - ob[oslot, cfg.opp[i], 0:1, :])

            @pl.when(jnp.logical_and(t == n_ty - 1, ft == 1))
            def _top():
                for i in f_in_top:
                    ob[oslot, i, Ty - 1:Ty, :] = \
                        fsl[cur, cfg.opp[i], Ty - 1:Ty, :]
                for i in g_in_top:
                    wsum = cfg.w_g[i - Qf] + cfg.w_g[cfg.opp[i] - Qf]
                    ob[oslot, i, Ty - 1:Ty, :] = (
                        wsum * cfg.t_top
                        - ob[oslot, cfg.opp[i], Ty - 1:Ty, :])

            out_dma(t).start()
            return carry

        lax.fori_loop(0, n_ty, loop, 0, unroll=False)
        if n_ty >= 2:
            out_dma(n_ty - 2).wait()
        out_dma(n_ty - 1).wait()

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # flags (4,) int32
        pl.BlockSpec(memory_space=pl.ANY),      # s (HBM)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rb (Qs, 1, Wx)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rt
    ]
    scratch = [
        pltpu.VMEM((4, Qs, Ty, Wx), jnp.float32),
        pltpu.VMEM((2, Qs, Ty, Wx), jnp.float32),
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if x_halo:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # rl (Qs, nyl, Hx)
                     pl.BlockSpec(memory_space=pl.ANY)]   # rr
        scratch.append(pltpu.SemaphoreType.DMA((2, 4)))   # x-halo pieces
    call = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Qs, nyl, nxl), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )

    def step(s, rb, rt, flags, rl=None, rr=None):
        if not x_halo:
            return call(flags, s, rb, rt)
        if rl is None or rr is None:
            raise ValueError("x-sharded thermal kernel needs rl/rr ring "
                             "columns")
        return call(flags, s, rb, rt, rl, rr)

    step.tile_height = Ty
    step.n_ty = n_ty
    step.pad_x = int(pad_x)
    step.pad_vals = pad_vals
    step.x_halo = x_halo
    step.halo_width = Hx
    return step

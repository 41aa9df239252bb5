"""Fused collide-stream Pallas TPU kernels — the production hot path.

Two kernels share one slab-pipeline skeleton:

  * 1-step kernel: per Ty-row slab — HBM→VMEM DMA (4-slot ring, prefetched) →
    BGK collide once per slab, in place → pull-streaming (y via cross-slab
    row selects, x via lane rolls, frozen-ghost sanitize at physical x
    edges) → BC strips → async out DMA. Exactly one HBM read and one HBM
    write of f per step — the budget from BASELINE.md (~72 B/cell/step f32).

  * 2-step kernel (temporal blocking): advances TWO timesteps per HBM round
    trip. Stage A collides+streams raw slabs into an intermediate ring of
    B-collided slabs; stage B streams those into the output. Needs depth-2
    halo rows. Halves HBM traffic — the lever when the slab DMA pattern is
    bandwidth-bound (measured ~266 GB/s on multi-million-cell grids).

This is the TPU answer to the reference's separate OpenMP passes (collision
LBMSolver.h:84-126, streaming LBMSolver.h:128-145, BC sweep
LBMSolver.h:147-265). The AVX2 equilibrium kernels (LBMUtils.h:22-65)
become plain vector expressions on the 8×128 VPU.

Layout and constraints (Mosaic DMA tiling rules measured on v5e):
  * f is SoA (Q, nyl, nxl) f32, x = 128-lane minor dim. On real TPUs nxl
    must be a multiple of 128 and the slab height a multiple of 8 (interpret
    mode for CPU tests has no such limits).
  * y-halo ("ring") rows arrive as separate (Q, depth, nxl) inputs, produced
    by parallel/halo.ring_rows (ppermute over the 'y' mesh axis; frozen
    ghost equilibrium at physical edges). The kernels collide them locally.
  * The full-width kernels in THIS file assume mesh_x == 1 (x pulls wrap
    via lane roll; at non-periodic global x edges the wrapped lanes are
    overwritten with the frozen ghost equilibrium, reproducing the
    reference's never-updated edge ghosts (LBMGrid.h:185-213) exactly —
    including the corner-cell Zou-He interaction chain). x-sharded meshes
    take the x-tiled kernels (step_pallas_tiled.py), which share this
    file's collide/BC building blocks.

D2Q9 / f32 / 2-D. The jax backend covers f64 and is the 3-D oracle; 3-D
pallas kernels live in step_pallas3d.py.
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

# VMEM budget for slab/output/mask buffers (bytes); v5e has ~16 MiB total.
# TPULBM_VMEM_MB overrides for experiments on parts with more VMEM.
_VMEM_BUDGET = int(float(os.environ.get("TPULBM_VMEM_MB", "13"))
                   * 1024 * 1024)


@dataclasses.dataclass(frozen=True)
class _Cfg:
    """Static kernel configuration shared by both kernels."""
    Q: int
    c: tuple            # ((cx, cy), ...) python ints
    w: tuple            # weights, python floats
    opp: tuple
    inv_tau: float
    omega_minus: float | None  # TRT odd-moment rate; None → BGK
    mrt_uv: tuple | None       # MRT rank-r correction (U rows, V rows); None → BGK/TRT
    reg: bool                  # regularized BGK (Hermite-shell projection)
    smag: float                # Smagorinsky Cs; 0 → plain BGK
    plaw: tuple | None         # power-law (k, n); None → Newtonian
    u_in: float
    eq_in: tuple        # frozen ghost equilibrium per direction
    src: tuple | None   # body-force source term per direction
    has_solid: bool
    bounce_back: bool
    guard_bcs: bool     # solid cells touch a BC region → strips need the mask
    slab_skip: bool     # obstacle handling may be skipped on solid-free slabs
    walls_y: bool
    walls_x: bool       # side walls at the x edges (cavity)
    lid_u: float        # moving-lid speed at the top wall (cavity; 0 → plain wall)
    clean_corners: bool
    inlet_zou_he: bool
    outlet_zou_he: bool
    periodic_x: bool
    Ty: int
    nxl: int            # slab buffer width (== local nx for full-width kernels)
    n_ty: int
    # Buffer-column positions of the physical x-edge cells. Full-width
    # kernels put them at the buffer edges; the x-tiled kernel
    # (step_pallas_tiled.py) centers the owned columns between halo regions.
    xl_col: int = 0
    xr_col: int = -1    # resolved to nxl-1 in _build_cfg
    # Dead lane-padding columns after xr_col (full-width kernels on grids
    # whose nx is not a multiple of 128): pinned to the frozen ghost
    # equilibrium every substep so they never form NaNs and never leak into
    # owned columns (the xr edge sanitize already zeroes every westward
    # pull, exactly as at a physical domain edge).
    pad_x: int = 0
    # Spatially varying body force (problem.force_fn, e.g. Kolmogorov
    # F_x(y) = F0·cos(κy)): evaluated IN-KERNEL from global coordinates
    # rebuilt with broadcasted_iota + the shard's y offset (flags[4]), so
    # no force field ever occupies HBM or rides the halo exchange. The
    # blocked (N-step) kernels thread each collide site's global-y origin
    # too — ghost-chain rows sit at the analytic unwrapped offsets
    # (-N..-1 / nyl..nyl+N-1), which periodic force_fns wrap exactly, so
    # temporal blocking reproduces the jax tier bit-for-bit in f32.
    force_fn: object = None
    nx_g: int = 0       # global extents for the force coords dict
    ny_g: int = 0
    # KBC entropic operator (physics.kbc_coeffs): per-population
    # coefficient vectors (sP, sN, hT, hqx, hqy, hA) for the deviation
    # parts; None → not KBC
    kbc: tuple | None = None
    # Bouzidi curved-wall obstacle BC (ops/bouzidi.py): the per-link q
    # table rides as an extra HBM input DMA'd per slab next to the solid
    # mask (bz_planes = Q, or 2Q when the wall moves and the momentum
    # scalars are stacked under q). The cut-link rewrite is a pointwise
    # select against the post-stream slab and the pre-stream post-
    # collision slab — both resident in VMEM at BC time — so the fused
    # kernel needs no gathers (the jax tier's apply_bouzidi, fused).
    # bz_active: static per-direction any-cut-link flags (global mask).
    bz: bool = False
    bz_planes: int = 0
    bz_active: tuple | None = None


def _collide_rows(cfg: _Cfg, fw, solid_rows, y0=None, x0=None):
    """BGK relax a list of Q same-shape row blocks (LBMSolver.h:101-123),
    then add the spatially varying force source if the problem has one.
    Pointwise, so safe on halo rows. `y0`: global y of the block's first
    row (traced scalar; required iff cfg.force_fn is set — matches the jax
    tier's unwrapped halo coords, step_jax.make_local_step_padded).
    `x0`: global x of the block's first column (x-tiled kernels, where
    buffer columns are tile-relative; full-width kernels leave it None —
    buffer column == global x there)."""
    out = _collide_rows_core(cfg, fw, solid_rows)
    if cfg.force_fn is None:
        return out
    rows, nxl = fw[0].shape[-2], fw[0].shape[-1]
    # int32 iota cast to f32: Mosaic-on-silicon rejects a float tpu.iota
    # ("result must be vector of integer or index values" — found by the
    # round-4 on-TPU probe ladder; interpret mode accepted it silently)
    yy = (jnp.asarray(y0, jnp.float32)
          + lax.broadcasted_iota(jnp.int32, (rows, nxl), 0
                                 ).astype(jnp.float32))
    xx = lax.broadcasted_iota(jnp.int32, (rows, nxl), 1).astype(jnp.float32)
    if x0 is not None:
        xx = jnp.asarray(x0, jnp.float32) + xx
    comps = tuple(cfg.force_fn({"xx": xx, "yy": yy,
                                "nx": cfg.nx_g, "ny": cfg.ny_g}))

    def live(comp):
        return not (isinstance(comp, (int, float)) and comp == 0.0)

    # S_i = 3 w_i (c_i · F(x)) post-relaxation, every cell incl. solids —
    # exactly the jax tier's _add_force_field (step_jax.py)
    for i in range(cfg.Q):
        tot = None
        for cc, comp in zip(cfg.c[i], comps):
            if cc and live(comp):
                t = cc * comp
                tot = t if tot is None else tot + t
        if tot is not None:
            out[i] = out[i] + (3.0 * cfg.w[i]) * tot
    return out


def _collide_rows_core(cfg: _Cfg, fw, solid_rows):
    """BGK relax a list of Q same-shape row blocks (LBMSolver.h:101-123).
    D2Q9 moment sums unrolled; pointwise, so safe on halo rows."""
    rho = fw[0]
    for i in range(1, cfg.Q):
        rho = rho + fw[i]
    mx = fw[1] - fw[3] + fw[5] - fw[6] - fw[7] + fw[8]
    my = fw[2] - fw[4] + fw[5] + fw[6] - fw[7] - fw[8]
    inv_rho = 1.0 / rho
    ux = mx * inv_rho
    uy = my * inv_rho
    base = 1.0 - 1.5 * (ux * ux + uy * uy)
    out = []
    if cfg.omega_minus is not None:
        # TRT (physics.collide_trt): even/odd deviations with closed-form
        # equilibrium parts: feq_i ± feq_opp = 2 w rho (base + 4.5cu²) / 6 w rho cu
        hp = 0.5 * cfg.inv_tau
        hm = 0.5 * cfg.omega_minus
        for i in range(cfg.Q):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            wr = cfg.w[i] * rho
            f_o = fw[cfg.opp[i]]
            if cx or cy:
                even_dev = (fw[i] + f_o) - 2.0 * wr * (base + 4.5 * cu * cu)
                odd_dev = (fw[i] - f_o) - 6.0 * wr * cu
                fp = fw[i] - hp * even_dev - hm * odd_dev
            else:
                fp = fw[i] - cfg.inv_tau * (fw[i] - wr * base)
            if cfg.src is not None and cfg.src[i]:
                fp = fp + cfg.src[i]
            if cfg.bounce_back:
                fp = jnp.where(solid_rows, fw[i], fp)
            out.append(fp)
        return out
    if cfg.mrt_uv is not None:
        # MRT in rank-r form (physics.mrt_rank_correction):
        #   f_post = f − s_nu·dev − Σ_k U[:,k] (V[k]·dev),  dev = f − feq.
        # The dense f − M⁻¹SM·dev keeps ~2Q row blocks live and overflowed
        # Mosaic's 16 MB scoped-vmem stack on padded x-tiled configs; this
        # form carries only r running inner-product blocks (r = 2 for the
        # D2Q9 default rates) and ~2rQ + Q multiply-adds instead of Q².
        U, V = cfg.mrt_uv
        r = len(V)
        devs = []
        for i in range(cfg.Q):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = cfg.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = cfg.w[i] * rho * base
            devs.append(fw[i] - feq)
        t = [None] * r
        for j in range(cfg.Q):
            for k in range(r):
                vkj = V[k][j]
                if vkj == 0.0:
                    continue
                term = devs[j] if vkj == 1.0 else vkj * devs[j]
                t[k] = term if t[k] is None else t[k] + term
        for i in range(cfg.Q):
            fp = fw[i] - cfg.inv_tau * devs[i]
            for k in range(r):
                uik = U[i][k]
                if uik == 0.0 or t[k] is None:
                    continue
                fp = fp - uik * t[k]
            if cfg.src is not None and cfg.src[i]:
                fp = fp + cfg.src[i]
            if cfg.bounce_back:
                fp = jnp.where(solid_rows, fw[i], fp)
            out.append(fp)
        return out
    if cfg.kbc is not None:
        # KBC entropic multi-relaxation (physics.collide_kbc): shear part
        # (ΔΠ_xy, ΔN) relaxes at 2β = 1/τ, the higher moments (ΔT, Δq,
        # ΔA) at the per-cell entropic rate βγ with γ from the closed-
        # form entropy estimate. Moment deltas from the same devs/Π sums
        # as the LES/reg branches; two entropic inner products (÷feq)
        # accumulate across the 9 planes.
        sP, sN, hT, hqx, hqy, hA = cfg.kbc
        devs, feqs = [], []
        for i in range(cfg.Q):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = cfg.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = cfg.w[i] * rho * base
            feqs.append(feq)
            devs.append(fw[i] - feq)
        pxx = devs[1] + devs[3] + devs[5] + devs[6] + devs[7] + devs[8]
        pyy = devs[2] + devs[4] + devs[5] + devs[6] + devs[7] + devs[8]
        pxy = devs[5] - devs[6] + devs[7] - devs[8]
        dN = pxx - pyy
        dT = pxx + pyy
        dqx = devs[5] - devs[6] - devs[7] + devs[8]   # Σ c_x c_y² dev
        dqy = devs[5] + devs[6] - devs[7] - devs[8]   # Σ c_x² c_y dev
        dA = devs[5] + devs[6] + devs[7] + devs[8]    # Σ c_x² c_y² dev

        def comb(coeffs, parts):
            tot = None
            for cc, part in zip(coeffs, parts):
                if cc == 0.0:
                    continue
                t = part if cc == 1.0 else cc * part
                tot = t if tot is None else tot + t
            return tot if tot is not None else 0.0

        ds = [comb((sP[i], sN[i]), (pxy, dN)) for i in range(cfg.Q)]
        dh = [comb((hT[i], hqx[i], hqy[i], hA[i]), (dT, dqx, dqy, dA))
              for i in range(cfg.Q)]
        sh = None
        hh = None
        for i in range(cfg.Q):
            ife = 1.0 / feqs[i]
            t1 = ds[i] * dh[i] * ife
            t2 = dh[i] * dh[i] * ife
            sh = t1 if sh is None else sh + t1
            hh = t2 if hh is None else hh + t2
        beta = 0.5 * cfg.inv_tau
        # Tikhonov-regularized estimate, λ matching physics.collide_kbc
        # (f32): the raw sh/hh ratio amplifies rounding noise by O(ds/dh)
        # when dh is noise — see the analysis there
        gamma = (1.0 / beta) - (2.0 - 1.0 / beta) * sh / (hh + 1e-10)
        bg = beta * gamma
        for i in range(cfg.Q):
            fp = fw[i] - (2.0 * beta) * ds[i] - bg * dh[i]
            if cfg.src is not None and cfg.src[i]:
                fp = fp + cfg.src[i]
            if cfg.bounce_back:
                fp = jnp.where(solid_rows, fw[i], fp)
            out.append(fp)
        return out
    if cfg.reg:
        # regularized BGK (physics.collide_regularized): the non-equilibrium
        # part is replaced by its second-Hermite-shell projection
        # (9/2) w_i Q_i:Π before relaxing — same Π_ab machinery as the LES
        # branch, ghost modes discarded instead of relaxed
        devs = []
        for i in range(cfg.Q):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = cfg.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = cfg.w[i] * rho * base
            devs.append(fw[i] - feq)
        pxx = devs[1] + devs[3] + devs[5] + devs[6] + devs[7] + devs[8]
        pyy = devs[2] + devs[4] + devs[5] + devs[6] + devs[7] + devs[8]
        pxy = devs[5] - devs[6] + devs[7] - devs[8]
        keep = 1.0 - cfg.inv_tau
        for i in range(cfg.Q):
            cx, cy = cfg.c[i]
            a = 4.5 * cfg.w[i] * (cx * cx - 1.0 / 3.0)
            b = 4.5 * cfg.w[i] * (cy * cy - 1.0 / 3.0)
            g = 9.0 * cfg.w[i] * cx * cy
            proj = a * pxx + b * pyy
            if g:
                proj = proj + g * pxy
            fp = (fw[i] - devs[i]) + keep * proj
            if cfg.src is not None and cfg.src[i]:
                fp = fp + cfg.src[i]
            if cfg.bounce_back:
                fp = jnp.where(solid_rows, fw[i], fp)
            out.append(fp)
        return out
    if cfg.plaw is not None:
        # BGK + power-law rheology (physics.power_law_inv_tau): per-cell
        # tau_eff solves tau = 1/2 + 3k γ̇(tau)^(n-1) by the shared
        # log-space Newton solver (physics.power_law_inv_tau_from_gfac)
        # on the same non-equilibrium stress norm Q̄ the LES branch uses.
        from .. import physics as _ph
        devs = []
        for i in range(cfg.Q):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = cfg.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = cfg.w[i] * rho * base
            devs.append(fw[i] - feq)
        pxx = devs[1] + devs[3] + devs[5] + devs[6] + devs[7] + devs[8]
        pyy = devs[2] + devs[4] + devs[5] + devs[6] + devs[7] + devs[8]
        pxy = devs[5] - devs[6] + devs[7] - devs[8]
        # accumulation order (xx, xy, yy) matches physics.power_law_inv_tau
        qbar = jnp.sqrt(2.0 * (pxx * pxx + 2.0 * (pxy * pxy) + pyy * pyy))
        k, n = cfg.plaw
        inv_t = _ph.power_law_inv_tau_from_gfac(1.5 * qbar * inv_rho, k, n)
        for i in range(cfg.Q):
            fp = fw[i] - inv_t * devs[i]
            if cfg.src is not None and cfg.src[i]:
                fp = fp + cfg.src[i]
            if cfg.bounce_back:
                fp = jnp.where(solid_rows, fw[i], fp)
            out.append(fp)
        return out
    if cfg.smag:
        # BGK + Smagorinsky LES (physics.smagorinsky_inv_tau): per-cell
        # tau_eff = (tau0 + sqrt(tau0² + 18 Cs² Q̄ / rho)) / 2 from the
        # non-equilibrium momentum flux Pi_ab = Σ_i c_ia c_ib dev_i,
        # Q̄ = sqrt(2 ΣPi²) — D2Q9 index sets unrolled like mx/my above.
        devs = []
        for i in range(cfg.Q):
            cx, cy = cfg.c[i]
            cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
            if cx or cy:
                feq = cfg.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
            else:
                feq = cfg.w[i] * rho * base
            devs.append(fw[i] - feq)
        pxx = devs[1] + devs[3] + devs[5] + devs[6] + devs[7] + devs[8]
        pyy = devs[2] + devs[4] + devs[5] + devs[6] + devs[7] + devs[8]
        pxy = devs[5] - devs[6] + devs[7] - devs[8]
        qbar = jnp.sqrt(2.0 * (pxx * pxx + pyy * pyy + 2.0 * (pxy * pxy)))
        tau0 = 1.0 / cfg.inv_tau
        inv_t = 2.0 / (tau0 + jnp.sqrt(
            tau0 * tau0 + (18.0 * cfg.smag * cfg.smag) * qbar * inv_rho))
        for i in range(cfg.Q):
            fp = fw[i] - inv_t * devs[i]
            if cfg.src is not None and cfg.src[i]:
                fp = fp + cfg.src[i]
            if cfg.bounce_back:
                fp = jnp.where(solid_rows, fw[i], fp)
            out.append(fp)
        return out
    # NOTE: a ±pair evaluation of feq (sharing cu²/base work per direction
    # pair, like the TRT branch) was measured perf-neutral on hardware —
    # the kernels are DMA/scheduling-bound, not feq-flop-bound — while its
    # different rounding broke the tight pallas==jax equivalence gates.
    # Keep the reference's direct form.
    for i in range(cfg.Q):
        cx, cy = cfg.c[i]
        cu = (cx * ux if cx else 0.0) + (cy * uy if cy else 0.0)
        if cx or cy:
            feq = cfg.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu)
        else:
            feq = cfg.w[i] * rho * base
        fp = fw[i] - cfg.inv_tau * (fw[i] - feq)
        if cfg.src is not None and cfg.src[i]:
            fp = fp + cfg.src[i]
        if cfg.bounce_back:
            fp = jnp.where(solid_rows, fw[i], fp)  # collision skips solids
        out.append(fp)
    return out


def _stream_rows(cfg: _Cfg, i: int, cur, below_row, above_row):
    """Pull-stream one population of one slab: y via row selects, x via lane
    roll. cur: (Ty, nxl); below/above_row: (1, nxl) post-collision neighbor
    rows (slab or ring). Returns the streamed (Ty, nxl) block."""
    cx, cy = cfg.c[i]
    Ty = cfg.Ty
    if cy == 0:
        rows = cur
    elif cy > 0:  # pull from the row below
        rows = jnp.concatenate([below_row, cur[0:Ty - 1, :]], axis=0)
    else:         # pull from the row above
        rows = jnp.concatenate([cur[1:Ty, :], above_row], axis=0)
    if cx:
        rows = pltpu.roll(rows, cx % cfg.nxl, axis=1)
    return rows


def _apply_bcs(cfg: _Cfg, ref, slot, msl, mslot, is_bottom, is_top, fl, fr,
               mask_rows=None, solid_flag=None, bz=None):
    """Apply ghost sanitize + walls + Zou-He inlet/outlet + obstacle strips
    in reference order (LBMSolver.h:150-263) on slab `ref[slot]`.

    is_bottom/is_top: traced bools — does this slab contain the global
    bottom/top row. Solid mask comes from msl[mslot] (or `mask_rows`, a
    direct (Ty, nxl)-shaped value, when msl is None).

    bz (cfg.bz only): (q_rows, f_post_rows) for this slab — q_rows a
    (bz_planes, Ty, nxl)-indexable (the slab of the link table), f_post_rows
    a per-population indexable of the PRE-stream post-collision slab (the
    collided f slab, still resident in VMEM). The Bouzidi cut-link rewrite
    runs in place of the voxel obstacle strip, matching the jax tier's
    apply_all order (ops/boundaries.py: bouzidi after every edge BC, then
    rest-equilibrium pin on the solid interior).
    """
    Q, Ty, nxl = cfg.Q, cfg.Ty, cfg.nxl
    xl, xr = cfg.xl_col, cfg.xr_col
    opp, w, eq_in, u_in = cfg.opp, cfg.w, cfg.eq_in, cfg.u_in

    def mrow(rs, re, cs=None, ce=None):
        m = msl[mslot, rs:re, :] if mask_rows is None else mask_rows[rs:re, :]
        if cs is not None:
            m = m[:, cs:ce]
        return m

    # Edge-column BC fusion: every strip that touches the physical x-edge
    # COLUMNS (ghost sanitize, corner ghost pulls, cavity side walls +
    # corners, Zou-He inlet/outlet, clean corners) is accumulated
    # value-level in cL/cR below and committed with ONE whole-Q (Q, Ty, 1)
    # store per edge — the 2-D analog of the 3-D kernels' whole-Q strip
    # stores (per-population (Ty, 1) stores are sublane-strided 1-lane
    # writes, ~12 of them per edge slab per substep before this fusion).
    # Wall ROW stores stay as (1, nxl) row stores, but their reads are
    # patched with the PENDING sanitize values at the edge columns
    # (_san_row) so the sequencing matches the reference BC order
    # (LBMSolver.h:150-263) exactly.
    colx_fused = not cfg.periodic_x
    if colx_fused:
        rowi = lax.broadcasted_iota(jnp.int32, (Ty, 1), 0)
        onL = (rowi >= 0) & (fl == 1)
        onR = (rowi >= 0) & (fr == 1)
        bot_m = (rowi == 0) & is_bottom
        top_m = (rowi == Ty - 1) & is_top
        colL = ref[slot, :, :, xl:xl + 1]
        colR = ref[slot, :, :, xr:xr + 1]
        cL = [colL[i] for i in range(Q)]
        cR = [colR[i] for i in range(Q)]
        mcL = mrow(0, Ty, xl, xl + 1) if cfg.guard_bcs else None
        mcR = mrow(0, Ty, xr, xr + 1) if cfg.guard_bcs else None

        # Ghost sanitize at physical x edges. The reference's E/W ghost
        # columns are ZERO every step (unpack_ghost_cells copies
        # never-received, zero-initialized recv buffers unconditionally,
        # LBMGrid.h:448-466, verified against the compiled reference); only
        # the four corner ghosts keep the frozen initial equilibrium (no
        # unpack touches them) — the diagonal population whose source is a
        # corner ghost reads that equilibrium instead of zero.
        for i in range(Q):
            cx, cy = cfg.c[i]
            if cx == 0:
                continue
            v = jnp.zeros((Ty, 1), jnp.float32)
            if cy > 0:
                v = jnp.where(bot_m, jnp.float32(eq_in[i]), v)
            elif cy < 0:
                v = jnp.where(top_m, jnp.float32(eq_in[i]), v)
            if cx > 0:
                cL[i] = jnp.where(onL, v, cL[i])
            else:
                cR[i] = jnp.where(onR, v, cR[i])

    colx = lax.broadcasted_iota(jnp.int32, (1, nxl), 1)

    def _san_row(v, i, top):
        """Patch a (1, nxl) row read of population i with the PENDING
        (not yet stored) x-edge sanitize value at the physical edge
        columns: the frozen corner-ghost equilibrium where the corner
        pull applies at this wall row, zero otherwise."""
        if not colx_fused:
            return v
        cx, cy = cfg.c[i]
        if cx == 0:
            return v
        corner = (cy < 0) if top else (cy > 0)
        const = eq_in[i] if corner else 0.0
        xc = xl if cx > 0 else xr
        fe = fl if cx > 0 else fr
        return jnp.where((colx == xc) & (fe == 1), jnp.float32(const), v)

    # walls (LBMSolver.h:153-176)
    if cfg.walls_y:
        @pl.when(is_bottom)
        def _bottom():
            for i in (2, 5, 6):  # f2<-f4, f5<-f7, f6<-f8
                val = _san_row(ref[slot, opp[i], 0:1, :], opp[i], top=False)
                if cfg.guard_bcs:
                    old = _san_row(ref[slot, i, 0:1, :], i, top=False)
                    val = jnp.where(mrow(0, 1) < 0.5, val, old)
                ref[slot, i, 0:1, :] = val

        @pl.when(is_top)
        def _top():
            if cfg.lid_u:
                # moving lid (cavity): momentum-corrected reflection
                # f_i <- f_opp + 6 w_i rho_w (c_i . u_lid), c_s^2 = 1/3
                # (ops/boundaries.apply_moving_wall). rho_w from KNOWN
                # populations only (cy >= 0 at the top row — the cy < 0
                # ones hold ghost constants here); f4's correction is 0.
                rho_w = None
                for i in range(Q):
                    cy = cfg.c[i][1]
                    if cy < 0:
                        continue
                    term = _san_row(ref[slot, i, Ty - 1:Ty, :], i, top=True)
                    if cy > 0:
                        term = 2.0 * term
                    rho_w = term if rho_w is None else rho_w + term
            for i in (4, 7, 8):  # f4<-f2, f7<-f5, f8<-f6
                val = _san_row(ref[slot, opp[i], Ty - 1:Ty, :], opp[i],
                               top=True)
                if cfg.lid_u:
                    cu = cfg.c[i][0] * cfg.lid_u
                    if cu:
                        val = val + (6.0 * w[i] * cu) * rho_w
                if cfg.guard_bcs:
                    old = _san_row(ref[slot, i, Ty - 1:Ty, :], i, top=True)
                    val = jnp.where(mrow(Ty - 1, Ty) < 0.5, val, old)
                ref[slot, i, Ty - 1:Ty, :] = val

        # fold the wall-row effect at the edge columns into the pending
        # column state (the row stores above already wrote these cells;
        # the final column store must carry the same values)
        if colx_fused:
            for c_, mc in ((cL, mcL), (cR, mcR)):
                s_ = list(c_)
                for i in (2, 5, 6):
                    v = s_[opp[i]]
                    if cfg.guard_bcs:
                        v = jnp.where(mc < 0.5, v, s_[i])
                    c_[i] = jnp.where(bot_m, v, c_[i])
                if cfg.lid_u:
                    rho_w = None
                    for i in range(Q):
                        cy = cfg.c[i][1]
                        if cy < 0:
                            continue
                        term = 2.0 * s_[i] if cy > 0 else s_[i]
                        rho_w = term if rho_w is None else rho_w + term
                for i in (4, 7, 8):
                    v = s_[opp[i]]
                    if cfg.lid_u:
                        cu = cfg.c[i][0] * cfg.lid_u
                        if cu:
                            v = v + (6.0 * w[i] * cu) * rho_w
                    if cfg.guard_bcs:
                        v = jnp.where(mc < 0.5, v, s_[i])
                    c_[i] = jnp.where(top_m, v, c_[i])

    # side walls at the physical x edges (cavity;
    # ops/boundaries.apply_walls with axis_component=0) — bounce-back on
    # the xl/xr columns, after the y-walls exactly like apply_all's order
    if cfg.walls_x:
        sL, sR = list(cL), list(cR)
        for i in (1, 5, 8):  # cx > 0: inward at x = xl
            val = sL[opp[i]]
            if cfg.guard_bcs:
                val = jnp.where(mcL < 0.5, val, sL[i])
            cL[i] = jnp.where(onL, val, cL[i])
        for i in (3, 6, 7):  # cx < 0: inward at x = xr
            val = sR[opp[i]]
            if cfg.guard_bcs:
                val = jnp.where(mcR < 0.5, val, sR[i])
            cR[i] = jnp.where(onR, val, cR[i])

        # wall∩wall corner closure (ops/boundaries.apply_cavity_corners):
        # the edge-diagonal pair is mutually unknown — bounce the three
        # known-opposite unknowns, split the density residual against the
        # diagonally-inward neighbor's rho* (mass-conserving; the plain
        # reflections above would integrate the zeroed-ghost leak).
        # rho* comes from the INTERIOR neighbor column (ncol = xl+1/xr-1),
        # untouched by the pending column state, so it reads ref directly.
        def _cav_corner(c_, mc, gate_m, row, nrow, ncol, assigns, pair):
            vals = [c_[i][row:row + 1] for i in range(Q)]
            rho_star = sum(ref[slot, i, nrow:nrow + 1, ncol:ncol + 1]
                           for i in range(Q))
            resid = (0.5 * (rho_star - vals[0])
                     - sum(vals[src] for _, src in assigns))
            new = {dst: vals[src] for dst, src in assigns}
            for i in pair:
                new[i] = resid
            if cfg.has_solid and cfg.guard_bcs:
                fluid = mc[row:row + 1] < 0.5
                for i in new:
                    new[i] = jnp.where(fluid, new[i], vals[i])
            for i, v in new.items():
                c_[i] = jnp.where(gate_m, v, c_[i])

        _cav_corner(cL, mcL, bot_m & onL, 0, 1, xl + 1,
                    [(1, 3), (2, 4), (5, 7)], (6, 8))
        _cav_corner(cR, mcR, bot_m & onR, 0, 1, xr - 1,
                    [(3, 1), (2, 4), (6, 8)], (5, 7))
        _cav_corner(cL, mcL, top_m & onL, Ty - 1, Ty - 2, xl + 1,
                    [(1, 3), (4, 2), (8, 6)], (5, 7))
        _cav_corner(cR, mcR, top_m & onR, Ty - 1, Ty - 2, xr - 1,
                    [(3, 1), (4, 2), (7, 5)], (6, 8))

    # Zou-He inlet, physical column xl (LBMSolver.h:179-207)
    if cfg.inlet_zou_he:
        pr = list(cL)
        rho_bc = (pr[0] + pr[2] + pr[4]
                  + 2.0 * (pr[3] + pr[6] + pr[7])) / (1.0 - u_in)
        ru = rho_bc * u_in
        ht = 0.5 * (pr[2] - pr[4])
        new = {1: pr[3] + (2.0 / 3.0) * ru,
               5: pr[7] - ht + (1.0 / 6.0) * ru,
               8: pr[6] + ht + (1.0 / 6.0) * ru}
        for i, val in new.items():
            if cfg.guard_bcs:
                val = jnp.where(mcL < 0.5, val, pr[i])
            cL[i] = jnp.where(onL, val, cL[i])

    # Zou-He pressure outlet, physical column xr (LBMSolver.h:210-236)
    if cfg.outlet_zou_he:
        pr = list(cR)
        u_out = -1.0 + (pr[0] + pr[2] + pr[4]
                        + 2.0 * (pr[1] + pr[5] + pr[8]))  # rho_out = 1
        ht = 0.5 * (pr[2] - pr[4])
        new = {3: pr[1] - (2.0 / 3.0) * u_out,
               6: pr[8] - ht - (1.0 / 6.0) * u_out,
               7: pr[5] + ht - (1.0 / 6.0) * u_out}
        for i, val in new.items():
            if cfg.guard_bcs:
                val = jnp.where(mcR < 0.5, val, pr[i])
            cR[i] = jnp.where(onR, val, cR[i])

    # Optional Zou & He (1997) corner closure at the 4 wall∩inlet/outlet
    # cells (semantics: ops/boundaries.apply_zou_he_corners) — only on the
    # slab owning the physical wall row of a physical-x-edge shard.
    # rho* for the inlet corners is the adjacent inlet-column node's
    # density — SAME column, so it reads the pending post-Zou-He state.
    if cfg.clean_corners:
        def _corner(c_, mc, gate_m, row, nrow, assigns, pair,
                    use_neighbor_rho):
            vals = [c_[i][row:row + 1] for i in range(Q)]
            if use_neighbor_rho:   # adjacent inlet-column node's density
                rho_star = sum(c_[i][nrow:nrow + 1] for i in range(Q))
            else:                  # outlet corners: fixed rho_out = 1
                rho_star = jnp.full((1, 1), 1.0, jnp.float32)
            resid = (0.5 * (rho_star - vals[0])
                     - sum(vals[src] for _, src in assigns))
            new = {dst: vals[src] for dst, src in assigns}
            for i in pair:
                new[i] = resid
            if cfg.has_solid and cfg.guard_bcs:  # solid corner: leave as-is
                fluid = mc[row:row + 1] < 0.5
                for i in new:
                    new[i] = jnp.where(fluid, new[i], vals[i])
            for i, v in new.items():
                c_[i] = jnp.where(gate_m, v, c_[i])

        _corner(cL, mcL, bot_m & onL, 0, 1,
                [(1, 3), (2, 4), (5, 7)], (6, 8), True)
        _corner(cR, mcR, bot_m & onR, 0, 1,
                [(3, 1), (2, 4), (6, 8)], (5, 7), False)
        _corner(cL, mcL, top_m & onL, Ty - 1, Ty - 2,
                [(1, 3), (4, 2), (8, 6)], (5, 7), True)
        _corner(cR, mcR, top_m & onR, Ty - 1, Ty - 2,
                [(3, 1), (4, 2), (7, 5)], (6, 8), False)

    # Commit the fused edge columns: ONE whole-Q store per physical edge
    if colx_fused:
        @pl.when(fl == 1)
        def _store_left():
            ref[slot, :, :, xl:xl + 1] = jnp.concatenate(
                [v[None] for v in cL], axis=0)

        @pl.when(fr == 1)
        def _store_right():
            ref[slot, :, :, xr:xr + 1] = jnp.concatenate(
                [v[None] for v in cR], axis=0)

    # obstacle (semantics: ops/boundaries.apply_obstacle); skipped entirely
    # on slabs the (static) solid mask does not touch
    if cfg.has_solid:
        def _obstacle():
            solid_c = mrow(0, Ty) > 0.5
            if cfg.bz:
                # Bouzidi cut-link rewrite (ops/bouzidi.apply_bouzidi,
                # fused): per direction j a pointwise select between the
                # q<1/2 interpolation (post-collision f̂_i here + the post-
                # STREAM plane i = f̂_i one cell upwind) and the q≥1/2 one
                # (f̂_i, f̂_j here), then rest-eq pin on the solid interior
                q_rows, fpost = bz   # callables: plane index -> (Ty, nxl)
                vals = _bz_rewrite(cfg, [ref[slot, i] for i in range(Q)],
                                   q_rows, fpost)
                for j in range(Q):
                    if vals[j] is not None:
                        ref[slot, j] = vals[j]
                for i in range(Q):
                    ref[slot, i] = jnp.where(solid_c, w[i], ref[slot, i])
            elif cfg.bounce_back:
                snap = [ref[slot, i] for i in range(Q)]
                for i in range(Q):
                    ref[slot, i] = jnp.where(solid_c, snap[opp[i]],
                                             ref[slot, i])
            else:  # reference-parity equilibrium wall: pin to w_i
                for i in range(Q):
                    ref[slot, i] = jnp.where(solid_c, w[i], ref[slot, i])
        if solid_flag is None:
            _obstacle()
        else:
            pl.when(solid_flag)(_obstacle)

    # dead lane-padding columns (the pad_x columns after xr_col): re-pin to
    # the frozen equilibrium (a BGK fixed point) so the next substep's
    # collide of this slab stays finite. Gated on fr: only the shard/tile
    # owning the physical east edge has DEAD pad columns — on x-sharded
    # meshes interior shards' pad columns are live shadow copies of the
    # east neighbor's first columns (see parallel/halo.ring_cols_padded)
    # and must keep streaming normally. Full-width kernels always run with
    # fr == 1, so this is the same unconditional pin they had. Under
    # periodic_x there is no dead column anywhere — the "east-edge" shard's
    # pad shadows the wrap neighbor (padded periodic grids always take the
    # x-tiled kernel; the full-width lane roll would wrap through the pad).
    if cfg.pad_x and not cfg.periodic_x:
        @pl.when(fr == 1)
        def _pin_pad():
            for i in range(Q):
                ref[slot, i, :, xr + 1:xr + 1 + cfg.pad_x] = jnp.full(
                    (Ty, cfg.pad_x), eq_in[i], jnp.float32)


def _bz_rewrite(cfg: _Cfg, snap, q_rows, fpost):
    """The Bouzidi cut-link select (ops/bouzidi.apply_bouzidi, fused):
    returns per-direction replacement values (None where the direction is
    statically link-free). snap: the post-stream (post-edge-BC) plane
    values; q_rows/fpost: callables plane-index -> value block of the link
    table / the post-collision pre-stream state at the same cells."""
    Q, opp = cfg.Q, cfg.opp
    out = [None] * Q
    for j in range(Q):
        if cfg.bz_active is not None and not cfg.bz_active[j]:
            continue
        i = opp[j]
        qj = q_rows(j)
        lt = (qj >= 0.0) & (qj < 0.5)
        ge = qj >= 0.5
        val_lt = 2.0 * qj * fpost(i) + (1.0 - 2.0 * qj) * snap[i]
        inv2q = 1.0 / (2.0 * jnp.maximum(qj, 0.5))
        val_ge = inv2q * fpost(i) + (1.0 - inv2q) * fpost(j)
        if cfg.bz_planes == 2 * Q:   # moving wall: momentum term
            tw = q_rows(Q + j)
            val_lt = val_lt + 6.0 * tw
            val_ge = val_ge + (6.0 * inv2q) * tw
        out[j] = jnp.where(lt, val_lt, jnp.where(ge, val_ge, snap[j]))
    return out


def _bc_row_values(cfg: _Cfg, planes, mask_row, fl, fr, bz=None):
    """Value-level BC application for a single intermediate ring row
    (2-step kernel): ghost sanitize + Zou-He columns + obstacle pinning.
    Walls never apply (ring rows are never global wall rows — the shard that
    owns the wall applies them). planes: list of Q (1, nxl) values.
    bz (cfg.bz blocked kernels): (q_rows, fpost) callables for this ghost
    row — the Bouzidi rewrite replaces the voxel obstacle treatment so the
    locally recomputed ghost chain matches what the neighbor computes."""
    Q, nxl = cfg.Q, cfg.nxl
    xl, xr = cfg.xl_col, cfg.xr_col
    eq_in, u_in = cfg.eq_in, cfg.u_in
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxl), 1)
    planes = list(planes)
    if not cfg.periodic_x:
        # x-edge ghost pulls are ZERO (see _apply_bcs); ring rows are always
        # global-interior rows when these values are used, so no corner case.
        for i in range(Q):
            cx, _ = cfg.c[i]
            if cx > 0:
                planes[i] = jnp.where((col == xl) & (fl == 1),
                                      jnp.float32(0.0), planes[i])
            elif cx < 0:
                planes[i] = jnp.where((col == xr) & (fr == 1),
                                      jnp.float32(0.0), planes[i])
    fluid = (mask_row < 0.5) if cfg.has_solid else None

    def guard(m):
        return m if fluid is None else (m & fluid)

    if cfg.walls_x:
        # side-wall bounce-back on the x-edge columns (cavity;
        # ops/boundaries.apply_walls with axis_component=0)
        snap = list(planes)
        for i in range(Q):
            cx, _ = cfg.c[i]
            if cx > 0:
                planes[i] = jnp.where(guard((col == xl) & (fl == 1)),
                                      snap[cfg.opp[i]], planes[i])
            elif cx < 0:
                planes[i] = jnp.where(guard((col == xr) & (fr == 1)),
                                      snap[cfg.opp[i]], planes[i])
    if cfg.inlet_zou_he:
        m = guard((col == xl) & (fl == 1))
        p = planes
        rho_bc = (p[0] + p[2] + p[4] + 2.0 * (p[3] + p[6] + p[7])) / (1.0 - u_in)
        ru = rho_bc * u_in
        ht = 0.5 * (p[2] - p[4])
        planes[1] = jnp.where(m, p[3] + (2.0 / 3.0) * ru, p[1])
        planes[5] = jnp.where(m, p[7] - ht + (1.0 / 6.0) * ru, p[5])
        planes[8] = jnp.where(m, p[6] + ht + (1.0 / 6.0) * ru, p[8])
    if cfg.outlet_zou_he:
        m = guard((col == xr) & (fr == 1))
        p = planes
        u_out = -1.0 + (p[0] + p[2] + p[4] + 2.0 * (p[1] + p[5] + p[8]))
        ht = 0.5 * (p[2] - p[4])
        planes[3] = jnp.where(m, p[1] - (2.0 / 3.0) * u_out, p[3])
        planes[6] = jnp.where(m, p[8] - ht - (1.0 / 6.0) * u_out, p[6])
        planes[7] = jnp.where(m, p[5] + ht - (1.0 / 6.0) * u_out, p[7])
    if cfg.has_solid:
        solid = mask_row > 0.5
        if bz is not None:
            q_rows, fpost = bz
            vals = _bz_rewrite(cfg, list(planes), q_rows, fpost)
            for j in range(Q):
                if vals[j] is not None:
                    planes[j] = vals[j]
            for i in range(Q):
                planes[i] = jnp.where(solid, jnp.float32(cfg.w[i]), planes[i])
        elif cfg.bounce_back:
            snap = list(planes)
            for i in range(Q):
                planes[i] = jnp.where(solid, snap[cfg.opp[i]], planes[i])
        else:
            for i in range(Q):
                planes[i] = jnp.where(solid, jnp.float32(cfg.w[i]), planes[i])
    if cfg.pad_x and not cfg.periodic_x:
        # dead lane-padding columns: see _apply_bcs (fr-gated + skipped
        # under periodic_x where the pad is a live wrap shadow; bounded
        # above so the x-tiled kernel's halo region stays untouched)
        pin = (col > xr) & (col <= xr + cfg.pad_x) & (fr == 1)
        for i in range(Q):
            planes[i] = jnp.where(pin, jnp.float32(cfg.eq_in[i]),
                                  planes[i])
    return planes


def _physics_cfg_fields(problem: Problem) -> dict:
    """The geometry/physics _Cfg fields shared by the full-width and x-tiled
    kernel builders (everything except the slab/tile sizing)."""
    lat = problem.lattice
    if lat.D != 2:
        raise ValueError("pallas backend is 2-D (D2Q9); use backend='jax' for 3-D")
    if problem.dtype != np.float32:
        raise ValueError("pallas backend is f32; use backend='jax' for f64")
    Q = lat.Q
    c = tuple((int(cx), int(cy)) for cx, cy in lat.c)
    w = tuple(float(v) for v in lat.w)
    if problem.body_force:
        F = np.asarray(problem.body_force, np.float64)
        src = tuple(float(3.0 * w[i] * (c[i][0] * F[0] + c[i][1] * F[1]))
                    for i in range(Q))
    else:
        src = None
    has_solid = problem.solid is not None
    bounce_back = has_solid and problem.obstacle_bc == "bounce_back"
    bz = has_solid and problem.obstacle_bc == "bouzidi"
    bz_planes = 0
    bz_active = None
    if bz:
        from .bouzidi import active_directions, link_tables
        bz_planes = int(link_tables(problem).shape[0])  # Q or 2Q (moving)
        bz_active = active_directions(problem)
    # Static geometry facts (the solid mask is compile-time data): if no
    # solid cell touches a wall row or the inlet/outlet columns, the BC
    # strips need no mask guard at all; and on slabs with no solid cells the
    # obstacle handling (mask DMA + pinning selects) can be skipped — the
    # cylinder occupies ~3% of rows, so most slabs skip it.
    guard_bcs = False
    if has_solid:
        s = problem.solid
        guard_bcs = bool(s[0, :].any() or s[-1, :].any()
                         or s[:, 0].any() or s[:, -1].any())
    slab_skip = has_solid and not bounce_back and not guard_bcs

    from .. import physics as _physics
    omega_minus = None
    mrt_uv = None
    kbc = None
    if problem.collision == "trt":
        omega_minus = _physics.omega_minus_trt(1.0 / problem.params.tau,
                                               problem.trt_magic)
    elif problem.collision == "mrt":
        U, V = _physics.mrt_rank_correction(
            lat, 1.0 / problem.params.tau,
            overrides=dict(problem.mrt_rates) or None)
        mrt_uv = (tuple(tuple(float(v) for v in row) for row in U),
                  tuple(tuple(float(v) for v in row) for row in V))
    elif problem.collision == "kbc":
        kbc = tuple(tuple(float(v) for v in vec)
                    for vec in _physics.kbc_coeffs(lat))
    return dict(
        Q=Q, c=c, w=w, opp=tuple(int(v) for v in lat.opposite),
        inv_tau=1.0 / problem.params.tau,
        omega_minus=omega_minus, mrt_uv=mrt_uv,
        reg=problem.collision == "regularized",
        smag=float(problem.smagorinsky),
        plaw=(tuple(float(v) for v in problem.power_law)
              if problem.power_law else None),
        u_in=float(problem.init_u[0]),
        eq_in=tuple(float(v) for v in problem.ghost_ring_values()),
        src=src, has_solid=has_solid,
        kbc=kbc,
        bounce_back=bounce_back,
        bz=bz, bz_planes=bz_planes, bz_active=bz_active,
        guard_bcs=guard_bcs, slab_skip=slab_skip,
        clean_corners=bool(getattr(problem, 'clean_corners', False)),
        walls_y=problem.walls_y,
        walls_x=problem.walls_x,
        lid_u=float(problem.lid_u),
        inlet_zou_he=problem.inlet_zou_he,
        outlet_zou_he=problem.outlet_zou_he,
        periodic_x=problem.periodic_x,
        force_fn=problem.force_fn,
        nx_g=int(problem.params.nx), ny_g=int(problem.params.ny),
    )


def _build_cfg(problem: Problem, local_shape, interpret, substeps=1,
               pad_x=0, min_n_ty=1) -> _Cfg:
    """local_shape is the (possibly lane-padded) slab-buffer shape; pad_x of
    its trailing columns are dead padding (the physical right edge sits at
    column nxl - 1 - pad_x). min_n_ty > 1 caps the slab height so the block
    has at least that many slabs (the ranged halo-overlap split needs three
    disjoint ranges of >= substeps+1 slabs each)."""
    fields = _physics_cfg_fields(problem)
    nyl, nxl = local_shape
    if not interpret and nxl % 128 != 0:
        raise ValueError(f"pallas backend needs local nx % 128 == 0, got {nxl}")
    Q = fields["Q"]
    has_solid = fields["has_solid"]

    ty_env = os.environ.get("TPULBM_PALLAS_TY")
    # f-sized slab buffers: 4-slot raw ring + 3-slot ring per intermediate
    # stage + 2-slot output ring; mask ring is N+2 slots for N >= 3.
    # The Bouzidi q table rides the same slab pipeline as the mask, so its
    # ring is mask-sized (x bz_planes).
    slabs = 4 + 3 * (substeps - 1) + 2
    mask_slots = 4 if substeps <= 2 else substeps + 2
    if ty_env:
        Ty = int(ty_env)
        if nyl % Ty:
            raise ValueError(f"TPULBM_PALLAS_TY={Ty} does not divide ny={nyl}")
    else:
        bz_planes = fields["bz_planes"]

        def usage(ty):
            return (slabs * Q * ty
                    + (mask_slots * ty if has_solid else 0)
                    + (mask_slots * bz_planes * ty
                       if fields["bz"] else 0)) * nxl * 4
        valid = [ty for ty in range(1, nyl + 1)
                 if nyl % ty == 0 and usage(ty) <= _VMEM_BUDGET
                 and (interpret or ty % 8 == 0)
                 and nyl // ty >= min_n_ty]
        if not valid:
            raise ValueError(
                f"no y-slab of {nyl} rows fits VMEM (nx={nxl}); on TPU the "
                f"local ny must have a multiple-of-8 divisor small enough")
        Ty = max(valid)

    # The top corner closures read a neighbor density from slab row Ty-2;
    # a degenerate 1-row slab (possible only in interpret mode, where Ty
    # need not be a multiple of 8) would slice an empty [-1:0] window and
    # compute a wrong rho*.
    if (fields["clean_corners"] or fields["walls_x"]) and Ty < 2:
        raise ValueError(
            f"corner closures need slab height Ty >= 2, got {Ty}")

    return _Cfg(**fields, Ty=Ty, nxl=nxl, n_ty=nyl // Ty,
                xl_col=0, xr_col=nxl - 1 - pad_x, pad_x=pad_x)


def _wrap_call(cfg: _Cfg, kernel, nyl, depth, interpret, has_solid,
               ranged=False):
    Q, nxl = cfg.Q, cfg.nxl
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # flags (4,) int32
    ]
    if ranged:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # bounds (2,)
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # per-slab solid flags (n_ty,)
        pl.BlockSpec(memory_space=pl.ANY),      # f (HBM)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rb (Q,depth,nxl)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rt
        pl.BlockSpec(memory_space=pl.ANY),      # mask f32 (HBM)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # mask ring below (depth,nxl)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # mask ring above
    ]
    if cfg.bz:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # bouzidi q (HBM)
        if depth > 1:
            # q halo rows for the ghost-chain recomputation (the q analog
            # of the mask rings): (bz_planes, depth, nxl) per side
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # qrb
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # qrt
    if ranged:
        # aliased storage for the output: ranged calls write only their
        # slab range; the other ranges' rows pass through untouched
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # out_init
    call = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nyl, nxl), jnp.float32),
        input_output_aliases=({len(in_specs) - 1: 0} if ranged else {}),
        scratch_shapes=kernel.scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )
    zero_mask = np.zeros((nyl, nxl), np.float32)
    zero_ring = np.zeros((depth, nxl), np.float32)
    ones_sflags = np.ones((cfg.n_ty,), np.int32)

    def step(f, rb, rt, flags, mask=None, mrb=None, mrt=None, sflags=None,
             bzq=None, bzrb=None, bzrt=None, bounds=None, out_init=None):
        if has_solid and mask is None:
            raise ValueError("pallas backend needs the solid mask")
        mask = jnp.asarray(zero_mask) if mask is None else mask
        mrb = jnp.asarray(zero_ring) if mrb is None else mrb
        mrt = jnp.asarray(zero_ring) if mrt is None else mrt
        sflags = jnp.asarray(ones_sflags) if sflags is None else sflags
        args = [flags]
        if ranged:
            if bounds is None or out_init is None:
                raise ValueError("ranged kernel needs bounds and out_init")
            args.append(bounds)
        args += [sflags, f, rb, rt, mask, mrb, mrt]
        if cfg.bz:
            if bzq is None:
                raise ValueError("bouzidi pallas kernel needs the q table")
            args.append(bzq)
            if depth > 1:
                if bzrb is None or bzrt is None:
                    raise ValueError("blocked bouzidi kernel needs q halo "
                                     "rings (bzrb/bzrt)")
                args += [bzrb, bzrt]
        if ranged:
            args.append(out_init)
        return call(*args)

    step.tile_height = cfg.Ty
    step.n_ty = cfg.n_ty
    step.slab_skip = cfg.slab_skip
    return step


def make_local_step_pallas(problem: Problem,
                           local_shape: tuple[int, ...],
                           interpret: bool | None = None,
                           pad_x: int = 0):
    """Single-step kernel: step(f, rb, rt, flags, mask, mrb, mrt) -> f_new.

    f: (Q, nyl, nxl); rb/rt: (Q, 1, nxl) ring rows (parallel/halo.ring_rows);
    flags: (4,) int32 [is_bottom, is_top, is_left, is_right]; mask*: f32
    solid masks or None. pad_x > 0: the trailing pad_x columns of the
    (lane-padded) inputs are dead padding. Verified equivalent to the jax
    tier by tests/test_pallas.py.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cfg = _build_cfg(problem, local_shape, interpret, substeps=1,
                     pad_x=pad_x)
    nyl = local_shape[0]
    Q, Ty, nxl, n_ty = cfg.Q, cfg.Ty, cfg.nxl, cfg.n_ty
    has_solid = cfg.has_solid

    def kernel(flags_ref, sflags_ref, f_ref, rb_ref, rt_ref, mask_ref,
               mrb_ref, mrt_ref, *rest):
        if cfg.bz:
            (bzq_ref, out_ref, fsl, ob, msl, qsl,
             sem_f, sem_ob, sem_m, sem_q) = rest
        else:
            bzq_ref = qsl = sem_q = None
            out_ref, fsl, ob, msl, sem_f, sem_ob, sem_m = rest
        fb, ft, fl, fr = (flags_ref[k] for k in range(4))
        # shard's global y offset (flags[4]), only materialized for
        # force_fn problems — every other caller passes 4-entry flags
        y_at = ((lambda r: flags_ref[4] + r) if cfg.force_fn is not None
                else (lambda r: None))

        def f_dma(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), :], fsl.at[t % 4], sem_f.at[t % 4])

        def m_dma(t):
            return pltpu.make_async_copy(
                mask_ref.at[pl.ds(t * Ty, Ty), :], msl.at[t % 4], sem_m.at[t % 4])

        def out_dma(t):
            return pltpu.make_async_copy(
                ob.at[t % 2], out_ref.at[:, pl.ds(t * Ty, Ty), :], sem_ob.at[t % 2])

        def mask_op(t, fn):
            # skip the mask DMA on solid-free slabs (static bounding box)
            if not has_solid:
                return
            if cfg.slab_skip:
                pl.when(sflags_ref[t] == 1)(fn)
            else:
                fn()

        def q_dma(t):
            # the Bouzidi link table rides the same slab pipeline as the
            # mask (and the same per-slab skip — its cut links live within
            # one row of the solid cells, covered by the widened sflags
            # bounding box built in parallel/sharded_step)
            return pltpu.make_async_copy(
                bzq_ref.at[:, pl.ds(t * Ty, Ty), :], qsl.at[t % 4],
                sem_q.at[t % 4])

        def start_in(t):
            f_dma(t).start()
            mask_op(t, lambda: m_dma(t).start())
            if cfg.bz:
                mask_op(t, lambda: q_dma(t).start())

        def wait_in(t):
            f_dma(t).wait()
            mask_op(t, lambda: m_dma(t).wait())
            if cfg.bz:
                mask_op(t, lambda: q_dma(t).wait())

        def slab_flag(t):
            return (sflags_ref[t] == 1) if cfg.slab_skip else None

        def collide_slab(slot, tslab):
            fw = [fsl[slot, i] for i in range(Q)]
            solid_rows = (msl[slot] > 0.5) if cfg.bounce_back else None
            fp = _collide_rows(cfg, fw, solid_rows, y_at(tslab * Ty))
            for i in range(Q):
                fsl[slot, i] = fp[i]

        # Collide the ring rows once (loop-invariant; pointwise — each shard
        # recomputes its neighbors' post-collision edge rows locally instead
        # of shipping them, see parallel/halo.py). Their global-y coords are
        # the UNWRAPPED -1 / nyl offsets, matching the jax tier's padded
        # block (periodic force_fns wrap them analytically).
        rb_fp = _collide_rows(cfg, [rb_ref[i] for i in range(Q)],
                              (mrb_ref[...] > 0.5) if cfg.bounce_back else None,
                              y_at(-1))
        rt_fp = _collide_rows(cfg, [rt_ref[i] for i in range(Q)],
                              (mrt_ref[...] > 0.5) if cfg.bounce_back else None,
                              y_at(nyl))

        start_in(0)
        if n_ty > 1:
            start_in(1)
        wait_in(0)
        collide_slab(0, 0)

        def loop(t, carry):
            @pl.when(t + 1 < n_ty)
            def _():
                wait_in(t + 1)
                collide_slab((t + 1) % 4, t + 1)

            @pl.when(t + 2 < n_ty)
            def _():
                start_in(t + 2)

            oslot = t % 2

            @pl.when(t >= 2)
            def _():
                out_dma(t - 2).wait()

            cur_slot = t % 4
            for i in range(Q):
                below = jnp.where(t == 0, rb_fp[i],
                                  fsl[(t - 1) % 4, i, Ty - 1:Ty, :])
                above = jnp.where(t == n_ty - 1, rt_fp[i],
                                  fsl[(t + 1) % 4, i, 0:1, :])
                ob[oslot, i] = _stream_rows(cfg, i, fsl[cur_slot, i], below, above)

            bz = None
            if cfg.bz:
                # post-collision (pre-stream) slab values live in fsl at
                # this point — collide_slab relaxed them in place
                bz = ((lambda j: qsl[cur_slot, j]),
                      (lambda i: fsl[cur_slot, i]))
            _apply_bcs(cfg, ob, oslot, msl if has_solid else None, cur_slot,
                       jnp.logical_and(t == 0, fb == 1),
                       jnp.logical_and(t == n_ty - 1, ft == 1), fl, fr,
                       solid_flag=slab_flag(t), bz=bz)

            out_dma(t).start()
            return carry

        lax.fori_loop(0, n_ty, loop, 0, unroll=False)
        if n_ty >= 2:
            out_dma(n_ty - 2).wait()
        out_dma(n_ty - 1).wait()

    kernel.scratch_shapes = [
        pltpu.VMEM((4, Q, Ty, nxl), jnp.float32),   # f slabs (collided in place)
        pltpu.VMEM((2, Q, Ty, nxl), jnp.float32),   # output slabs
        (pltpu.VMEM((4, Ty, nxl), jnp.float32) if has_solid
            else pltpu.VMEM((1, 8, 128), jnp.float32)),               # mask slabs
    ] + ([pltpu.VMEM((4, cfg.bz_planes, Ty, nxl), jnp.float32)]
         if cfg.bz else []) + [
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((4,)),
    ] + ([pltpu.SemaphoreType.DMA((4,))] if cfg.bz else [])
    return _wrap_call(cfg, kernel, nyl, 1, interpret, has_solid)


def make_local_step_pallas_ranged(problem: Problem,
                                  local_shape: tuple[int, ...],
                                  interpret: bool | None = None,
                                  pad_x: int = 0):
    """Slab-range variant of the 1-step kernel, for halo-overlap mode
    (TPULBM_HALO_OVERLAP): step(f, rb, rt, flags, bounds, out_init, mask,
    mrb, mrt, sflags) processes only slabs [bounds[0], bounds[1]) of the
    full-height block, writing their rows of the full-height output.

    The chunk builder splits each timestep into an INTERIOR call (slabs
    1..n_ty-2; its "ring" rows are local raw rows of f, so it has no data
    dependency on the ppermute) plus two EDGE calls (slab 0 / slab n_ty-1,
    consuming the ppermute'd rings, writing into the interior call's output
    via input/output aliasing) — XLA can then overlap the halo exchange
    with the interior kernel. Numerics are identical to the monolithic
    kernel: slab-boundary "ring" rows are raw rows collided in-kernel,
    exactly like the monolithic kernel's neighbor-slab rows (collision is
    pointwise). Single-chip this trades two extra kernel launches per step
    for the overlap, so it is flag-gated, not the default.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if problem.force_fn is not None:
        raise ValueError("force_fn is not supported by the halo-overlap "
                         "ranged kernel; use the default 1-step path")
    cfg = _build_cfg(problem, local_shape, interpret, substeps=1,
                     pad_x=pad_x)
    nyl = local_shape[0]
    Q, Ty, nxl, n_ty = cfg.Q, cfg.Ty, cfg.nxl, cfg.n_ty
    has_solid = cfg.has_solid

    def kernel(flags_ref, bounds_ref, sflags_ref, f_ref, rb_ref, rt_ref,
               mask_ref, mrb_ref, mrt_ref, out_init_ref, out_ref,
               fsl, ob, msl, sem_f, sem_ob, sem_m):
        del out_init_ref  # aliased storage for out_ref; never read
        fb, ft, fl, fr = (flags_ref[k] for k in range(4))
        t_lo, t_hi = bounds_ref[0], bounds_ref[1]

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

        def mask_op(t, fn):
            if not has_solid:
                return
            if cfg.slab_skip:
                pl.when(sflags_ref[t] == 1)(fn)
            else:
                fn()

        def start_in(t):
            f_dma(t).start()
            mask_op(t, lambda: m_dma(t).start())

        def wait_in(t):
            f_dma(t).wait()
            mask_op(t, lambda: m_dma(t).wait())

        def slab_flag(t):
            return (sflags_ref[t] == 1) if cfg.slab_skip else None

        def collide_slab(slot):
            fw = [fsl[slot, i] for i in range(Q)]
            solid_rows = (msl[slot] > 0.5) if cfg.bounce_back else None
            fp = _collide_rows(cfg, fw, solid_rows)
            for i in range(Q):
                fsl[slot, i] = fp[i]

        rb_fp = _collide_rows(cfg, [rb_ref[i] for i in range(Q)],
                              (mrb_ref[...] > 0.5) if cfg.bounce_back
                              else None)
        rt_fp = _collide_rows(cfg, [rt_ref[i] for i in range(Q)],
                              (mrt_ref[...] > 0.5) if cfg.bounce_back
                              else None)

        start_in(t_lo)

        @pl.when(t_lo + 1 < t_hi)
        def _():
            start_in(t_lo + 1)
        wait_in(t_lo)
        # dynamic slot: t_lo is traced — collide via the same helper with a
        # traced slot index is fine (refs index with traced values)
        collide_slab(t_lo % 4)

        def loop(t, carry):
            @pl.when(t + 1 < t_hi)
            def _():
                wait_in(t + 1)
                collide_slab((t + 1) % 4)

            @pl.when(t + 2 < t_hi)
            def _():
                start_in(t + 2)

            oslot = t % 2

            @pl.when(t >= t_lo + 2)
            def _():
                out_dma(t - 2).wait()

            cur_slot = t % 4
            for i in range(Q):
                below = jnp.where(t == t_lo, rb_fp[i],
                                  fsl[(t - 1) % 4, i, Ty - 1:Ty, :])
                above = jnp.where(t == t_hi - 1, rt_fp[i],
                                  fsl[(t + 1) % 4, i, 0:1, :])
                ob[oslot, i] = _stream_rows(cfg, i, fsl[cur_slot, i],
                                            below, above)

            _apply_bcs(cfg, ob, oslot, msl if has_solid else None, cur_slot,
                       jnp.logical_and(t == 0, fb == 1),
                       jnp.logical_and(t == n_ty - 1, ft == 1), fl, fr,
                       solid_flag=slab_flag(t))

            out_dma(t).start()
            return carry

        lax.fori_loop(t_lo, t_hi, loop, 0, unroll=False)

        @pl.when(t_hi - 2 >= t_lo)
        def _():
            out_dma(t_hi - 2).wait()
        out_dma(t_hi - 1).wait()

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flags (4,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds (2,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sflags (n_ty,)
            pl.BlockSpec(memory_space=pl.ANY),      # f
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rt
            pl.BlockSpec(memory_space=pl.ANY),      # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mrb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mrt
            pl.BlockSpec(memory_space=pl.ANY),      # out_init (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nyl, nxl), jnp.float32),
        input_output_aliases={9: 0},
        scratch_shapes=[
            pltpu.VMEM((4, Q, Ty, nxl), jnp.float32),
            pltpu.VMEM((2, Q, Ty, nxl), jnp.float32),
            (pltpu.VMEM((4, Ty, nxl), jnp.float32) if has_solid
             else pltpu.VMEM((1, 8, 128), jnp.float32)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )

    zero_mask = np.zeros((nyl, nxl), np.float32)
    zero_ring = np.zeros((1, nxl), np.float32)
    ones_sflags = np.ones((cfg.n_ty,), np.int32)

    def step(f, rb, rt, flags, bounds, out_init, mask=None, mrb=None,
             mrt=None, sflags=None):
        if has_solid and mask is None:
            raise ValueError("pallas backend needs the solid mask")
        mask = jnp.asarray(zero_mask) if mask is None else mask
        mrb = jnp.asarray(zero_ring) if mrb is None else mrb
        mrt = jnp.asarray(zero_ring) if mrt is None else mrt
        sflags = jnp.asarray(ones_sflags) if sflags is None else sflags
        return call(flags, bounds, sflags, f, rb, rt, mask, mrb, mrt,
                    out_init)

    step.tile_height = cfg.Ty
    step.n_ty = cfg.n_ty
    step.slab_skip = cfg.slab_skip
    return step


def make_local_step_pallas2(problem: Problem,
                            local_shape: tuple[int, ...],
                            interpret: bool | None = None,
                            pad_x: int = 0):
    """Two-step fused kernel: step2(f, rb2, rt2, flags, mask, mrb2, mrt2)
    advances TWO timesteps per HBM round trip (temporal blocking).

    Ring inputs are depth-2: rb2/rt2 (Q, 2, nxl), mrb2/mrt2 (2, nxl) —
    parallel/halo.ring_rows(depth=2). Intermediate (t+1) halo rows are
    recomputed locally from the depth-2 raw halos (collision and the BC
    algebra are row-local), so nothing extra travels over ICI.

    Returns None when the local block has fewer than 3 slabs (the chunk
    builder then falls back to the 1-step kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if problem.obstacle_bc == "bouzidi" and problem.solid is not None:
        # this specialized 2-step kernel has no q-table plumbing; blocked
        # bouzidi goes through make_local_step_pallasN (any N >= 2)
        raise ValueError("bouzidi 2-step blocking runs via the N-step "
                         "kernel (make_local_step_pallasN)")
    cfg = _build_cfg(problem, local_shape, interpret, substeps=2,
                     pad_x=pad_x)
    nyl = local_shape[0]
    Q, Ty, nxl, n_ty = cfg.Q, cfg.Ty, cfg.nxl, cfg.n_ty
    has_solid = cfg.has_solid
    if n_ty < 3:
        return None

    def kernel(flags_ref, sflags_ref, f_ref, rb_ref, rt_ref, mask_ref,
               mrb_ref, mrt_ref, out_ref, fa, gb, ob, msl, g_rt,
               sem_f, sem_ob, sem_m):
        fb, ft, fl, fr = (flags_ref[k] for k in range(4))
        # shard's global y offset (flags[4]), only read for force_fn
        # problems — every other caller passes 4-entry flags. Both stages
        # evaluate the force at the same (fixed) global coordinates; ghost
        # rows use the unwrapped -2..-1 / nyl..nyl+1 offsets (periodic
        # force_fns wrap them analytically, matching the jax tier).
        y_at = ((lambda r: flags_ref[4] + r) if cfg.force_fn is not None
                else (lambda r: None))

        def f_dma(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), :], fa.at[t % 4], sem_f.at[t % 4])

        def m_dma(t):
            return pltpu.make_async_copy(
                mask_ref.at[pl.ds(t * Ty, Ty), :], msl.at[t % 4], sem_m.at[t % 4])

        def out_dma(t):
            return pltpu.make_async_copy(
                ob.at[t % 2], out_ref.at[:, pl.ds(t * Ty, Ty), :], sem_ob.at[t % 2])

        def mask_op(t, fn):
            if not has_solid:
                return
            if cfg.slab_skip:
                pl.when(sflags_ref[t] == 1)(fn)
            else:
                fn()

        def start_in(t):
            f_dma(t).start()
            mask_op(t, lambda: m_dma(t).start())

        def wait_in(t):
            f_dma(t).wait()
            mask_op(t, lambda: m_dma(t).wait())

        def slab_flag(t):
            return (sflags_ref[t] == 1) if cfg.slab_skip else None

        def collide_a(t):
            slot = t % 4
            fw = [fa[slot, i] for i in range(Q)]
            solid_rows = (msl[slot] > 0.5) if cfg.bounce_back else None
            fp = _collide_rows(cfg, fw, solid_rows, y_at(t * Ty))
            for i in range(Q):
                fa[slot, i] = fp[i]

        # A-collided depth-2 ring rows (loop-invariant values)
        mrb = (mrb_ref[...] > 0.5) if cfg.bounce_back else None
        mrt = (mrt_ref[...] > 0.5) if cfg.bounce_back else None
        rbA = _collide_rows(cfg, [rb_ref[i] for i in range(Q)], mrb,
                            y_at(-2))  # (2,nxl)
        rtA = _collide_rows(cfg, [rt_ref[i] for i in range(Q)], mrt,
                            y_at(nyl))

        # Prologue: raw slabs 0..2 in flight; 0 and 1 A-collided (n_ty >= 3).
        start_in(0)
        start_in(1)
        start_in(2)
        wait_in(0)
        collide_a(0)
        wait_in(1)
        collide_a(1)

        # Intermediate ring row below (t+1 state at local row -1): streamed
        # from rbA + slab 0, BC'd, then B-collided. Frozen ghost at the
        # physical bottom edge.
        planes = []
        for i in range(Q):
            cx, cy = cfg.c[i]
            if cy == 0:
                row = rbA[i][1:2, :]
            elif cy > 0:
                row = rbA[i][0:1, :]
            else:
                row = fa[0, i, 0:1, :]
            if cx:
                row = pltpu.roll(row, cx % nxl, axis=1)
            planes.append(row)
        planes = _bc_row_values(cfg, planes, mrb_ref[1:2, :] if has_solid else None,
                                fl, fr)
        planes = _collide_rows(cfg, planes,
                               (mrb_ref[1:2, :] > 0.5) if cfg.bounce_back else None,
                               y_at(-1))
        eq_row = [jnp.full((1, nxl), cfg.eq_in[i], jnp.float32) for i in range(Q)]
        g_rb = [jnp.where(fb == 1, eq_row[i], planes[i]) for i in range(Q)]

        def collide_gb(gslot, cur_slot, s_idx):
            fw = [gb[gslot, i] for i in range(Q)]
            solid_rows = (msl[cur_slot] > 0.5) if cfg.bounce_back else None
            fp = _collide_rows(cfg, fw, solid_rows, y_at(s_idx * Ty))
            for i in range(Q):
                gb[gslot, i] = fp[i]

        # gB[0] in the prologue: below = ring, above = slab 1 (n_ty >= 3).
        for i in range(Q):
            gb[0, i] = _stream_rows(cfg, i, fa[0, i], rbA[i][1:2, :],
                                    fa[1, i, 0:1, :])
        _apply_bcs(cfg, gb, 0, msl if has_solid else None, 0,
                   fb == 1, jnp.asarray(False, jnp.bool_), fl, fr,
                   solid_flag=slab_flag(0))
        collide_gb(0, 0, 0)

        def make_gb(s_idx):
            """gB[s_idx % 3] = collideB(BC_A(streamA(slab s_idx))); s_idx >= 1
            traced (gB[0] is handled in the prologue)."""
            gslot = s_idx % 3
            cur_slot = s_idx % 4
            is_last = s_idx == n_ty - 1
            for i in range(Q):
                below = fa[(s_idx - 1) % 4, i, Ty - 1:Ty, :]
                above = jnp.where(is_last, rtA[i][0:1, :],
                                  fa[(s_idx + 1) % 4, i, 0:1, :])
                gb[gslot, i] = _stream_rows(cfg, i, fa[cur_slot, i], below, above)
            _apply_bcs(cfg, gb, gslot, msl if has_solid else None, cur_slot,
                       jnp.asarray(False, jnp.bool_),
                       jnp.logical_and(is_last, ft == 1), fl, fr,
                       solid_flag=slab_flag(s_idx))
            collide_gb(gslot, cur_slot, s_idx)

        def loop(s, carry):
            # stage 1: A-collide slab s+2; prefetch raw slab s+3
            @pl.when(s + 2 < n_ty)
            def _():
                wait_in(s + 2)
                collide_a(s + 2)

            @pl.when(s + 3 < n_ty)
            def _():
                start_in(s + 3)

            # intermediate ring row above: available once fa[n_ty-1] exists
            @pl.when(s + 2 == n_ty - 1)
            def _():
                last = (n_ty - 1) % 4
                for i in range(Q):
                    cx, cy = cfg.c[i]
                    if cy == 0:
                        row = rtA[i][0:1, :]
                    elif cy > 0:
                        row = fa[last, i, Ty - 1:Ty, :]
                    else:
                        row = rtA[i][1:2, :]
                    if cx:
                        row = pltpu.roll(row, cx % nxl, axis=1)
                    g_rt[0, i] = row
                planes2 = _bc_row_values(
                    cfg, [g_rt[0, i] for i in range(Q)],
                    mrt_ref[0:1, :] if has_solid else None, fl, fr)
                planes2 = _collide_rows(
                    cfg, planes2,
                    (mrt_ref[0:1, :] > 0.5) if cfg.bounce_back else None,
                    y_at(nyl))
                for i in range(Q):
                    g_rt[0, i] = jnp.where(ft == 1, eq_row[i], planes2[i])

            # stage 2: gB[s+1]
            @pl.when(s + 1 < n_ty)
            def _():
                make_gb(s + 1)

            # stage 3: out[s]
            oslot = s % 2

            @pl.when(s >= 2)
            def _():
                out_dma(s - 2).wait()

            for i in range(Q):
                below = jnp.where(s == 0, g_rb[i],
                                  gb[(s - 1) % 3, i, Ty - 1:Ty, :])
                above = jnp.where(s == n_ty - 1, g_rt[0, i],
                                  gb[(s + 1) % 3, i, 0:1, :])
                ob[oslot, i] = _stream_rows(cfg, i, gb[s % 3, i], below, above)

            _apply_bcs(cfg, ob, oslot, msl if has_solid else None, s % 4,
                       jnp.logical_and(s == 0, fb == 1),
                       jnp.logical_and(s == n_ty - 1, ft == 1), fl, fr,
                       solid_flag=slab_flag(s))

            out_dma(s).start()
            return carry

        lax.fori_loop(0, n_ty, loop, 0, unroll=False)
        if n_ty >= 2:
            out_dma(n_ty - 2).wait()
        out_dma(n_ty - 1).wait()

    kernel.scratch_shapes = [
        pltpu.VMEM((4, Q, Ty, nxl), jnp.float32),   # raw/A-collided slabs
        pltpu.VMEM((3, Q, Ty, nxl), jnp.float32),   # B-collided intermediates
        pltpu.VMEM((2, Q, Ty, nxl), jnp.float32),   # output slabs
        (pltpu.VMEM((4, Ty, nxl), jnp.float32) if has_solid
            else pltpu.VMEM((1, 8, 128), jnp.float32)),               # mask slabs
        pltpu.VMEM((1, Q, 1, nxl), jnp.float32),    # intermediate top ring row
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    return _wrap_call(cfg, kernel, nyl, 2, interpret, has_solid)



def make_local_step_pallasN(problem: Problem,
                            local_shape: tuple[int, ...],
                            n_sub: int,
                            interpret: bool | None = None,
                            pad_x: int = 0,
                            ranged: bool = False):
    """N-substep fused kernel: advances n_sub timesteps per HBM round trip.

    Generalizes the 2-step kernel to a cascade of N collide-stream stages
    over the slab pipeline — stage 0 collides raw slabs in place; stages
    1..N-1 hold collided intermediate states in 3-slot rings; the final
    stage streams into the output (uncollided: the new carry). Ghost-row
    chains of depth N-k are recomputed locally from depth-N halo rows
    (parallel/halo.ring_rows(depth=N)), keeping the ICI payload at N
    rows/side. HBM traffic per timestep falls to (1 read + 1 write)/N of f;
    VPU work per timestep is unchanged, so this pays while the slab DMA is
    the bottleneck.

    ranged=True (halo-overlap mode, TPULBM_HALO_OVERLAP): step(f, rb, rt,
    flags, ..., bounds, out_init) processes only slabs [bounds[0],
    bounds[1]) — at least N+1 slabs — writing their rows of the full-height
    output (out_init aliased). The range's bottom/top ghost chains arrive
    via rb/rt exactly like shard-edge chains; an INTERIOR range's chains
    are raw local rows of f just outside the range, so the call has no
    data dependency on the ppermute'd rings and XLA can overlap the halo
    exchange with it. Splitting at a slab boundary is numerically a
    virtual shard boundary: the cascade recomputes the chain trapezoid
    from raw rows exactly as the monolithic kernel does at real shard
    edges (collision/streaming are deterministic), so the stitched result
    matches the monolithic kernel.

    Returns None when the local block has fewer than n_sub+1 slabs or the
    buffers exceed the VMEM budget.
    """
    assert n_sub >= 2
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    try:
        cfg = _build_cfg(problem, local_shape, interpret, substeps=n_sub,
                         pad_x=pad_x,
                         min_n_ty=3 * (n_sub + 1) if ranged else 1)
    except ValueError:
        return None
    nyl = local_shape[0]
    Q, Ty, nxl, n_ty = cfg.Q, cfg.Ty, cfg.nxl, cfg.n_ty
    N = n_sub
    M = N + 2  # mask-slab ring size: slot idx must survive until out[idx]
    has_solid = cfg.has_solid
    if n_ty < N + 1:
        return None

    def kernel(flags_ref, *refs):
        if ranged:
            bounds_ref, *refs = refs
            t_lo, t_hi = bounds_ref[0], bounds_ref[1]
        else:
            t_lo, t_hi = 0, n_ty
        (sflags_ref, f_ref, rb_ref, rt_ref, mask_ref, mrb_ref,
         mrt_ref, *refs) = refs
        if cfg.bz:
            bzq_ref, bzrb_ref, bzrt_ref, *refs = refs
        else:
            bzq_ref = bzrb_ref = bzrt_ref = None
        if ranged:
            refs = refs[1:]  # out_init: aliased storage, never read
        out_ref, fa, *rest = refs
        gs = list(rest[:N - 1])          # stages 1..N-1, 3-slot rings
        ob, msl, t_scr = rest[N - 1:N + 2]
        sem_f, sem_ob, sem_m = rest[N + 2:N + 5]
        qsl, sem_q = rest[N + 5:N + 7] if cfg.bz else (None, None)
        fb, ft, fl, fr = (flags_ref[k] for k in range(4))
        # physical-edge conditions localized to the slab range: a range's
        # bottom/top chains sit at the physical y edges only when the range
        # touches row 0 / row nyl-1 (interior ranges' chains are raw rows)
        fbe = (fb == 1) if not ranged else jnp.logical_and(t_lo == 0,
                                                           fb == 1)
        fte = (ft == 1) if not ranged else jnp.logical_and(t_hi == n_ty,
                                                           ft == 1)
        # shard's global y offset (flags[4], force_fn problems only): every
        # stage evaluates the force at the same fixed global coordinates;
        # ghost-chain rows use the unwrapped -N..-1 / nyl..nyl+N-1 offsets
        # (periodic force_fns wrap them analytically — jax-tier semantics).
        y_at = ((lambda r: flags_ref[4] + r) if cfg.force_fn is not None
                else (lambda r: None))

        def stage_ref(k):
            """(ref, n_slots) holding stage-k slabs (stage 0 = collided raw)."""
            return (fa, 4) if k == 0 else (gs[k - 1], 3)

        def f_dma(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), :], fa.at[t % 4], sem_f.at[t % 4])

        def m_dma(t):
            return pltpu.make_async_copy(
                mask_ref.at[pl.ds(t * Ty, Ty), :], msl.at[t % M], sem_m.at[t % M])

        def out_dma(t):
            return pltpu.make_async_copy(
                ob.at[t % 2], out_ref.at[:, pl.ds(t * Ty, Ty), :], sem_ob.at[t % 2])

        def mask_op(t, fn):
            if not has_solid:
                return
            if cfg.slab_skip:
                pl.when(sflags_ref[t] == 1)(fn)
            else:
                fn()

        def q_dma(t):
            # the Bouzidi link table rides the same slab pipeline (and the
            # same per-slab skip) as the mask, in an M-slot ring — its slot
            # must survive until every stage has applied BCs to slab t
            return pltpu.make_async_copy(
                bzq_ref.at[:, pl.ds(t * Ty, Ty), :], qsl.at[t % M],
                sem_q.at[t % M])

        def start_in(t):
            f_dma(t).start()
            mask_op(t, lambda: m_dma(t).start())
            if cfg.bz:
                mask_op(t, lambda: q_dma(t).start())

        def wait_in(t):
            f_dma(t).wait()
            mask_op(t, lambda: m_dma(t).wait())
            if cfg.bz:
                mask_op(t, lambda: q_dma(t).wait())

        def slab_flag(t):
            return (sflags_ref[t] == 1) if cfg.slab_skip else None

        def collide_a(t):
            slot = t % 4
            fw = [fa[slot, i] for i in range(Q)]
            solid_rows = (msl[t % M] > 0.5) if cfg.bounce_back else None
            fp = _collide_rows(cfg, fw, solid_rows, y_at(t * Ty))
            for i in range(Q):
                fa[slot, i] = fp[i]

        eq_row = [jnp.full((1, nxl), cfg.eq_in[i], jnp.float32)
                  for i in range(Q)]
        # ring mask rows, indexed like the ghost offsets
        mrb_rows = {r: mrb_ref[N + r:N + r + 1, :] for r in range(-N, 0)}
        mrt_rows = {r: mrt_ref[r - 1:r, :] for r in range(1, N + 1)}

        def collide_row_vals(planes, mask_row, y0=None):
            solid = (mask_row > 0.5) if cfg.bounce_back else None
            return _collide_rows(cfg, planes, solid, y0)

        def stream_row(below, cur, above):
            planes = []
            for i in range(Q):
                cx, cy = cfg.c[i]
                row = cur[i] if cy == 0 else (below[i] if cy > 0 else above[i])
                if cx:
                    row = pltpu.roll(row, cx % nxl, axis=1)
                planes.append(row)
            return planes

        # ---- bottom ghost chains: B[k][r] = stage-k collided ghost row r
        # (r in -(N-k)..-1, relative to the range bottom), loop-invariant ----
        B = [dict() for _ in range(N)]
        for r in range(-N, 0):
            planes = [rb_ref[i, N + r:N + r + 1, :] for i in range(Q)]
            B[0][r] = collide_row_vals(planes, mrb_rows[r],
                                       y_at(t_lo * Ty + r))

        # ---- prologue: raw slabs t_lo..t_lo+N-1 in flight and collided;
        # the DMA for slab t_lo+N starts only after the stage prologue has
        # consumed its slot (for N == 4 they share one) ----
        for j in range(N):
            start_in(t_lo + j)
        for j in range(N):
            wait_in(t_lo + j)
            collide_a(t_lo + j)

        def make_stage_slab(k, idx, below, above, is_bottom, is_top,
                            collide_after=True):
            """Stage-k slab `idx` from stage k-1 (tgt = gs[k-1], or ob for
            k == N). below/above: per-pop (1, nxl) boundary rows."""
            srcref, m_src = stage_ref(k - 1)
            tgt, m_tgt = (ob, 2) if k == N else stage_ref(k)
            tslot = idx % m_tgt
            for i in range(Q):
                tgt[tslot, i] = _stream_rows(cfg, i, srcref[idx % m_src, i],
                                             below[i], above[i])
            bz = None
            if cfg.bz:
                # stage k-1's slab idx (the post-collision pre-stream state
                # at these cells) is still resident — streaming just read it
                bz = ((lambda j: qsl[idx % M, j]),
                      (lambda i: srcref[idx % m_src, i]))
            _apply_bcs(cfg, tgt, tslot, msl if has_solid else None, idx % M,
                       is_bottom, is_top, fl, fr, solid_flag=slab_flag(idx),
                       bz=bz)
            if collide_after:
                fw = [tgt[tslot, i] for i in range(Q)]
                solid_rows = (msl[idx % M] > 0.5) if cfg.bounce_back else None
                fp = _collide_rows(cfg, fw, solid_rows, y_at(idx * Ty))
                for i in range(Q):
                    tgt[tslot, i] = fp[i]

        false_ = jnp.asarray(False, jnp.bool_)

        # prologue (continued): for each intermediate stage k, its ghost chain then its
        # slabs 0..N-k-1 (loop iteration s first needs stage-k slab s+N-k)
        for k in range(1, N):
            srcref, m_src = stage_ref(k - 1)
            for r in range(-(N - k), 0):
                below = B[k - 1][r - 1]
                cur = B[k - 1][r]
                if r == -1:
                    # the range's first stage-(k-1) slab (slot t_lo % m_src)
                    above = [srcref[t_lo % m_src, i, 0:1, :]
                             for i in range(Q)]
                else:
                    above = B[k - 1][r + 1]
                planes = stream_row(below, cur, above)
                bz_row = None
                if cfg.bz:
                    # q halo rows (neighbor geometry) + stage k-1's collided
                    # ghost row = the post-collision pre-stream state there
                    bz_row = ((lambda j, r=r: bzrb_ref[j, N + r:N + r + 1, :]),
                              (lambda i, k=k, r=r: B[k - 1][r][i]))
                planes = _bc_row_values(
                    cfg, planes, mrb_rows[r] if has_solid else None, fl, fr,
                    bz=bz_row)
                planes = collide_row_vals(planes, mrb_rows[r],
                                          y_at(t_lo * Ty + r))
                B[k][r] = [jnp.where(fbe, eq_row[i], planes[i])
                           for i in range(Q)]
            for j in range(N - k):
                if j == 0:
                    below = B[k - 1][-1]
                else:
                    below = [srcref[(t_lo + j - 1) % m_src, i, Ty - 1:Ty, :]
                             for i in range(Q)]
                above = [srcref[(t_lo + j + 1) % m_src, i, 0:1, :]
                         for i in range(Q)]
                make_stage_slab(k, t_lo + j, below, above,
                                fbe if j == 0 else false_, false_)

        # raw slab t_lo+N may now reuse its slot (prologue reads done)
        if not ranged:
            if n_ty > N:
                start_in(N)
        else:
            @pl.when(t_lo + N < t_hi)
            def _():
                start_in(t_lo + N)

        # T[0] = collided raw top ghost rows (+1..+N above the range),
        # loop-invariant values
        T0 = {}
        for r in range(1, N + 1):
            planes = [rt_ref[i, r - 1:r, :] for i in range(Q)]
            T0[r] = collide_row_vals(planes, mrt_rows[r],
                                     y_at(t_hi * Ty + r - 1))

        def t_prev(k, r):
            """Stage k-1's top ghost row +r as per-pop (1, nxl) values."""
            if k == 1:
                return T0[r]
            return [t_scr[k - 2, i, r - 1:r, :] for i in range(Q)]

        def compute_t_chain(k):
            """Stage-k top ghost rows (+1..+N-k) into t_scr[k-1], from stage
            k-1's last slab and T[k-1]."""
            srcref, m_src = stage_ref(k - 1)
            for r in range(1, N - k + 1):
                if r == 1:
                    below = [srcref[(t_hi - 1) % m_src, i, Ty - 1:Ty, :]
                             for i in range(Q)]
                else:
                    below = t_prev(k, r - 1)
                cur = t_prev(k, r)
                above = t_prev(k, r + 1)
                planes = stream_row(below, cur, above)
                bz_row = None
                if cfg.bz:
                    bz_row = ((lambda j, r=r: bzrt_ref[j, r - 1:r, :]),
                              (lambda i, k=k, r=r: t_prev(k, r)[i]))
                planes = _bc_row_values(
                    cfg, planes, mrt_rows[r] if has_solid else None, fl, fr,
                    bz=bz_row)
                planes = collide_row_vals(planes, mrt_rows[r],
                                          y_at(t_hi * Ty + r - 1))
                for i in range(Q):
                    t_scr[k - 1, i, r - 1:r, :] = jnp.where(
                        fte, eq_row[i], planes[i])

        def loop(s, carry):
            # stage 0: collide raw slab s+N; prefetch raw s+N+1
            @pl.when(s + N < t_hi)
            def _():
                wait_in(s + N)
                collide_a(s + N)

            @pl.when(s + N + 1 < t_hi)
            def _():
                start_in(s + N + 1)

            # intermediate stages k = 1..N-1 produce slab s + N - k
            for k in range(1, N):
                idx = s + (N - k)

                @pl.when(idx < t_hi)
                def _(k=k, idx=idx):
                    srcref, m_src = stage_ref(k - 1)
                    below = [srcref[(idx - 1) % m_src, i, Ty - 1:Ty, :]
                             for i in range(Q)]
                    is_last = idx == t_hi - 1
                    above = [jnp.where(is_last, t_prev(k, 1)[i],
                                       srcref[(idx + 1) % m_src, i, 0:1, :])
                             for i in range(Q)]
                    make_stage_slab(k, idx, below, above, false_,
                                    jnp.logical_and(is_last, fte))

            # top ghost chain for stage k, computed the same iteration its
            # source (stage k-1's last slab, idx t_hi-1) was produced above;
            # consumers read it from the NEXT iteration on
            for k in range(1, N):
                @pl.when(s == t_hi - 2 - N + k)
                def _(k=k):
                    compute_t_chain(k)

            # final stage: out slab s (uncollided — the new carry)
            @pl.when(s >= t_lo + 2)
            def _():
                out_dma(s - 2).wait()

            srcref, m_src = stage_ref(N - 1)
            is_last = s == t_hi - 1
            below = [jnp.where(s == t_lo, B[N - 1][-1][i],
                               srcref[(s - 1) % m_src, i, Ty - 1:Ty, :])
                     for i in range(Q)]
            above = [jnp.where(is_last, t_prev(N, 1)[i],
                               srcref[(s + 1) % m_src, i, 0:1, :])
                     for i in range(Q)]
            make_stage_slab(N, s, below, above,
                            jnp.logical_and(s == t_lo, fbe),
                            jnp.logical_and(is_last, fte),
                            collide_after=False)
            out_dma(s).start()
            return carry

        lax.fori_loop(t_lo, t_hi, loop, 0, unroll=False)
        if not ranged:
            if n_ty >= 2:
                out_dma(n_ty - 2).wait()
            out_dma(n_ty - 1).wait()
        else:
            @pl.when(t_hi - 2 >= t_lo)
            def _():
                out_dma(t_hi - 2).wait()
            out_dma(t_hi - 1).wait()

    kernel.scratch_shapes = (
        [pltpu.VMEM((4, Q, Ty, nxl), jnp.float32)]             # raw/stage-0
        + [pltpu.VMEM((3, Q, Ty, nxl), jnp.float32)
           for _ in range(N - 1)]                              # stages 1..N-1
        + [pltpu.VMEM((2, Q, Ty, nxl), jnp.float32),           # out slabs
           (pltpu.VMEM((M, Ty, nxl), jnp.float32) if has_solid
            else pltpu.VMEM((1, 8, 128), jnp.float32)),                       # mask slabs
           pltpu.VMEM((N - 1, Q, N, nxl), jnp.float32),        # top ghost rows
           pltpu.SemaphoreType.DMA((4,)),
           pltpu.SemaphoreType.DMA((2,)),
           pltpu.SemaphoreType.DMA((M,))]
        + ([pltpu.VMEM((M, cfg.bz_planes, Ty, nxl), jnp.float32),  # bouzidi q
            pltpu.SemaphoreType.DMA((M,))] if cfg.bz else [])
    )
    return _wrap_call(cfg, kernel, nyl, N, interpret, has_solid,
                      ranged=ranged)

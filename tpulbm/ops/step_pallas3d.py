"""Fused D3Q19 collide-stream Pallas kernel (single chip).

Same slab-pipeline idea as the 2-D kernels (ops/step_pallas.py) one
dimension up: the slab is a full z-plane (Q, ny, nx); the 4-slot plane ring
gives each output plane its z±1 collided neighbors; in-plane (y, x) pulls
are sublane/lane rolls with ghost sanitize at the physical edges. One HBM
read + one write of f per step.

Scope: the 3-D model family (flow past a sphere in a duct — BASELINE
config 5; the C++ reference is strictly 2-D, so there is no parity
constraint, only consistency with the jax tier, tested in interpret mode).
Single device (mesh (1,1)); plane must fit VMEM (ny*nx ≲ 27k cells at
Q=19); otherwise the chunk builder falls back to the jax tier.

Ghost semantics mirror ops/step_jax.make_step_rolled for 3-D: y/z
out-of-domain pulls read the frozen initial equilibrium; x out-of-domain
pulls read 0 unless the source also leaves y/z range (the 2-D reference
semantics carried over; all x-edge populations are overwritten by the
equilibrium inlet / zero-gradient outlet anyway).
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

# TPULBM_VMEM_MB overrides for experiments on parts with more VMEM.
_VMEM_BUDGET = int(float(os.environ.get("TPULBM_VMEM_MB", "13"))
                   * 1024 * 1024)


@dataclasses.dataclass(frozen=True)
class _Cfg3d:
    Q: int
    c: tuple           # ((cx, cy, cz), ...)
    w: tuple
    opp: tuple
    inv_tau: float
    omega_minus: float | None
    mrt_uv: tuple | None  # MRT rank-r correction (U rows, V rows)
    smag: float           # Smagorinsky Cs; 0 → plain BGK
    eq_in: tuple
    src: tuple | None
    has_solid: bool
    bounce_back: bool
    walls_y: bool
    walls_z: bool
    inlet_equilibrium: bool
    outlet_zero_grad: bool
    nz: int
    ny: int
    nx: int
    # power-law rheology (k, n); None → Newtonian
    plaw: tuple | None = None
    # regularized BGK (Hermite-shell projection of the non-equilibrium)
    reg: bool = False
    # fully periodic boxes (3-D Taylor-Green): the y/x rolls already wrap,
    # so periodicity just SKIPS the corresponding edge sanitize; z wraps
    # via two extra ring planes collided in-kernel (full-plane kernel:
    # zb/zt inputs; y-tiled kernel: zc scratch slabs fetched at the
    # prologue, n_sub == 1 + (my, 1) meshes only)
    periodic_x: bool = False
    periodic_y: bool = False
    periodic_z: bool = False
    # do wall/inlet/outlet strips need a solid-mask guard? (static geometry:
    # False when no solid cell touches a domain face — then the mask's only
    # consumer is the obstacle pinning, which solid-free tiles can skip)
    guard_bcs: bool = True
    # buffer-column positions of the physical x-edge cells (the x-sharded
    # tiled kernel centers the owned columns between halo regions)
    xl_col: int = 0
    xr_col: int = -1
    # Spatially varying body force (problem.force_fn, e.g. 3-D Kolmogorov
    # F_x(z) = F0·cos(κz)): evaluated IN-KERNEL per plane — yy/xx from
    # broadcasted_iota (+ per-tile global offsets in the y-tiled kernel),
    # zz the (traced) plane index. The force dict's domain dims are the
    # GLOBAL grid (ny_g/nx_g; the y-tiled kernel's cfg.ny/nx are buffer
    # dims Wy/Wx).
    force_fn: object = None
    ny_g: int = 0
    nx_g: int = 0
    # Bouzidi curved-wall obstacle BC (ops/bouzidi.py), y-tiled 1-step
    # kernel only: the per-link q table (bz_planes = Q, or 2Q when the
    # wall moves) rides the slab DMA pipeline next to the solid mask —
    # center rows only (halo-row BCs are dead at n_sub == 1). bz_active:
    # static per-direction any-cut-link flags (global mask).
    bz: bool = False
    bz_planes: int = 0
    bz_active: tuple | None = None


def _collide_planes(cfg: _Cfg3d, fw, solid, z0=None, y0=None, x0=None):
    """Generic-Q BGK/TRT relaxation of a list of Q same-shape blocks,
    plus the spatially varying force source when the problem has one
    (`z0`: global z of the plane — required iff cfg.force_fn is set;
    `y0`/`x0`: global coordinates of buffer cell (0, 0), for the y-tiled
    kernel whose planes are tile slabs rather than whole global planes)."""
    out = _collide_planes_core(cfg, fw, solid)
    if cfg.force_fn is None:
        return out
    shape = fw[0].shape
    # int32 iota cast to f32: Mosaic-on-silicon rejects a float tpu.iota
    # (round-4 on-TPU probe; interpret mode accepted it)
    yy = lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    xx = lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    if y0 is not None:
        yy = yy + jnp.asarray(y0, jnp.float32)
    if x0 is not None:
        xx = xx + jnp.asarray(x0, jnp.float32)
    zz = jnp.asarray(z0, jnp.float32)
    comps = tuple(cfg.force_fn({"xx": xx, "yy": yy, "zz": zz,
                                "nx": cfg.nx_g or cfg.nx,
                                "ny": cfg.ny_g or cfg.ny,
                                "nz": cfg.nz}))

    def live(comp):
        return not (isinstance(comp, (int, float)) and comp == 0.0)

    # S_i = 3 w_i (c_i · F(x)) post-relaxation, every cell incl. solids —
    # exactly the jax tier's _add_force_field (step_jax.py)
    for i in range(cfg.Q):
        tot = None
        for cc, comp in zip(cfg.c[i], comps):
            if cc and live(comp):
                t = comp if cc > 0 else -comp
                tot = t if tot is None else tot + t
        if tot is not None:
            out[i] = out[i] + (3.0 * cfg.w[i]) * tot
    return out


def _collide_planes_core(cfg: _Cfg3d, fw, solid):
    """Generic-Q BGK/TRT relaxation of a list of Q same-shape blocks."""
    Q = cfg.Q
    rho = fw[0]
    for i in range(1, Q):
        rho = rho + fw[i]
    mom = []
    for d in range(3):
        acc = None
        for i in range(Q):
            cid = cfg.c[i][d]
            if cid == 0:
                continue
            term = fw[i] if cid > 0 else -fw[i]
            acc = term if acc is None else acc + term
        mom.append(acc)
    inv_rho = 1.0 / rho
    u = [m * inv_rho for m in mom]
    base = 1.0 - 1.5 * (u[0] * u[0] + u[1] * u[1] + u[2] * u[2])
    out = [None] * Q
    if cfg.omega_minus is not None:
        hp, hm = 0.5 * cfg.inv_tau, 0.5 * cfg.omega_minus

    def cu_of(i):
        cx, cy, cz = cfg.c[i]
        cu = None
        for d, cd in enumerate((cx, cy, cz)):
            if cd == 0:
                continue
            term = u[d] if cd > 0 else -u[d]
            cu = term if cu is None else cu + term
        return cu

    def finish(i, fp):
        if cfg.src is not None and cfg.src[i]:
            fp = fp + cfg.src[i]
        if cfg.bounce_back:
            fp = jnp.where(solid, fw[i], fp)
        return fp

    if cfg.mrt_uv is not None:
        # MRT in rank-r form (physics.mrt_rank_correction):
        #   f_post = f − s_nu·dev − Σ_k U[:,k] (V[k]·dev),  dev = f − feq.
        # r = 10 for the D3Q19 default rates — ~2rQ + Q multiply-adds and
        # r running inner-product blocks instead of the dense form's Q²
        # terms / ~2Q live blocks (which overflowed Mosaic scoped vmem on
        # the 2-D padded x-tiled configs; same shape risk here).
        U, V = cfg.mrt_uv
        r = len(V)
        devs = []
        for i in range(Q):
            cu = cu_of(i)
            wr = cfg.w[i] * rho
            feq = wr * base if cu is None else wr * (base + 3.0 * cu
                                                     + 4.5 * cu * cu)
            devs.append(fw[i] - feq)
        t = [None] * r
        for j in range(Q):
            for k in range(r):
                vkj = V[k][j]
                if vkj == 0.0:
                    continue
                term = devs[j] if vkj == 1.0 else vkj * devs[j]
                t[k] = term if t[k] is None else t[k] + term
        for i in range(Q):
            fp = fw[i] - cfg.inv_tau * devs[i]
            for k in range(r):
                uik = U[i][k]
                if uik == 0.0 or t[k] is None:
                    continue
                fp = fp - uik * t[k]
            out[i] = finish(i, fp)
        return out

    if cfg.reg:
        # regularized BGK (physics.collide_regularized): replace the
        # non-equilibrium part by its second-Hermite-shell projection
        # (9/2) w_i Q_i:Π before relaxing; the six Π_ab components built
        # generically from the velocity set like the LES branch
        devs = []
        for i in range(Q):
            cu = cu_of(i)
            wr = cfg.w[i] * rho
            feq = wr * base if cu is None else wr * (base + 3.0 * cu
                                                     + 4.5 * cu * cu)
            devs.append(fw[i] - feq)
        pis = {}
        for a in range(3):
            for b in range(a, 3):
                acc = None
                for i in range(Q):
                    coef = cfg.c[i][a] * cfg.c[i][b]
                    if coef == 0:
                        continue
                    term = devs[i] if coef == 1 else (
                        -devs[i] if coef == -1 else coef * devs[i])
                    acc = term if acc is None else acc + term
                pis[(a, b)] = acc
        keep = 1.0 - cfg.inv_tau
        for i in range(Q):
            ci = cfg.c[i]
            proj = None
            for a in range(3):
                coeff = 4.5 * cfg.w[i] * (ci[a] * ci[a] - 1.0 / 3.0)
                term = coeff * pis[(a, a)]
                proj = term if proj is None else proj + term
            for a in range(3):
                for b in range(a + 1, 3):
                    g = 9.0 * cfg.w[i] * ci[a] * ci[b]
                    if g and pis[(a, b)] is not None:
                        proj = proj + g * pis[(a, b)]
            out[i] = finish(i, (fw[i] - devs[i]) + keep * proj)
        return out

    if cfg.plaw is not None:
        # BGK + power-law rheology (physics.power_law_inv_tau): per-cell
        # tau_eff solves tau = 1/2 + 3k γ̇(tau)^(n-1) by the shared
        # log-space Newton solver (physics.power_law_inv_tau_from_gfac)
        # on the non-equilibrium stress norm Q̄ (built generically from
        # the velocity set like the LES branch below).
        from .. import physics as _ph
        devs = []
        for i in range(Q):
            cu = cu_of(i)
            wr = cfg.w[i] * rho
            feq = wr * base if cu is None else wr * (base + 3.0 * cu
                                                     + 4.5 * cu * cu)
            devs.append(fw[i] - feq)
        ssum = None
        for a in range(3):
            for b in range(a, 3):
                acc = None
                for i in range(Q):
                    coef = cfg.c[i][a] * cfg.c[i][b]
                    if coef == 0:
                        continue
                    term = devs[i] if coef == 1 else (
                        -devs[i] if coef == -1 else coef * devs[i])
                    acc = term if acc is None else acc + term
                wgt = 1.0 if a == b else 2.0
                term = (acc * acc) if wgt == 1.0 else wgt * (acc * acc)
                ssum = term if ssum is None else ssum + term
        qbar = jnp.sqrt(2.0 * ssum)
        k, n = cfg.plaw
        inv_t = _ph.power_law_inv_tau_from_gfac(1.5 * qbar * inv_rho, k, n)
        for i in range(Q):
            out[i] = finish(i, fw[i] - inv_t * devs[i])
        return out

    if cfg.smag:
        # BGK + Smagorinsky LES (physics.smagorinsky_inv_tau): per-cell
        # tau_eff = (tau0 + sqrt(tau0² + 18 Cs² Q̄ / rho)) / 2, with
        # Q̄ = sqrt(2 Σ_ab Pi_ab²), Pi_ab = Σ_i c_ia c_ib dev_i — the six
        # Pi components built generically from the velocity set.
        devs = []
        for i in range(Q):
            cu = cu_of(i)
            wr = cfg.w[i] * rho
            feq = wr * base if cu is None else wr * (base + 3.0 * cu
                                                     + 4.5 * cu * cu)
            devs.append(fw[i] - feq)
        ssum = None
        for a in range(3):
            for b in range(a, 3):
                acc = None
                for i in range(Q):
                    coef = cfg.c[i][a] * cfg.c[i][b]
                    if coef == 0:
                        continue
                    term = devs[i] if coef == 1 else (
                        -devs[i] if coef == -1 else coef * devs[i])
                    acc = term if acc is None else acc + term
                wgt = 1.0 if a == b else 2.0
                term = (acc * acc) if wgt == 1.0 else wgt * (acc * acc)
                ssum = term if ssum is None else ssum + term
        qbar = jnp.sqrt(2.0 * ssum)
        tau0 = 1.0 / cfg.inv_tau
        inv_t = 2.0 / (tau0 + jnp.sqrt(
            tau0 * tau0 + (18.0 * cfg.smag * cfg.smag) * qbar * inv_rho))
        for i in range(Q):
            out[i] = finish(i, fw[i] - inv_t * devs[i])
        return out

    if cfg.omega_minus is not None:  # TRT (already pair-structured)
        for i in range(Q):
            cu = cu_of(i)
            wr = cfg.w[i] * rho
            f_o = fw[cfg.opp[i]]
            if cu is not None:
                even_dev = (fw[i] + f_o) - 2.0 * wr * (base + 4.5 * cu * cu)
                odd_dev = (fw[i] - f_o) - 6.0 * wr * cu
                fp = fw[i] - hp * even_dev - hm * odd_dev
            else:
                fp = fw[i] - cfg.inv_tau * (fw[i] - wr * base)
            out[i] = finish(i, fp)
        return out

    # BGK via ±direction pairs: feq_{±i} = s ± d with s = w rho (base +
    # 4.5 cu²), d = 3 w rho cu — shares the cu²/base work per pair, ~25%
    # fewer VPU ops than the direct form. This kernel family is
    # compute-bound (unlike the DMA-bound 2-D kernels, where the same
    # rewrite was measured perf-neutral and rejected for breaking bitwise
    # gates); the 3-D equivalence tests use rtol=5e-6, far above the
    # last-ulp rounding difference, and there is no C++ parity constraint
    # in 3-D (the reference is strictly 2-D).
    for i in range(Q):
        if out[i] is not None:
            continue
        j = cfg.opp[i]
        cu = cu_of(i)
        wr = cfg.w[i] * rho
        if cu is None:           # rest population (its own opposite)
            out[i] = finish(i, fw[i] - cfg.inv_tau * (fw[i] - wr * base))
            continue
        s = wr * (base + 4.5 * (cu * cu))
        d = (3.0 * wr) * cu
        out[i] = finish(i, fw[i] - cfg.inv_tau * (fw[i] - (s + d)))
        out[j] = finish(j, fw[j] - cfg.inv_tau * (fw[j] - (s - d)))
    return out


def _solid_touches_x_edges(problem: Problem) -> bool:
    """Solid cells on the inlet/outlet columns interact with the x-edge
    ghost sanitize in an order the 3-D kernels don't reproduce (a geometry
    outside the sphere-in-duct model family); such configs take the jax
    tier instead of silently diverging."""
    s = problem.solid
    return bool(s[..., 0].any() or s[..., -1].any())


def make_local_step_pallas3d(problem: Problem,
                             local_shape: tuple[int, ...],
                             interpret: bool | None = None):
    """Build step(f, mask) -> f_new for (Q, nz, ny, nx) f32 on one device.
    Returns None if a z-plane does not fit the VMEM budget."""
    lat = problem.lattice
    if lat.D != 3:
        raise ValueError("pallas3d requires a 3-D lattice")
    if problem.dtype != np.float32:
        raise ValueError("pallas backend is f32; use backend='jax' for f64")
    periodic3d = problem.periodic_y or problem.periodic_z
    if problem.periodic_x and not periodic3d:
        raise ValueError("the 3-D pallas kernels pin the physical x edges "
                         "every substep (non-periodic duct flow); "
                         "periodic_x needs backend='jax' (or a fully "
                         "periodic box)")
    if periodic3d and problem.solid is not None:
        raise ValueError("periodic 3-D boxes with obstacles run on the "
                         "jax tier")
    nz, ny, nx = local_shape
    Q = lat.Q
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not interpret and (nx % 128 or ny % 8):
        raise ValueError(f"pallas3d needs nx % 128 == 0 and ny % 8 == 0, "
                         f"got {ny}x{nx}")
    has_solid = problem.solid is not None
    if has_solid and _solid_touches_x_edges(problem):
        return None  # inlet/outlet-piercing solids: jax tier handles them
    plane_bytes = Q * ny * nx * 4
    # periodic_z holds FOUR extra Q-plane buffers: the two VMEM-resident
    # ring-plane inputs (zb/zt) plus their collided scratch (zc)
    usage = ((6 + (4 if problem.periodic_z else 0)) * plane_bytes
             + (4 * ny * nx * 4 if has_solid else 0))
    if usage > _VMEM_BUDGET or nz < 2:
        return None

    from .. import physics as _physics
    omega_minus = None
    mrt_uv = None
    if problem.collision == "trt":
        omega_minus = _physics.omega_minus_trt(1.0 / problem.params.tau,
                                               problem.trt_magic)
    elif problem.collision == "mrt":
        U, V = _physics.mrt_rank_correction(
            lat, 1.0 / problem.params.tau,
            overrides=dict(problem.mrt_rates) or None)
        mrt_uv = (tuple(tuple(float(v) for v in row) for row in U),
                  tuple(tuple(float(v) for v in row) for row in V))
    if problem.body_force:
        F = np.asarray(problem.body_force, np.float64)
        src = tuple(float(3.0 * lat.w[i] * (lat.c[i].astype(np.float64) @ F))
                    for i in range(Q))
    else:
        src = None
    cfg = _Cfg3d(
        Q=Q, c=tuple(tuple(int(v) for v in row) for row in lat.c),
        w=tuple(float(v) for v in lat.w),
        opp=tuple(int(v) for v in lat.opposite),
        inv_tau=1.0 / problem.params.tau, omega_minus=omega_minus,
        mrt_uv=mrt_uv,
        reg=problem.collision == "regularized",
        smag=float(problem.smagorinsky),
        plaw=(tuple(float(v) for v in problem.power_law)
              if problem.power_law else None),
        eq_in=tuple(float(v) for v in problem.ghost_ring_values()),
        src=src, has_solid=has_solid,
        bounce_back=has_solid and problem.obstacle_bc == "bounce_back",
        walls_y=problem.walls_y, walls_z=problem.walls_z,
        inlet_equilibrium=problem.inlet_equilibrium,
        outlet_zero_grad=problem.outlet_zero_grad,
        periodic_x=problem.periodic_x, periodic_y=problem.periodic_y,
        periodic_z=problem.periodic_z,
        force_fn=problem.force_fn,
        nz=nz, ny=ny, nx=nx)

    def kernel(*refs):
        if cfg.periodic_z:
            (f_ref, mask_ref, zb_ref, zt_ref, out_ref, fa, ob, msl, zc,
             sem_f, sem_ob, sem_m) = refs
        else:
            (f_ref, mask_ref, out_ref, fa, ob, msl,
             sem_f, sem_ob, sem_m) = refs
            zb_ref = zt_ref = zc = None
        def f_dma(z):
            return pltpu.make_async_copy(f_ref.at[:, z], fa.at[z % 4],
                                         sem_f.at[z % 4])

        def m_dma(z):
            return pltpu.make_async_copy(mask_ref.at[z], msl.at[z % 4],
                                         sem_m.at[z % 4])

        def out_dma(z):
            return pltpu.make_async_copy(ob.at[z % 2], out_ref.at[:, z],
                                         sem_ob.at[z % 2])

        def start_in(z):
            f_dma(z).start()
            if has_solid:
                m_dma(z).start()

        def wait_in(z):
            f_dma(z).wait()
            if has_solid:
                m_dma(z).wait()

        def collide_plane(z):
            # z is the (possibly traced) global plane index — the force
            # term needs it; the full-plane kernel runs (1,1)-mesh only,
            # so plane coordinates ARE global coordinates.
            slot = z % 4
            fw = [fa[slot, i] for i in range(Q)]
            solid = (msl[slot] > 0.5) if cfg.bounce_back else None
            fp = _collide_planes(cfg, fw, solid, z)
            for i in range(Q):
                fa[slot, i] = fp[i]

        eq_plane = [jnp.full((ny, nx), cfg.eq_in[i], jnp.float32)
                    for i in range(Q)]

        if cfg.periodic_z:
            # collide the wrapped ring planes (pre-collision f[nz-1], f[0])
            # once — the z-edge pulls read them like any interior neighbor.
            # Their force coordinates are the UNWRAPPED -1 / nz offsets
            # (jax-tier padded-block semantics; periodic force_fns wrap
            # them analytically).
            for blk, slot, z0 in ((zb_ref, 0, -1), (zt_ref, 1, nz)):
                fw = [blk[i] for i in range(Q)]
                fp = _collide_planes(cfg, fw, None, z0)
                for i in range(Q):
                    zc[slot, i] = fp[i]

        start_in(0)
        if nz > 1:
            start_in(1)
        wait_in(0)
        collide_plane(0)

        def loop(z, carry):
            @pl.when(z + 1 < nz)
            def _():
                wait_in(z + 1)
                collide_plane(z + 1)

            @pl.when(z + 2 < nz)
            def _():
                start_in(z + 2)

            oslot = z % 2

            @pl.when(z >= 2)
            def _():
                out_dma(z - 2).wait()

            cur = z % 4
            # ---- pull streaming: z via plane ring (frozen eq beyond the
            # physical z edges), y via sublane roll, x via lane roll ----
            for i in range(Q):
                cx, cy, cz = cfg.c[i]
                if cz == 0:
                    plane = fa[cur, i]
                elif cz > 0:
                    plane = fa[(z - 1) % 4, i]
                else:
                    plane = fa[(z + 1) % 4, i]
                if cy:
                    plane = pltpu.roll(plane, cy % ny, axis=0)
                if cx:
                    plane = pltpu.roll(plane, cx % nx, axis=1)
                ob[oslot, i] = plane

            # z-edge pulls: the unconditional pull above read a stale ring
            # slot there — fully overwritten under a scalar branch on the 2
            # edge planes. Walled ducts write the UNIFORM frozen eq
            # (roll-invariant); periodic boxes write the collided WRAPPED
            # plane, y/x-rolled exactly like an interior neighbor.
            def _z_edge_val(i, slot):
                if not cfg.periodic_z:
                    return eq_plane[i]
                cx, cy = cfg.c[i][0], cfg.c[i][1]
                pln = zc[slot, i]
                if cy:
                    pln = pltpu.roll(pln, cy % ny, axis=0)
                if cx:
                    pln = pltpu.roll(pln, cx % nx, axis=1)
                return pln

            @pl.when(z == 0)
            def _():
                for i in range(Q):
                    if cfg.c[i][2] > 0:
                        ob[oslot, i] = _z_edge_val(i, 0)

            @pl.when(z == nz - 1)
            def _():
                for i in range(Q):
                    if cfg.c[i][2] < 0:
                        ob[oslot, i] = _z_edge_val(i, 1)

            # ---- ghost sanitize (see module docstring) ----
            # x-edge columns are skipped when the inlet/outlet BC rewrites
            # the full column below: _solid_touches_x_edges guarantees no
            # solid on those columns, so the (possibly fluid-masked)
            # inlet/outlet overwrite covers every cell the sanitize would
            # have written — the strip writes are dead work in the hot loop.
            for i in range(Q):
                cx, cy, cz = cfg.c[i]
                if (cx and not cfg.periodic_x
                        and not (cfg.inlet_equilibrium if cx > 0
                                 else cfg.outlet_zero_grad)):
                    xc = 0 if cx > 0 else nx - 1
                    # x-edge ghost: 0, unless the source also left z range
                    if cz > 0:
                        val = jnp.where(z == 0, cfg.eq_in[i], 0.0)
                    elif cz < 0:
                        val = jnp.where(z == nz - 1, cfg.eq_in[i], 0.0)
                    else:
                        val = jnp.float32(0.0)
                    ob[oslot, i, :, xc:xc + 1] = jnp.broadcast_to(
                        val, (ny, 1)).astype(jnp.float32)
                if cfg.periodic_y or cfg.walls_y:
                    # periodic: the sublane roll already wrapped y; walls:
                    # the row sanitize is folded into the whole-Q wall
                    # store below (the bounce overwrites these rows; with a
                    # solid guard the solid-cell fallback is exactly this
                    # sanitized eq value)
                    continue
                if cy > 0:
                    ob[oslot, i, 0:1, :] = jnp.full((1, nx), cfg.eq_in[i],
                                                    jnp.float32)
                elif cy < 0:
                    ob[oslot, i, ny - 1:ny, :] = jnp.full((1, nx),
                                                          cfg.eq_in[i],
                                                          jnp.float32)

            def fluid_rows(rs, re, cs=None, ce=None):
                m = msl[cur, rs:re, :]
                if cs is not None:
                    m = m[:, cs:ce]
                return m < 0.5

            # ---- walls in y (rows) — ONE whole-Q (Q, 1, nx) store per
            # boundary row (the per-population sanitize stores above are
            # folded in; see the y-tiled kernel's wall_row for the
            # rationale — op-issue overhead on per-plane-per-step ops) ----
            if cfg.walls_y:
                def wall_row_fp(row, downstream):
                    rows = ob[oslot, :, row:row + 1, :]
                    guard = (fluid_rows(row, row + 1)[None]
                             if has_solid else None)
                    parts = []
                    for i in range(Q):
                        if downstream(cfg.c[i][1]):
                            v = rows[cfg.opp[i]:cfg.opp[i] + 1]
                            if guard is not None:
                                v = jnp.where(
                                    guard, v,
                                    jnp.full((1, 1, nx), cfg.eq_in[i],
                                             jnp.float32))
                        else:
                            v = rows[i:i + 1]
                        parts.append(v)
                    ob[oslot, :, row:row + 1, :] = jnp.concatenate(
                        parts, axis=0)

                wall_row_fp(0, lambda cy: cy > 0)
                wall_row_fp(ny - 1, lambda cy: cy < 0)

            # ---- walls in z (whole first/last output planes) ----
            if cfg.walls_z:
                fluid_plane = (msl[cur] < 0.5) if has_solid else None

                @pl.when(z == 0)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] > 0:
                            val = ob[oslot, cfg.opp[i]]
                            if has_solid:
                                val = jnp.where(fluid_plane, val, ob[oslot, i])
                            ob[oslot, i] = val

                @pl.when(z == nz - 1)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] < 0:
                            val = ob[oslot, cfg.opp[i]]
                            if has_solid:
                                val = jnp.where(fluid_plane, val, ob[oslot, i])
                            ob[oslot, i] = val

            # ---- equilibrium inlet, column 0 (ONE whole-Q store — these
            # strips run per plane per step; per-scalar fulls because a
            # captured f32[Q] constant is rejected by pallas_call) ----
            if cfg.inlet_equilibrium:
                val = jnp.concatenate(
                    [jnp.full((1, ny, 1), cfg.eq_in[i], jnp.float32)
                     for i in range(Q)], axis=0)
                if has_solid:
                    val = jnp.where(fluid_rows(0, ny, 0, 1)[None], val,
                                    ob[oslot, :, :, 0:1])
                ob[oslot, :, :, 0:1] = val

            # ---- zero-gradient outlet, column nx-1 ----
            if cfg.outlet_zero_grad:
                val = ob[oslot, :, :, nx - 2:nx - 1]
                if has_solid:
                    val = jnp.where(fluid_rows(0, ny, nx - 1, nx)[None], val,
                                    ob[oslot, :, :, nx - 1:nx])
                ob[oslot, :, :, nx - 1:nx] = val

            # ---- obstacle ----
            if has_solid:
                solid_p = msl[cur] > 0.5
                if cfg.bounce_back:
                    snap = [ob[oslot, i] for i in range(Q)]
                    for i in range(Q):
                        ob[oslot, i] = jnp.where(solid_p, snap[cfg.opp[i]],
                                                 ob[oslot, i])
                else:
                    for i in range(Q):
                        ob[oslot, i] = jnp.where(solid_p, cfg.w[i],
                                                 ob[oslot, i])

            out_dma(z).start()
            return carry

        lax.fori_loop(0, nz, loop, 0, unroll=False)
        if nz >= 2:
            out_dma(nz - 2).wait()
        out_dma(nz - 1).wait()

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # f (HBM)
        pl.BlockSpec(memory_space=pl.ANY),  # mask f32 (HBM)
    ]
    scratch = [
        pltpu.VMEM((4, Q, ny, nx), jnp.float32),
        pltpu.VMEM((2, Q, ny, nx), jnp.float32),
        (pltpu.VMEM((4, ny, nx), jnp.float32) if has_solid
         else pltpu.VMEM((1, 8, 128), jnp.float32)),
    ]
    if problem.periodic_z:
        # wrapped z ring planes (pre-collision f[nz-1], f[0]) + their
        # collided scratch
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        scratch.append(pltpu.VMEM((2, Q, ny, nx), jnp.float32))
    call = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nz, ny, nx), jnp.float32),
        scratch_shapes=scratch + [
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )

    zero_mask = np.zeros((nz, ny, nx), np.float32)

    def step(f, mask=None):
        if has_solid and mask is None:
            raise ValueError("pallas3d needs the solid mask")
        mask = jnp.asarray(zero_mask) if mask is None else mask
        if problem.periodic_z:
            return call(f, mask, f[:, nz - 1], f[:, 0])
        return call(f, mask)

    return step


def make_local_step_pallas3d_tiled(problem: Problem,
                                   local_shape: tuple[int, ...],
                                   n_sub: int = 1,
                                   interpret: bool | None = None,
                                   x_halo: bool = False):
    """y-tiled D3Q19 kernel with N-substep temporal blocking:
    step(f, rb, rt, flags, mask, mrb, mrt) -> f advanced n_sub steps.

    x_halo=True additionally stitches x-halo columns into the tile buffers
    (the 2-D x-tiled design, step_pallas_tiled.py, one dimension up), making
    the kernel fully x-SHARDABLE: shards get Hx = 128 halo columns per side
    from ring inputs rl/rr = halo.ring_cols_3d, the y-ring rows arrive
    extended across the halo regions (halo.ring_rows_ext_3d — diagonal
    corner data via two-phase exchange), and physical-x BCs (edge sanitize,
    equilibrium inlet, zero-gradient outlet) fire only on shards whose
    flags mark them at the global x edges. Each substep consumes one halo
    column of validity per side (trapezoid tiling); only the owned center
    columns are written back. step signature gains (rl, rr, ml, mr).

    Lifts the full-plane kernel's VMEM cap (ny*nx ≲ 27k cells) by tiling
    each z-plane along y — slabs are (Q, Ty + 2H, nx) with H = 8 halo rows
    per side (sublane alignment), fetched per tile; only the center Ty rows
    are written back (overlapped tiling, the 2-D x-tiled design one axis
    over). The same halo plumbing makes the kernel y-SHARDABLE: shard-edge
    tiles take their halo rows from ring inputs rb/rt = halo.ring_rows_3d.

    Temporal blocking runs the z-plane cascade n_sub deep: stage 0 collides
    raw tiles, stages 1..N-1 hold collided intermediates in 3-slot plane
    rings, the final stage streams into the output (uncollided carry). No
    ghost-row chains are needed, unlike the 2-D full-width kernels: the
    H-row y-overlap supplies N rows of trapezoid validity, x validity is
    pinned per substep by the edge sanitize + inlet/outlet, and the z ghost
    planes are the frozen equilibrium (a BGK fixed point) at every substep.
    HBM traffic per step falls to (1 + 2H/Ty reads + 1 write)/N of f — the
    lever for this DMA-bound kernel (~270 GB/s measured).

      f:      (Q, nz, nyl, nx) local block
      rb/rt:  (Q, nz, H, nx) ring rows
      flags:  (6,) int32 [is_bottom, is_top, is_left, is_right, y0, x0] —
              physical-edge flags (all zero for periodic boxes) + the
              shard's global offsets (consumed by in-kernel force coords)
      mask:   (nz, nyl, nx) f32; mrb/mrt: (nz, H, nx) mask ring rows

    Fully periodic boxes (Taylor-Green / 3-D Kolmogorov) are supported at
    n_sub == 1 on (my, 1) meshes: y wraps via the (periodic) ring rows, x
    via the native lane rolls, z via two wrapped ring planes fetched and
    collided at the prologue (zc scratch) — the tiled analog of the
    full-plane kernel's zb/zt inputs, lifting its ny*nx VMEM cap.

    Returns None when no y-tile fits VMEM, nz < n_sub + 1, n_sub > H, or
    an unsupported periodic combination (blocked / x-sharded).
    """
    lat = problem.lattice
    if lat.D != 3:
        raise ValueError("pallas3d requires a 3-D lattice")
    if problem.dtype != np.float32:
        raise ValueError("pallas backend is f32; use backend='jax' for 3-D f64")
    periodic3d = problem.periodic_y or problem.periodic_z
    # periodic_x WITHOUT y/z periodicity (a mixed-periodicity duct, e.g.
    # the 3-D Poiseuille square duct): supported by THIS kernel — x pulls
    # are native lane rolls over the full width (they wrap) or wrapped
    # ring columns in x_halo mode (halo.ring_cols periodic_x), and no
    # x-edge strip fires because the caller zeroes flags[2]/[3] on
    # periodic axes. The full-plane kernel keeps its gate; dispatch
    # routes ducts here.
    if periodic3d:
        # fully periodic boxes only (Taylor-Green / 3-D Kolmogorov): x
        # wraps natively (full-width lane rolls / wrapped ring columns),
        # y wraps via the ring rows (halo.ring_rows_3d periodic_y=True),
        # z via two wrapped ring planes collided in-kernel (zc scratch).
        if not (problem.periodic_x and problem.periodic_y
                and problem.periodic_z):
            raise ValueError("mixed-periodicity 3-D ducts run on the jax "
                             "tier (the tiled kernel wraps fully periodic "
                             "boxes only)")
        if problem.solid is not None:
            raise ValueError("periodic 3-D boxes with obstacles run on "
                             "the jax tier")
        if x_halo and n_sub == 1:
            # x-sharded periodic boxes run BLOCKED (the extended z sweep's
            # wrapped refetches ride the regular start_in path, x-halo
            # pieces included); the 1-step zc ring-plane scratch has no
            # x-piece DMAs, so depth 1 stays off this kernel. The sharded
            # dispatch tries the blocked splits first, so production
            # cadences never hit this.
            return None
    nz, nyl, nx = local_shape
    Q = lat.Q
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not interpret and nx % 128:
        raise ValueError(f"pallas3d needs nx % 128 == 0, got {nx}")
    has_solid = problem.solid is not None
    # inlet/outlet-piercing solids (VERDICT r4 #3e): supported here by
    # keeping the x-edge ghost sanitize alive on the pierced edge (the
    # skip below is only valid when the fluid-masked inlet/outlet rewrite
    # covers EVERY cell of the column) — static geometry facts
    solid_on_xl = bool(has_solid and problem.solid[..., 0].any())
    solid_on_xr = bool(has_solid and problem.solid[..., -1].any())
    bz = has_solid and problem.obstacle_bc == "bouzidi"
    if bz and n_sub > 1 and x_halo:
        # blocked bouzidi (q tiles widened to the full Wy buffer height,
        # halo rows via ring_rows_3d of the link table) composes with the
        # full-width (y-only) tiling. In x_halo mode the rewrite would also
        # need q halo COLUMNS (ring_cols_3d + extended corners); x-sharded
        # meshes run bouzidi fused at depth 1 instead.
        return None
    bz_planes = 0
    bz_active = None
    if bz:
        from .bouzidi import active_directions, link_tables
        bz_planes = int(link_tables(problem).shape[0])  # Q or 2Q (moving)
        bz_active = active_directions(problem)
    H = 8 if not interpret else max(2, n_sub)
    N = n_sub
    if N > H or nz < N + 1:
        return None
    # x-halo width: 128-lane aligned on TPU; tiny in interpret mode
    Hx = (128 if not interpret else max(2, n_sub)) if x_halo else 0
    Wx = nx + 2 * Hx
    M = N + 2               # mask plane ring

    def usage(wy, rs):
        # f-sized plane rings: rs raw slots + 3-slot stage rings + 2 out
        # (+ 2 wrapped-z collided ring planes for 1-step periodic boxes;
        # blocked periodic uses the extended sweep — no extra buffers;
        # + the M-slot bouzidi q-slab ring: center rows only at N == 1,
        # the full buffer height when blocked — halo-row BCs feed the
        # center during later substeps then)
        S = (rs + 3 * (N - 1) + 2
             + (2 if problem.periodic_z and N == 1 else 0))
        bz_wy = wy if N > 1 else wy - 2 * H
        return (S * Q * wy * Wx + (M * wy * Wx if has_solid else 0)
                + (M * bz_planes * bz_wy * nx if bz else 0)) * 4

    # Raw-ring slots: 4 gives 2-plane DMA prefetch depth; 3 trims one
    # f-sized plane buffer (1.5 MB at 256³/Ty=64), starting the next
    # plane's DMA only after stage 1 consumes its oldest slot. MEASURED at
    # 256³ on v5e (scoped-vmem hard limit 16.00 MB): the larger tile RS=3
    # unlocks LOSES — N=2/Ty=64/RS=3 = 2,172 MLUPS vs N=2/Ty=32/RS=4 =
    # 2,361 (wider live ranges out-cost the smaller overlap fraction) — so
    # the auto-pick stays RS=4-first-by-Ty; TPULBM_PALLAS3D_RS=3 keeps the
    # variant reachable for experiments.
    ty_env = os.environ.get("TPULBM_PALLAS3D_TY")
    if ty_env:
        # experimentation override: bypasses the VMEM-budget search (Mosaic
        # itself still rejects genuinely over-budget tiles)
        Ty = int(ty_env)
        if nyl % Ty or (not interpret and Ty % 8):
            raise ValueError(f"TPULBM_PALLAS3D_TY={Ty} must divide "
                             f"nyl={nyl} (and be a multiple of 8 on TPU)")
        RS = 4 if usage(Ty + 2 * H, 4) <= _VMEM_BUDGET else 3
    else:
        tys = sorted((t for t in range(1, nyl + 1)
                      if nyl % t == 0 and (interpret or t % 8 == 0)
                      and usage(t + 2 * H, 4) <= _VMEM_BUDGET), reverse=True)
        if not tys:
            return None
        Ty, RS = tys[0], 4
    rs_env = os.environ.get("TPULBM_PALLAS3D_RS")
    if rs_env:  # test/experiment override of the raw-ring slot count
        RS = int(rs_env)
        assert RS in (3, 4), RS
    Wy = Ty + 2 * H
    n_ty = nyl // Ty

    from .. import physics as _physics
    omega_minus = None
    mrt_uv = None
    if problem.collision == "trt":
        omega_minus = _physics.omega_minus_trt(1.0 / problem.params.tau,
                                               problem.trt_magic)
    elif problem.collision == "mrt":
        U, V = _physics.mrt_rank_correction(
            lat, 1.0 / problem.params.tau,
            overrides=dict(problem.mrt_rates) or None)
        mrt_uv = (tuple(tuple(float(v) for v in row) for row in U),
                  tuple(tuple(float(v) for v in row) for row in V))
    if problem.body_force:
        F = np.asarray(problem.body_force, np.float64)
        src = tuple(float(3.0 * lat.w[i] * (lat.c[i].astype(np.float64) @ F))
                    for i in range(Q))
    else:
        src = None
    # Static geometry facts (the mask is compile-time data), mirroring the
    # 2-D kernels' guard_bcs/slab_skip: if no solid touches a domain face
    # the BC strips need no mask guard, and tiles outside the solid's
    # (z, y) bounding box skip the mask DMAs + obstacle pinning entirely
    # (a 256³ sphere intersects only ~a quarter of the tiles).
    bounce_back = has_solid and problem.obstacle_bc == "bounce_back"
    guard3d = True
    zflags_np = np.ones((nz,), np.int32)
    solid_yrange = None
    if has_solid:
        s = problem.solid
        guard3d = bool(s[:, 0, :].any() or s[:, -1, :].any()
                       or s[0].any() or s[-1].any()
                       or solid_on_xl or solid_on_xr)
        zr = np.nonzero(s.any(axis=(1, 2)))[0]
        yr = np.nonzero(s.any(axis=(0, 2)))[0]
        # bouzidi cut links live at FLUID cells one cell outside the solid
        # bounding box — widen so their planes/tiles get the q + mask DMAs
        wide = 1 if bz else 0
        zflags_np = np.zeros((nz,), np.int32)
        if len(zr):
            zflags_np[max(zr.min() - wide, 0):zr.max() + 1 + wide] = 1
        solid_yrange = ((int(yr.min()) - wide, int(yr.max()) + wide)
                        if len(yr) else None)
    slab_skip = has_solid and not bounce_back and not guard3d

    cfg = _Cfg3d(
        Q=Q, c=tuple(tuple(int(v) for v in row) for row in lat.c),
        w=tuple(float(v) for v in lat.w),
        opp=tuple(int(v) for v in lat.opposite),
        inv_tau=1.0 / problem.params.tau, omega_minus=omega_minus,
        mrt_uv=mrt_uv,
        reg=problem.collision == "regularized",
        smag=float(problem.smagorinsky),
        plaw=(tuple(float(v) for v in problem.power_law)
              if problem.power_law else None),
        eq_in=tuple(float(v) for v in problem.ghost_ring_values()),
        src=src, has_solid=has_solid,
        bounce_back=bounce_back,
        walls_y=problem.walls_y, walls_z=problem.walls_z,
        inlet_equilibrium=problem.inlet_equilibrium,
        outlet_zero_grad=problem.outlet_zero_grad,
        periodic_x=problem.periodic_x, periodic_y=problem.periodic_y,
        periodic_z=problem.periodic_z,
        force_fn=problem.force_fn,
        ny_g=problem.params.ny, nx_g=problem.params.nx,
        bz=bz, bz_planes=bz_planes, bz_active=bz_active,
        nz=nz, ny=Wy, nx=Wx, guard_bcs=guard3d,
        xl_col=Hx, xr_col=Hx + nx - 1)
    # global-edge row/column positions inside the tile buffer
    yb, yt = H, H + Ty - 1
    xlc, xrc = cfg.xl_col, cfg.xr_col

    def kernel(flags_ref, zflags_ref, tyflags_ref, f_ref, rb_ref, rt_ref,
               *more):
        more = list(more)
        if x_halo:
            (rl_ref, rr_ref, mask_ref, mrb_ref, mrt_ref, ml_ref, mr_ref
             ) = more[:7]
            more = more[7:]
        else:
            mask_ref, mrb_ref, mrt_ref = more[:3]
            more = more[3:]
            rl_ref = rr_ref = ml_ref = mr_ref = None
        q_ref = more.pop(0) if cfg.bz else None
        qrb_ref = more.pop(0) if (cfg.bz and N > 1) else None
        qrt_ref = more.pop(0) if (cfg.bz and N > 1) else None
        out_ref, fa, *rest = more
        gs = list(rest[:N - 1])                       # stages 1..N-1
        (ob, msl, sem_fc, sem_fb, sem_ft, sem_ob, sem_m, sem_mb,
         sem_mt) = rest[N - 1:N + 8]
        extra = list(rest[N + 8:])
        sem_fx = extra.pop(0) if x_halo else None
        sem_mx = extra.pop(0) if (x_halo and has_solid) else None
        zc = extra.pop(0) if (cfg.periodic_z and N == 1) else None
        qsl = extra.pop(0) if cfg.bz else None
        sem_q = extra.pop(0) if cfg.bz else None
        sem_qb = extra.pop(0) if (cfg.bz and N > 1) else None
        sem_qt = extra.pop(0) if (cfg.bz and N > 1) else None
        fb, ft = flags_ref[0], flags_ref[1]
        fxl, fxr = flags_ref[2], flags_ref[3]
        tyi = pl.program_id(0)
        # Blocked periodic boxes run the EXTENDED sweep: iterate extended
        # plane indices e in [0, nz + 2N) == true planes [-N, nz + N),
        # with raw fetches wrapped through whbm() and output DMAs gated to
        # the true domain. Stage-k plane e is valid for e >= k (garbage
        # below feeds only garbage — stale-slot data, never a valid
        # output), so no eq ghosts and no wrapped-plane scratch are
        # needed: the 2N refetched planes supply the wrap directly.
        ext = N if (cfg.periodic_z and N > 1) else 0
        L = nz + 2 * ext

        def whbm(e):
            """HBM plane index for (possibly extended) sweep index e."""
            if ext == 0:
                return e
            return jnp.where(e < ext, e + (nz - ext),
                             jnp.where(e >= nz + ext, e - (nz + ext),
                                       e - ext))
        algn = 8 if not interpret else 1
        ya = pl.multiple_of(tyi * Ty, algn)
        ya_b = pl.multiple_of(tyi * Ty - H, algn)
        ya_t = pl.multiple_of(tyi * Ty + Ty, algn)
        at_bot = tyi == 0
        at_top = tyi == n_ty - 1
        # does THIS tile hold the physical bottom/top row
        gb = jnp.logical_and(at_bot, fb == 1)
        gt = jnp.logical_and(at_top, ft == 1)
        tyflag = tyflags_ref[tyi]
        # spatially varying force: flags[4]/flags[5] carry the shard's
        # global (y, x) offsets; buffer cell (r, b) of tile tyi is global
        # (flags[4] + tyi*Ty - H + r, flags[5] - Hx + b) — halo rows /
        # columns sit at the unwrapped out-of-range offsets, exactly what
        # the jax tier's padded block computes (periodic force_fns wrap
        # analytically).
        if cfg.force_fn is not None:
            y_k = flags_ref[4] + tyi * Ty - H
            x_k = flags_ref[5] - Hx
        else:
            y_k = x_k = None

        def plane_flag(z):
            """Does (tile tyi, plane z) intersect the solid bounding box?"""
            if not slab_skip:
                return None
            return jnp.logical_and(zflags_ref[z] == 1, tyflag == 1)

        def stage_ref(k):
            """(ref, n_slots) for stage-k planes (stage 0 = collided raw)."""
            return (fa, RS) if k == 0 else (gs[k - 1], 3)

        def fc_dma(z):
            return pltpu.make_async_copy(
                f_ref.at[:, whbm(z), pl.ds(ya, Ty), :],
                fa.at[z % RS, :, H:H + Ty, Hx:Hx + nx], sem_fc.at[z % RS])

        # y-ring rows span the FULL buffer width: in x_halo mode the ring
        # inputs arrive extended across the halo regions (ring_rows_ext_3d,
        # diagonal corner data), and the inner-variant corner pieces are
        # filled from rl/rr below.
        def fb_ring(z):
            return pltpu.make_async_copy(
                rb_ref.at[:, whbm(z)], fa.at[z % RS, :, 0:H, :],
                sem_fb.at[z % RS])

        def fb_inner(z):
            return pltpu.make_async_copy(
                f_ref.at[:, whbm(z), pl.ds(ya_b, H), :],
                fa.at[z % RS, :, 0:H, Hx:Hx + nx], sem_fb.at[z % RS])

        def ft_ring(z):
            return pltpu.make_async_copy(
                rt_ref.at[:, whbm(z)], fa.at[z % RS, :, H + Ty:Wy, :],
                sem_ft.at[z % RS])

        def ft_inner(z):
            return pltpu.make_async_copy(
                f_ref.at[:, whbm(z), pl.ds(ya_t, H), :],
                fa.at[z % RS, :, H + Ty:Wy, Hx:Hx + nx], sem_ft.at[z % RS])

        def x_pieces(z, src_l, src_r, tgt, slot, sems, lead):
            """(cond, copy) pairs for the 6 x-halo pieces of plane z: halo
            columns beside the center rows (always) and beside the y-halo
            rows (only when those rows were NOT covered by the full-width
            extended ring copy). Each piece has its own semaphore lane so
            starts and waits mirror exactly. `lead` = number of leading
            full dims (1 for the Q-carrying f arrays, 0 for masks)."""
            nb = jnp.logical_not(at_bot)
            nt = jnp.logical_not(at_top)

            def cp(k, src, rs, re, cs, ce, rows):
                # whbm: the blocked periodic extended sweep refetches
                # wrapped planes (identity whenever ext == 0)
                return pltpu.make_async_copy(
                    src.at[(slice(None),) * lead + (whbm(z), rows)],
                    tgt.at[(slot,) + (slice(None),) * lead
                           + (slice(rs, re), slice(cs, ce))],
                    sems.at[k, slot])

            return [
                (None, cp(0, src_l, H, H + Ty, 0, Hx, pl.ds(ya, Ty))),
                (None, cp(1, src_r, H, H + Ty, Hx + nx, Wx, pl.ds(ya, Ty))),
                (nb, cp(2, src_l, 0, H, 0, Hx, pl.ds(ya_b, H))),
                (nb, cp(3, src_r, 0, H, Hx + nx, Wx, pl.ds(ya_b, H))),
                (nt, cp(4, src_l, H + Ty, Wy, 0, Hx, pl.ds(ya_t, H))),
                (nt, cp(5, src_r, H + Ty, Wy, Hx + nx, Wx, pl.ds(ya_t, H))),
            ]

        def fx_pieces(z):
            return x_pieces(z, rl_ref, rr_ref, fa, z % RS, sem_fx, 1)

        def mx_pieces(z):
            return x_pieces(z, ml_ref, mr_ref, msl, z % M, sem_mx, 0)

        def _run_pieces(pieces, op):
            for cond, copy in pieces:
                fn = copy.start if op == "start" else copy.wait
                if cond is None:
                    fn()
                else:
                    pl.when(cond)(fn)

        def mc_dma(z):
            return pltpu.make_async_copy(
                mask_ref.at[z, pl.ds(ya, Ty), :],
                msl.at[z % M, H:H + Ty, Hx:Hx + nx], sem_m.at[z % M])

        def qc_dma(z):
            # bouzidi q slab: center rows only at N == 1 (halo-row BCs are
            # dead then); the full buffer height when blocked — the q tile
            # mirrors the mask tile, halo rows below/above
            if N == 1:
                return pltpu.make_async_copy(
                    q_ref.at[:, z, pl.ds(ya, Ty), :],
                    qsl.at[z % M], sem_q.at[z % M])
            return pltpu.make_async_copy(
                q_ref.at[:, z, pl.ds(ya, Ty), :],
                qsl.at[z % M, :, H:H + Ty, :], sem_q.at[z % M])

        def qb_ring(z):
            return pltpu.make_async_copy(
                qrb_ref.at[:, z], qsl.at[z % M, :, 0:H, :], sem_qb.at[z % M])

        def qb_inner(z):
            return pltpu.make_async_copy(
                q_ref.at[:, z, pl.ds(ya_b, H), :],
                qsl.at[z % M, :, 0:H, :], sem_qb.at[z % M])

        def qt_ring(z):
            return pltpu.make_async_copy(
                qrt_ref.at[:, z], qsl.at[z % M, :, H + Ty:Wy, :],
                sem_qt.at[z % M])

        def qt_inner(z):
            return pltpu.make_async_copy(
                q_ref.at[:, z, pl.ds(ya_t, H), :],
                qsl.at[z % M, :, H + Ty:Wy, :], sem_qt.at[z % M])

        def mb_ring(z):
            return pltpu.make_async_copy(
                mrb_ref.at[z], msl.at[z % M, 0:H, :], sem_mb.at[z % M])

        def mb_inner(z):
            return pltpu.make_async_copy(
                mask_ref.at[z, pl.ds(ya_b, H), :],
                msl.at[z % M, 0:H, Hx:Hx + nx], sem_mb.at[z % M])

        def mt_ring(z):
            return pltpu.make_async_copy(
                mrt_ref.at[z], msl.at[z % M, H + Ty:Wy, :], sem_mt.at[z % M])

        def mt_inner(z):
            return pltpu.make_async_copy(
                mask_ref.at[z, pl.ds(ya_t, H), :],
                msl.at[z % M, H + Ty:Wy, Hx:Hx + nx], sem_mt.at[z % M])

        def mask_op(z, fn):
            if not has_solid:
                return
            if slab_skip:
                pl.when(plane_flag(z))(fn)
            else:
                fn()

        def start_in(z):
            fc_dma(z).start()
            pl.when(at_bot)(lambda: fb_ring(z).start())
            pl.when(jnp.logical_not(at_bot))(lambda: fb_inner(z).start())
            pl.when(at_top)(lambda: ft_ring(z).start())
            pl.when(jnp.logical_not(at_top))(lambda: ft_inner(z).start())
            if x_halo:
                _run_pieces(fx_pieces(z), "start")

            def _masks():
                mc_dma(z).start()
                pl.when(at_bot)(lambda: mb_ring(z).start())
                pl.when(jnp.logical_not(at_bot))(lambda: mb_inner(z).start())
                pl.when(at_top)(lambda: mt_ring(z).start())
                pl.when(jnp.logical_not(at_top))(lambda: mt_inner(z).start())
                if x_halo:
                    _run_pieces(mx_pieces(z), "start")
                if cfg.bz:
                    qc_dma(z).start()
                    if N > 1:
                        pl.when(at_bot)(lambda: qb_ring(z).start())
                        pl.when(jnp.logical_not(at_bot))(
                            lambda: qb_inner(z).start())
                        pl.when(at_top)(lambda: qt_ring(z).start())
                        pl.when(jnp.logical_not(at_top))(
                            lambda: qt_inner(z).start())

            mask_op(z, _masks)

        def wait_in(z):
            fc_dma(z).wait()
            if x_halo:
                # ring and inner y-row variants copy different byte counts
                # here (the inner variant's corner bytes ride the x-piece
                # semaphores), so waits mirror the start branches exactly
                pl.when(at_bot)(lambda: fb_ring(z).wait())
                pl.when(jnp.logical_not(at_bot))(lambda: fb_inner(z).wait())
                pl.when(at_top)(lambda: ft_ring(z).wait())
                pl.when(jnp.logical_not(at_top))(lambda: ft_inner(z).wait())
                _run_pieces(fx_pieces(z), "wait")
            else:
                fb_ring(z).wait()
                ft_ring(z).wait()

            def _masks():
                mc_dma(z).wait()
                if x_halo:
                    pl.when(at_bot)(lambda: mb_ring(z).wait())
                    pl.when(jnp.logical_not(at_bot))(lambda: mb_inner(z).wait())
                    pl.when(at_top)(lambda: mt_ring(z).wait())
                    pl.when(jnp.logical_not(at_top))(lambda: mt_inner(z).wait())
                    _run_pieces(mx_pieces(z), "wait")
                else:
                    mb_ring(z).wait()
                    mt_ring(z).wait()
                if cfg.bz:
                    qc_dma(z).wait()
                    if N > 1:
                        # ring and inner variants move the same byte counts
                        # in full-width mode (blocked bz excludes x_halo),
                        # so one unconditional wait per side suffices
                        qb_ring(z).wait()
                        qt_ring(z).wait()

            mask_op(z, _masks)

        def out_dma(z):
            # extended sweep: true output plane z - ext (clamped — the
            # garbage-range copies are gated off by the caller and never
            # issued, but the index must stay in bounds for tracing)
            oz = z if ext == 0 else jnp.clip(z - ext, 0, nz - 1)
            return pltpu.make_async_copy(
                ob.at[z % 2, :, H:H + Ty, Hx:Hx + nx],
                out_ref.at[:, oz, pl.ds(ya, Ty), :], sem_ob.at[z % 2])

        # ---- wrapped-z ring planes (periodic boxes): raw slabs of planes
        # nz-1 / 0 fetched into zc[0]/zc[1] at the prologue (same center +
        # y-ring/inner + x-piece split as start_in, reusing semaphore
        # lanes 0/1 — nothing else is in flight at prologue start), then
        # collided in place with the UNWRAPPED force coordinates -1 / nz
        # (jax-tier padded-block semantics). ----
        def zc_start(slot, z):
            pltpu.make_async_copy(
                f_ref.at[:, z, pl.ds(ya, Ty), :],
                zc.at[slot, :, H:H + Ty, Hx:Hx + nx], sem_fc.at[slot]
            ).start()

            def ring_b():
                pltpu.make_async_copy(rb_ref.at[:, z],
                                      zc.at[slot, :, 0:H, :],
                                      sem_fb.at[slot]).start()

            def inner_b():
                pltpu.make_async_copy(f_ref.at[:, z, pl.ds(ya_b, H), :],
                                      zc.at[slot, :, 0:H, Hx:Hx + nx],
                                      sem_fb.at[slot]).start()

            def ring_t():
                pltpu.make_async_copy(rt_ref.at[:, z],
                                      zc.at[slot, :, H + Ty:Wy, :],
                                      sem_ft.at[slot]).start()

            def inner_t():
                pltpu.make_async_copy(f_ref.at[:, z, pl.ds(ya_t, H), :],
                                      zc.at[slot, :, H + Ty:Wy, Hx:Hx + nx],
                                      sem_ft.at[slot]).start()

            pl.when(at_bot)(ring_b)
            pl.when(jnp.logical_not(at_bot))(inner_b)
            pl.when(at_top)(ring_t)
            pl.when(jnp.logical_not(at_top))(inner_t)

        def zc_wait(slot, z):
            pltpu.make_async_copy(
                f_ref.at[:, z, pl.ds(ya, Ty), :],
                zc.at[slot, :, H:H + Ty, Hx:Hx + nx], sem_fc.at[slot]
            ).wait()
            # full-width mode: ring and inner y-row copies move the same
            # byte counts, so one unconditional wait per side suffices
            pltpu.make_async_copy(rb_ref.at[:, z], zc.at[slot, :, 0:H, :],
                                  sem_fb.at[slot]).wait()
            pltpu.make_async_copy(rt_ref.at[:, z],
                                  zc.at[slot, :, H + Ty:Wy, :],
                                  sem_ft.at[slot]).wait()

        def zc_collide(slot, z0):
            fw = [zc[slot, i] for i in range(Q)]
            fp = _collide_planes(cfg, fw, None, z0, y_k, x_k)
            for i in range(Q):
                zc[slot, i] = fp[i]

        def collide_a(z):
            slot = z % RS
            fw = [fa[slot, i] for i in range(Q)]
            solid = (msl[z % M] > 0.5) if cfg.bounce_back else None
            fp = _collide_planes(cfg, fw, solid, z - ext, y_k, x_k)
            for i in range(Q):
                fa[slot, i] = fp[i]

        eq_tile = [jnp.full((Wy, Wx), cfg.eq_in[i], jnp.float32)
                   for i in range(Q)]

        def apply_bcs(tgt, tslot, mslot, is_z0, is_zl, solid_flag=None,
                      fpost=None):
            """Per-substep BC sweep on tile tgt[tslot] (reference order:
            ghost sanitize → walls → inlet/outlet → obstacle)."""
            # ghost sanitize — x edges only on shards at the physical x
            # boundary (always true for full-width shards); y edges only on
            # the tile holding the physical boundary row. As in the
            # full-plane kernel, an x-edge column is skipped when the
            # inlet/outlet BC below rewrites it ENTIRELY — which needs the
            # column solid-free: with a piercing solid the fluid-masked
            # inlet/outlet leaves the solid cells to the sanitize + the
            # obstacle pass (the jax tier's order), so the strip stays live
            # on that edge (solid_on_xl / solid_on_xr, static).
            skip_xl = cfg.inlet_equilibrium and not solid_on_xl
            skip_xr = cfg.outlet_zero_grad and not solid_on_xr
            for i in range(Q):
                cx, cy, cz = cfg.c[i]
                if cx and not (skip_xl if cx > 0 else skip_xr):
                    # the 3-D jax tier's non-periodic x ghost columns hold
                    # the frozen ghost EQUILIBRIUM everywhere (halo.
                    # refresh_ring_3d phase X — the 2-D reference's zeroed
                    # E/W ghosts are a 2-D-only quirk), so a pull through
                    # them lands eq_in at every row and plane
                    xc = xlc if cx > 0 else xrc
                    fe = fxl if cx > 0 else fxr

                    @pl.when(fe == 1)
                    def _(i=i, xc=xc):
                        tgt[tslot, i, :, xc:xc + 1] = jnp.full(
                            (Wy, 1), cfg.eq_in[i], jnp.float32)
                if cy > 0 and not cfg.walls_y:
                    @pl.when(gb)
                    def _(i=i):
                        tgt[tslot, i, yb:yb + 1, :] = jnp.full(
                            (1, Wx), cfg.eq_in[i], jnp.float32)
                elif cy < 0 and not cfg.walls_y:
                    @pl.when(gt)
                    def _(i=i):
                        tgt[tslot, i, yt:yt + 1, :] = jnp.full(
                            (1, Wx), cfg.eq_in[i], jnp.float32)

            def fluid_rows(rs, re, cs=None, ce=None):
                m = msl[mslot, rs:re, :]
                if cs is not None:
                    m = m[:, cs:ce]
                return m < 0.5

            # walls in y (global boundary rows only) — ONE whole-Q
            # (Q, 1, Wx) store per boundary row instead of Q per-population
            # row stores. These run on every plane at every substep of the
            # N-cascade on gb/gt tiles, so (like the inlet/outlet strips —
            # see the round-4 note below) the op-issue overhead is
            # VPU-critical-path time. The ghost-sanitize row stores that
            # used to precede the bounce (eq into cy>0 rows at gb / cy<0 at
            # gt) are FOLDED in: without a mask guard the bounce overwrites
            # them entirely (they were dead stores); with a guard the
            # solid-cell fallback is exactly that sanitized eq value.
            if cfg.walls_y:
                def wall_row(row, downstream):
                    # downstream(cy) true for populations the wall reflects
                    rows = tgt[tslot, :, row:row + 1, :]
                    guard = (fluid_rows(row, row + 1)[None]
                             if has_solid and cfg.guard_bcs else None)
                    parts = []
                    for i in range(Q):
                        if downstream(cfg.c[i][1]):
                            v = rows[cfg.opp[i]:cfg.opp[i] + 1]
                            if guard is not None:
                                v = jnp.where(
                                    guard, v,
                                    jnp.full((1, 1, Wx), cfg.eq_in[i],
                                             jnp.float32))
                        else:
                            v = rows[i:i + 1]
                        parts.append(v)
                    tgt[tslot, :, row:row + 1, :] = jnp.concatenate(
                        parts, axis=0)

                pl.when(gb)(lambda: wall_row(yb, lambda cy: cy > 0))
                pl.when(gt)(lambda: wall_row(yt, lambda cy: cy < 0))

            # walls in z (whole first/last output planes)
            if cfg.walls_z:
                fluid_plane = ((msl[mslot] < 0.5)
                               if has_solid and cfg.guard_bcs else None)

                @pl.when(is_z0)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] > 0:
                            val = tgt[tslot, cfg.opp[i]]
                            if fluid_plane is not None:
                                val = jnp.where(fluid_plane, val,
                                                tgt[tslot, i])
                            tgt[tslot, i] = val

                @pl.when(is_zl)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] < 0:
                            val = tgt[tslot, cfg.opp[i]]
                            if fluid_plane is not None:
                                val = jnp.where(fluid_plane, val,
                                                tgt[tslot, i])
                            tgt[tslot, i] = val

            # equilibrium inlet, physical column xlc (global x = 0).
            # ONE whole-Q (Q, Wy, 1) store instead of Q per-population
            # column stores: these strips run on every plane at every
            # substep, and in the N-substep cascade (DMA amortized N×)
            # their op-issue overhead is VPU-critical-path time.
            if cfg.inlet_equilibrium:
                @pl.when(fxl == 1)
                def _():
                    # per-scalar fulls (a captured f32[Q] constant array is
                    # rejected by pallas_call) — the compiler folds the
                    # concat into one constant column
                    val = jnp.concatenate(
                        [jnp.full((1, Wy, 1), cfg.eq_in[i], jnp.float32)
                         for i in range(Q)], axis=0)
                    if has_solid and cfg.guard_bcs:
                        val = jnp.where(fluid_rows(0, Wy, xlc, xlc + 1)[None],
                                        val, tgt[tslot, :, :, xlc:xlc + 1])
                    tgt[tslot, :, :, xlc:xlc + 1] = val

            # zero-gradient outlet, physical column xrc (global x = nx-1)
            if cfg.outlet_zero_grad:
                @pl.when(fxr == 1)
                def _():
                    val = tgt[tslot, :, :, xrc - 1:xrc]
                    if has_solid and cfg.guard_bcs:
                        val = jnp.where(fluid_rows(0, Wy, xrc, xrc + 1)[None],
                                        val, tgt[tslot, :, :, xrc:xrc + 1])
                    tgt[tslot, :, :, xrc:xrc + 1] = val

            # obstacle (skipped on tiles outside the solid bounding box)
            if has_solid:
                def _obstacle():
                    solid_p = msl[mslot] > 0.5
                    if cfg.bz:
                        # Bouzidi cut-link rewrite (ops/bouzidi.
                        # apply_bouzidi, fused — the 2-D kernels' scheme
                        # one dimension up): per direction j a pointwise
                        # select between the q<1/2 interpolation (post-
                        # collision f̂_i + the post-STREAM plane i) and the
                        # q≥1/2 one, then rest-eq pin on the solid
                        # interior. N == 1: center rows only (halo-row BCs
                        # are dead). Blocked: the whole buffer height —
                        # halo-row post-BC values feed the center during
                        # later substeps, and the q tile carries halo rows
                        # (qb/qt DMAs) to match.
                        rs, re = (H, H + Ty) if N == 1 else (0, Wy)
                        cs, ce = Hx, Hx + nx
                        snap = [tgt[tslot, i][rs:re, cs:ce]
                                for i in range(Q)]
                        for j in range(Q):
                            if (cfg.bz_active is not None
                                    and not cfg.bz_active[j]):
                                continue
                            i = cfg.opp[j]
                            qj = qsl[mslot, j]
                            lt = (qj >= 0.0) & (qj < 0.5)
                            ge = qj >= 0.5
                            fpi = fpost(i)[rs:re, cs:ce]
                            val_lt = (2.0 * qj * fpi
                                      + (1.0 - 2.0 * qj) * snap[i])
                            inv2q = 1.0 / (2.0 * jnp.maximum(qj, 0.5))
                            val_ge = (inv2q * fpi + (1.0 - inv2q)
                                      * fpost(j)[rs:re, cs:ce])
                            if cfg.bz_planes == 2 * Q:  # moving wall
                                tw = qsl[mslot, Q + j]
                                val_lt = val_lt + 6.0 * tw
                                val_ge = val_ge + (6.0 * inv2q) * tw
                            tgt[tslot, j, rs:re, cs:ce] = jnp.where(
                                lt, val_lt,
                                jnp.where(ge, val_ge, snap[j]))
                        for i in range(Q):
                            tgt[tslot, i] = jnp.where(solid_p, cfg.w[i],
                                                      tgt[tslot, i])
                    elif cfg.bounce_back:
                        snap = [tgt[tslot, i] for i in range(Q)]
                        for i in range(Q):
                            tgt[tslot, i] = jnp.where(
                                solid_p, snap[cfg.opp[i]], tgt[tslot, i])
                    else:
                        for i in range(Q):
                            tgt[tslot, i] = jnp.where(solid_p, cfg.w[i],
                                                      tgt[tslot, i])
                if solid_flag is None:
                    _obstacle()
                else:
                    pl.when(solid_flag)(_obstacle)

        def make_stage_plane(k, idx, is_z0, is_zl, below_eq, above_eq,
                             collide_after=True):
            """Stage-k plane `idx` from stage k-1: pull-stream (z via plane
            ring with eq ghosts, y sublane roll, x lane roll) → BCs →
            collide (except the final stage, which is the new carry)."""
            srcref, m_src = stage_ref(k - 1)
            tgt, m_tgt = (ob, 2) if k == N else stage_ref(k)
            tslot = idx % m_tgt
            for i in range(Q):
                cx, cy, cz = cfg.c[i]
                if cz == 0:
                    plane = srcref[idx % m_src, i]
                elif cz > 0:
                    plane = (eq_tile[i] if below_eq is True
                             else srcref[(idx - 1) % m_src, i])
                else:
                    plane = (eq_tile[i] if above_eq is True
                             else srcref[(idx + 1) % m_src, i])
                if cy:
                    plane = pltpu.roll(plane, cy % Wy, axis=0)
                if cx:
                    plane = pltpu.roll(plane, cx % Wx, axis=1)
                tgt[tslot, i] = plane
            # z-edge ghost planes: UNIFORM eq (roll-invariant) for walled
            # ducts, the collided WRAPPED ring plane (zc, y/x-rolled like
            # an interior neighbor) for periodic boxes — fixed up under a
            # scalar branch taken on 2 of nz planes instead of a
            # per-element select on every interior plane. The
            # unconditional pull above may read a stale/uninitialized ring
            # slot at the edges — pure data, fully overwritten here.
            def _z_edge_val(i, slot):
                if not cfg.periodic_z or zc is None:
                    # walled ducts; also the (never-executed) edge branch
                    # bodies of the extended periodic sweep, where is_z0 /
                    # is_zl are constant-false and there is no zc scratch
                    return eq_tile[i]
                cx, cy = cfg.c[i][0], cfg.c[i][1]
                pln = zc[slot, i]
                if cy:
                    pln = pltpu.roll(pln, cy % Wy, axis=0)
                if cx:
                    pln = pltpu.roll(pln, cx % Wx, axis=1)
                return pln

            if below_eq is not True:
                @pl.when(is_z0)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] > 0:
                            tgt[tslot, i] = _z_edge_val(i, 0)
            if above_eq is not True:
                @pl.when(is_zl)
                def _():
                    for i in range(Q):
                        if cfg.c[i][2] < 0:
                            tgt[tslot, i] = _z_edge_val(i, 1)
            apply_bcs(tgt, tslot, idx % M, is_z0, is_zl,
                      solid_flag=plane_flag(idx),
                      fpost=((lambda i: srcref[idx % m_src, i])
                             if cfg.bz else None))
            if collide_after:
                fw = [tgt[tslot, i] for i in range(Q)]
                solid = (msl[idx % M] > 0.5) if cfg.bounce_back else None
                fp = _collide_planes(cfg, fw, solid, idx - ext, y_k, x_k)
                for i in range(Q):
                    tgt[tslot, i] = fp[i]

        false_ = jnp.asarray(False, jnp.bool_)

        if cfg.periodic_z and N == 1:
            # wrapped ring planes first (their semaphore lanes 0/1 are
            # reused by the regular prologue below, after the waits)
            zc_start(0, nz - 1)
            zc_start(1, 0)
            zc_wait(0, nz - 1)
            zc_collide(0, -1)
            zc_wait(1, 0)
            zc_collide(1, nz)

        # ---- prologue: raw planes 0..N-1 collided; stage-k planes
        # 0..N-k-1 (loop iteration z first needs stage-k plane z+N-k) ----
        for j in range(N):
            start_in(j)
        for j in range(N):
            wait_in(j)
            collide_a(j)
        for k in range(1, N):
            for j in range(N - k):
                make_stage_plane(k, j, jnp.asarray(j == 0, jnp.bool_),
                                 false_, below_eq=(j == 0), above_eq=False)
        if L > N:
            start_in(N)

        def loop(z, carry):
            @pl.when(z + N < L)
            def _():
                wait_in(z + N)
                collide_a(z + N)

            if RS == 4:
                # 2-plane prefetch: slot (z+N+1) % 4 is already free here
                @pl.when(z + N + 1 < L)
                def _():
                    start_in(z + N + 1)

            for k in range(1, N):
                idx = z + (N - k)

                @pl.when(idx < L)
                def _(k=k, idx=idx):
                    make_stage_plane(k, idx, jnp.asarray(False, jnp.bool_),
                                     false_ if ext else idx == nz - 1,
                                     below_eq=False, above_eq=False)

            if ext == 0:
                @pl.when(z >= 2)
                def _():
                    out_dma(z - 2).wait()

                make_stage_plane(N, z, z == 0, z == nz - 1, below_eq=False,
                                 above_eq=False, collide_after=False)
            else:
                # output DMAs exist only for true planes [0, nz): gate the
                # starts to z in [ext, nz+ext) and the waits to match (the
                # final two waits also land inside the loop — z-2 reaches
                # nz+ext-1 by z = L-1 since ext >= 2)
                @pl.when(jnp.logical_and(z >= ext + 2, z < nz + ext + 2))
                def _():
                    out_dma(z - 2).wait()

                make_stage_plane(N, z, false_, false_, below_eq=False,
                                 above_eq=False, collide_after=False)
            if RS == 3:
                # 3-slot raw ring: slot (z+N+1) % 3 holds raw plane z+N-2,
                # consumed by the deepest stage above — start its
                # replacement DMA only now (1-plane prefetch)
                @pl.when(z + N + 1 < L)
                def _():
                    start_in(z + N + 1)
            if ext == 0:
                out_dma(z).start()
            else:
                @pl.when(jnp.logical_and(z >= ext, z < nz + ext))
                def _():
                    out_dma(z).start()
            return carry

        lax.fori_loop(0, L, loop, 0,
                      unroll=int(os.environ.get("TPULBM_UNROLL", "1")))
        if ext == 0:
            if nz >= 2:
                out_dma(nz - 2).wait()
            out_dma(nz - 1).wait()

    scratch_shapes = (
        [pltpu.VMEM((RS, Q, Wy, Wx), jnp.float32)]           # raw/stage-0
        + [pltpu.VMEM((3, Q, Wy, Wx), jnp.float32)
           for _ in range(N - 1)]                            # stages 1..N-1
        + [pltpu.VMEM((2, Q, Wy, Wx), jnp.float32),          # out planes
           (pltpu.VMEM((M, Wy, Wx), jnp.float32) if has_solid
            else pltpu.VMEM((1, 8, 128), jnp.float32)),  # mask planes
           pltpu.SemaphoreType.DMA((RS,)),
           pltpu.SemaphoreType.DMA((RS,)),
           pltpu.SemaphoreType.DMA((RS,)),
           pltpu.SemaphoreType.DMA((2,)),
           pltpu.SemaphoreType.DMA((M,)),
           pltpu.SemaphoreType.DMA((M,)),
           pltpu.SemaphoreType.DMA((M,))]
    )
    if x_halo:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((6, RS)))  # f x-pieces
        if has_solid:
            scratch_shapes.append(pltpu.SemaphoreType.DMA((6, M)))
    if problem.periodic_z and N == 1:
        # wrapped-z collided ring planes (slabs of planes nz-1 / 0)
        scratch_shapes.append(pltpu.VMEM((2, Q, Wy, Wx), jnp.float32))
    if bz:
        # bouzidi q-slab ring (center rows at N == 1, full buffer height
        # + halo-row semaphores when blocked) + its DMA semaphores
        q_wy = Ty if N == 1 else Wy
        scratch_shapes += [pltpu.VMEM((M, bz_planes, q_wy, nx), jnp.float32),
                           pltpu.SemaphoreType.DMA((M,))]
        if N > 1:
            scratch_shapes += [pltpu.SemaphoreType.DMA((M,)),
                               pltpu.SemaphoreType.DMA((M,))]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # flags (4,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # zflags (nz,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tyflags (n_ty,)
        pl.BlockSpec(memory_space=pl.ANY),      # f
        pl.BlockSpec(memory_space=pl.ANY),      # rb
        pl.BlockSpec(memory_space=pl.ANY),      # rt
    ]
    if x_halo:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),  # rl
                     pl.BlockSpec(memory_space=pl.ANY)]  # rr
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),      # mask
        pl.BlockSpec(memory_space=pl.ANY),      # mrb
        pl.BlockSpec(memory_space=pl.ANY),      # mrt
    ]
    if x_halo:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),  # ml
                     pl.BlockSpec(memory_space=pl.ANY)]  # mr
    if bz:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # bouzidi q
        if n_sub > 1:
            in_specs += [pl.BlockSpec(memory_space=pl.ANY),  # q ring below
                         pl.BlockSpec(memory_space=pl.ANY)]  # q ring above

    call = pl.pallas_call(
        kernel,
        grid=(n_ty,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nz, nyl, nx), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )

    zero_mask = np.zeros((nz, nyl, nx), np.float32)
    zero_ring = np.zeros((nz, H, nx + 2 * Hx), np.float32)
    zero_cols = np.zeros((nz, nyl, Hx), np.float32)
    ones_ty = np.ones((n_ty,), np.int32)

    def step(f, rb, rt, flags, mask=None, mrb=None, mrt=None, tyflags=None,
             rl=None, rr=None, ml=None, mr=None, bzq=None, bzrb=None,
             bzrt=None):
        if has_solid and mask is None:
            raise ValueError("pallas3d needs the solid mask")
        mask = jnp.asarray(zero_mask) if mask is None else mask
        mrb = jnp.asarray(zero_ring) if mrb is None else mrb
        mrt = jnp.asarray(zero_ring) if mrt is None else mrt
        tyflags = jnp.asarray(ones_ty) if tyflags is None else tyflags
        bz_args = ()
        if bz:
            if bzq is None:
                raise ValueError("bouzidi pallas3d kernel needs the q table")
            bz_args = (bzq,)
            if N > 1:
                if bzrb is None or bzrt is None:
                    raise ValueError("blocked bouzidi pallas3d kernel needs "
                                     "q halo rings (bzrb/bzrt)")
                bz_args = (bzq, bzrb, bzrt)
        if not x_halo:
            return call(flags, jnp.asarray(zflags_np), tyflags, f, rb, rt,
                        mask, mrb, mrt, *bz_args)
        ml = jnp.asarray(zero_cols) if ml is None else ml
        mr = jnp.asarray(zero_cols) if mr is None else mr
        return call(flags, jnp.asarray(zflags_np), tyflags, f, rb, rt,
                    rl, rr, mask, mrb, mrt, ml, mr, *bz_args)

    step.halo_height = H
    step.halo_width = Hx
    step.x_halo = x_halo
    step.tile_height = Ty
    step.n_ty = n_ty
    step.depth = N
    step.solid_yrange = solid_yrange
    step.slab_skip = slab_skip
    return step

"""Pure physics kernels: moments, equilibrium, BGK collision, Guo forcing.

TPU-native equivalents of the reference's math layer:
  * equilibrium       ← LBMUtils.h:9-12 (scalar) / 22-65 (AVX2 SIMD) — here a
                        single vectorized jnp expression over all Q directions
                        at once (the VPU is the SIMD unit; no per-lane code).
  * forced equilibrium← LBMUtils.h:15-19, 68-121 (dead code in the reference;
                        live here — it drives the Poiseuille preset).
  * moments + BGK     ← LBMSolver.h:101-123 (the collision hot loop).

All functions are shape-polymorphic over the spatial dims: `f` is
(Q, *spatial) in SoA/population-major layout — the natural TPU layout (minor
dim = 128-lane axis). The reference's storage is actually cell-major AoS
(LBMGrid.h:105-107) despite its README claiming SoA; we use true SoA.

Everything is dtype-polymorphic; lattice constants are baked in as
compile-time constants.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .lattice import Lattice


def _wshape(lat: Lattice, ndim_spatial: int) -> tuple[int, ...]:
    return (lat.Q,) + (1,) * ndim_spatial


def moments(lat: Lattice, f: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Macroscopic density and velocity: rho = Σ_i f_i, u = Σ_i c_i f_i / rho.

    Parity: LBMSolver.h:101-109. Returns (rho: (*spatial,), u: (D, *spatial)).

    Written as explicit ±plane sums, NOT einsum: on TPU an einsum lowers to
    an MXU matmul at default (bfloat16) precision, silently costing ~3
    decimal digits per step; the velocity components are 0/±1 so exact adds
    are both correct and faster on the VPU.
    """
    rho = jnp.sum(f, axis=0)
    c = lat.c  # (Q, D) host ints
    comps = []
    for d in range(lat.D):
        acc = None
        for i in range(lat.Q):
            cid = int(c[i, d])
            if cid == 0:
                continue
            term = f[i] if cid > 0 else -f[i]
            acc = term if acc is None else acc + term
        comps.append(acc)
    return rho, jnp.stack(comps) / rho


def equilibrium(lat: Lattice, rho: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """BGK second-order equilibrium.

    f_eq_i = w_i * rho * (1 + 3 c_i·u + 4.5 (c_i·u)^2 - 1.5 u·u)
    Parity: LBMSolver.h:117-121 and LBMUtils.h:9-12.
    """
    dtype = rho.dtype
    c = lat.c                                    # (Q, D) host ints
    usq = jnp.sum(u * u, axis=0)                 # (*spatial,)
    base = 1.0 - 1.5 * usq
    planes = []
    for i in range(lat.Q):
        # c·u as exact ±adds (see moments() for why not einsum on TPU)
        cu = None
        for d in range(lat.D):
            cid = int(c[i, d])
            if cid == 0:
                continue
            term = u[d] if cid > 0 else -u[d]
            cu = term if cu is None else cu + term
        if cu is None:
            planes.append(lat.w[i] * rho * base)
        else:
            planes.append(lat.w[i] * rho * (base + 3.0 * cu + 4.5 * cu * cu))
    return jnp.stack(planes).astype(dtype)


def equilibrium_with_force(lat: Lattice, rho: jnp.ndarray, u: jnp.ndarray,
                           force: tuple[float, ...]) -> jnp.ndarray:
    """Equilibrium plus the reference's simplified Guo forcing term
    +3 w_i (c_i · F) (LBMUtils.h:15-19 — dead code there, live here)."""
    dtype = rho.dtype
    feq = equilibrium(lat, rho, u)
    c = lat.c.astype(np.float64)                 # (Q, D), host-side
    F = np.asarray(force, dtype=np.float64)
    cF = np.asarray(3.0 * lat.w * (c @ F))       # (Q,) host constant
    return feq + jnp.asarray(cF, dtype).reshape(_wshape(lat, rho.ndim))


def collide(lat: Lattice, f: jnp.ndarray, inv_tau: float,
            force: tuple[float, ...] = ()) -> jnp.ndarray:
    """BGK relaxation: f_post = f - (1/tau) (f - f_eq).  Parity: LBMSolver.h:117-123.

    Returns the post-collision populations; pointwise, so it is safe to apply
    on halo cells too (used by the sharded step, which collides the padded
    block so neighbors' post-collision edge values never travel over ICI).

    Body force: the source S_i = 3 w_i (c_i · F) is added *post-relaxation*,
    which injects exactly momentum F per step (Σ_i c_i S_i = F by lattice
    isotropy). The reference's dead-code variant folds the same term into the
    equilibrium (LBMUtils.h:15-19), which relaxation scales to an effective
    force F/tau — a tau-dependent bug we deliberately do not reproduce (that
    code never runs in the reference anyway); `equilibrium_with_force`
    preserves the literal formula for parity reference.
    """
    rho, u = moments(lat, f)
    feq = equilibrium(lat, rho, u)
    f_post = f - inv_tau * (f - feq)
    if force:
        c = lat.c.astype(np.float64)
        F = np.asarray(force, dtype=np.float64)
        src = np.asarray(3.0 * lat.w * (c @ F))  # (Q,) host constant
        f_post = f_post + jnp.asarray(src, f.dtype).reshape(_wshape(lat, rho.ndim))
    return f_post


def omega_minus_trt(inv_tau: float, magic: float = 3.0 / 16.0) -> float:
    """Odd-moment relaxation rate for TRT given the viscosity rate 1/tau and
    the 'magic parameter' Λ = (1/ω+ − ½)(1/ω− − ½). Λ = 3/16 places
    bounce-back walls exactly halfway along links and is the standard
    stability-optimal choice."""
    lam_plus = 1.0 / inv_tau - 0.5
    lam_minus = magic / lam_plus
    return 1.0 / (lam_minus + 0.5)


def collide_trt(lat: Lattice, f: jnp.ndarray, inv_tau: float,
                force: tuple[float, ...] = (),
                magic: float = 3.0 / 16.0) -> jnp.ndarray:
    """Two-relaxation-time collision (new capability — the reference is
    BGK-only). Even population parts f⁺ relax at 1/tau (sets viscosity, same
    as BGK); odd parts f⁻ relax at ω⁻ from the magic parameter. Markedly
    more stable than BGK as tau → 1/2 and degenerates to BGK when ω⁻ = 1/tau
    (Λ = λ⁺²).

        f_post = f − ω⁺ (f⁺ − feq⁺) − ω⁻ (f⁻ − feq⁻),
        g±_i = (g_i ± g_opp(i)) / 2.
    """
    rho, u = moments(lat, f)
    feq = equilibrium(lat, rho, u)
    opp = tuple(int(v) for v in lat.opposite)
    f_o = f[jnp.array(opp)]
    feq_o = feq[jnp.array(opp)]
    omega_p = inv_tau
    omega_m = omega_minus_trt(inv_tau, magic)
    # f - ω+ (f+ - feq+) - ω- (f- - feq-), with g± = (g ± g_opp)/2
    half_p = 0.5 * omega_p
    half_m = 0.5 * omega_m
    f_post = (f
              - half_p * ((f + f_o) - (feq + feq_o))
              - half_m * ((f - f_o) - (feq - feq_o)))
    if force:
        c = lat.c.astype(np.float64)
        F = np.asarray(force, dtype=np.float64)
        src = np.asarray(3.0 * lat.w * (c @ F))
        f_post = f_post + jnp.asarray(src, f.dtype).reshape(_wshape(lat, rho.ndim))
    return f_post


def rest_equilibrium(lat: Lattice, dtype=np.float64) -> np.ndarray:
    """Equilibrium at (rho=1, u=0) — just the weights. This is what the
    reference's solid cells hold forever in f_next (see note below)."""
    return lat.w.astype(dtype)


def uniform_equilibrium(lat: Lattice, rho: float, u: tuple[float, ...],
                        dtype=np.float64) -> np.ndarray:
    """Per-direction equilibrium values for a spatially uniform (rho, u) as a
    host-side (Q,) constant. Used for initialization (LBMGrid.h:185-246) and
    for the frozen ghost-ring values at global boundaries: the reference
    initializes ghost cells to equilibrium(1, U_in) and never updates them at
    physical domain edges (LBMGrid.h:188-213), so streaming at domain edges
    forever pulls these constants; we reproduce that exactly."""
    c = lat.c.astype(np.float64)
    uv = np.asarray(u, dtype=np.float64)
    cu = c @ uv
    usq = float(uv @ uv)
    feq = lat.w * rho * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * usq)
    return feq.astype(dtype)


def is_stable(f: jnp.ndarray, bound: float = 1e5) -> jnp.ndarray:
    """Global stability predicate: all populations finite and |f| < bound.

    Parity: LBMUtils.h:129-131 + LBMGrid.h:285-317. The reference runs this
    every timestep with an MPI_Allreduce; we evaluate it once per scan chunk
    (NaN/Inf persist under LBM arithmetic, so a chunk-end check gives the same
    abort guarantee at 1/output_frequency of the sync cost — SURVEY §7).
    """
    return jnp.all(jnp.isfinite(f) & (jnp.abs(f) < bound))


def max_velocity(lat: Lattice, f: jnp.ndarray,
                 solid: jnp.ndarray | None = None) -> jnp.ndarray:
    """max |u| over the domain (solids report u=0). Parity: LBMGrid.h:319-344."""
    rho, u = moments(lat, f)
    vel2 = jnp.sum(u * u, axis=0)
    if solid is not None:
        vel2 = jnp.where(solid, 0.0, vel2)
    return jnp.sqrt(jnp.max(vel2))

"""Momentum-exchange force evaluation on the obstacle.

TPU-native equivalent of IOManager::record_forces (LBMIO.h:114-192): the
reference loops over solid cells, finds in-rank fluid neighbors, and sums
2*c_i*f_next(fluid, i). Here the same sum is a handful of masked rolls:

    F = Σ_i 2 c_i Σ_x f_post_i(x) · fluid(x) · solid(x + c_i)

evaluated on the post-collision populations (reference calls it after
collision, before streaming — LBMSolver.h:51-54). Being expressed on global
arrays it is halo-correct by construction, fixing the reference's silent
undercounting at rank boundaries (bounds check LBMIO.h:143-145; SURVEY §5
deviation #2).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.base import Problem


def momentum_exchange(problem: Problem, f_post: jnp.ndarray,
                      solid: jnp.ndarray) -> jnp.ndarray:
    """Force vector (D,) on the obstacle from post-collision populations."""
    lat = problem.lattice
    c = lat.c
    ndim = f_post.ndim - 1
    fluid = ~solid
    comps = []
    for d in range(lat.D):
        total = jnp.zeros((), f_post.dtype)
        for i in range(1, lat.Q):
            cid = int(c[i, d])
            if cid == 0:
                continue
            # solid neighbor at x + c_i → roll solid by -c_i (array axes are
            # ([z,] y, x), velocity components are (x, y[, z])).
            shifts = tuple(-int(c[i, k]) for k in range(lat.D))[::-1]
            solid_shift = jnp.roll(solid, shifts, tuple(range(ndim)))
            # jnp.roll wraps; on non-periodic axes a solid cell touching a
            # domain edge must not pair with fluid on the opposite edge
            # (the reference bounds-checks instead, LBMIO.h:143-145).
            for axis, s in enumerate(shifts):
                if s == 0:
                    continue
                if axis == ndim - 1 and problem.periodic_x:
                    continue
                idx = [slice(None)] * ndim
                idx[axis] = 0 if s > 0 else -1
                solid_shift = solid_shift.at[tuple(idx)].set(False)
            contrib = jnp.sum(jnp.where(fluid & solid_shift, f_post[i], 0.0))
            total = total + 2.0 * cid * contrib
        comps.append(total)
    return jnp.stack(comps)


def force_coefficients(problem: Problem, force: np.ndarray) -> tuple[float, float]:
    """C_D, C_L.

    2-D: the reference normalization q = ½ ρ U² D per unit span,
    D = 2 * int(cylinder_radius * ny) cells (LBMIO.h:171-178 — note this
    uses the integer cell radius, the reference's quirk #4).

    3-D (sphere — no reference analog, the C++ code is strictly 2-D): the
    standard aerodynamic convention q = ½ ρ U² A with the frontal area
    A = π r², so the reported C_D is comparable to the sphere drag-curve
    literature (Schiller-Naumann et al.) rather than to the 2-D cylinder
    convention."""
    p = problem.params
    U = p.inlet_velocity
    r = float(p.get_cylinder_radius_cells())
    if problem.lattice.D == 3:
        area = np.pi * r * r
    else:
        area = 2.0 * r
    q = 0.5 * 1.0 * U * U * area
    if q <= 1e-12:
        return 0.0, 0.0
    return float(force[0] / q), float(force[1] / q)


def forces_fn(problem: Problem):
    """Jittable f -> force vector: collide then momentum-exchange, matching
    the reference's call point (post-collision, pre-streaming)."""
    from .step_jax import _collide_block
    solid_np = problem.solid

    def fn(f):
        solid = jnp.asarray(solid_np)
        f_post = _collide_block(
            problem, f, solid if problem.obstacle_bc == "bounce_back" else None)
        return momentum_exchange(problem, f_post, solid)

    return fn

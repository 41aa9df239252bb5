"""On-device diagnostics: macroscopic fields, stability, max velocity.

TPU-native equivalents of the reference's reductions (LBMGrid.h:285-344) and
the macroscopic-field bookkeeping its collision loop does on the side
(LBMSolver.h:111-114 + BC overrides at LBMSolver.h:203-205, 232-234,
260-261): we recompute moments from the current state once per output frame
instead of storing three extra field arrays every step — on TPU the extra
VPU flops are free next to the saved HBM traffic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import physics
from ..models.base import Problem


def fields_fn(problem: Problem):
    """Jittable f -> (rho, ux, uy[, uz]) with the reference's solid-cell
    overrides: u=0 and rho=1 at solids (LBMSolver.h:260-261; rho at solids is
    never updated from its 1.0 init in the reference)."""
    lat = problem.lattice
    solid_np = problem.solid

    def fn(f):
        if problem.shan_chen:
            # multiphase: the measurable momentum of the forced system is
            # the half-step-corrected u + F/(2rho) (Shan & Chen 1993) —
            # bare moments would be off by F/(2rho) at every interface cell
            from .step_multiphase import physical_velocity
            rho, u = physical_velocity(problem, f)
        else:
            rho, u = physics.moments(lat, f[:lat.Q])  # thermal stacks g under f
        if solid_np is not None:
            solid = jnp.asarray(solid_np)
            rho = jnp.where(solid, jnp.asarray(1.0, rho.dtype), rho)
            u = jnp.where(solid[None], jnp.asarray(0.0, u.dtype), u)
        return rho, u

    return fn


def stability_fn(problem: Problem):
    """Jittable f -> bool scalar (reference check_stability,
    LBMGrid.h:285-317, evaluated per chunk — see physics.is_stable)."""
    def fn(f):
        return physics.is_stable(f)
    return fn


def max_velocity_fn(problem: Problem):
    """Jittable f -> max |u| (reference max_velocity, LBMGrid.h:319-344)."""
    solid_np = problem.solid

    def fn(f):
        solid = None if solid_np is None else jnp.asarray(solid_np)
        lat = problem.lattice
        return physics.max_velocity(lat, f[:lat.Q], solid)

    return fn

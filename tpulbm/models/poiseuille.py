"""Poiseuille channel flow: body-force driven, periodic in x, walls in y.

The reference developed this on a separate branch (README.md:77-81, not in
the snapshot) and left its machinery behind as dead code — the forced
equilibrium (LBMUtils.h:15-19, 68-121) and `periodic_x` (LBMUtils.h:124-126).
Here it is a first-class model; the analytic parabola is the fast physics
gate (RMSE < 0.005, SURVEY §4).
"""
from __future__ import annotations

import numpy as np

from ..config import SimulationParams
from ..lattice import D2Q9
from .base import Problem


def make_problem(params: SimulationParams) -> Problem:
    force = tuple(params.body_force) or (1e-5, 0.0)
    return Problem(
        params=params,
        lattice=D2Q9,
        solid=None,
        init_rho=1.0,
        init_u=(0.0, 0.0),
        inlet_zou_he=False,
        outlet_zou_he=False,
        walls_y=True,
        periodic_x=True,
        body_force=force,
        obstacle_bc=params.obstacle_bc,
    )


def analytic_profile(params: SimulationParams) -> np.ndarray:
    """Steady-state analytic ux(y) for the body-force driven channel.

    With full-way bounce-back applied *on* the boundary nodes (the reference's
    wall scheme, LBMSolver.h:153-176), the effective no-slip walls sit half a
    link outside the boundary nodes: y_wall = -0.5 and ny-0.5, channel width
    H = ny. u(y) = F/(2 nu) * (y - y_lo)(y_hi - y) for node centers y.
    """
    ny = params.ny
    nu = params.nu()
    F = params.body_force[0] if params.body_force else 1e-5
    y = np.arange(ny, dtype=np.float64)
    y_lo, y_hi = -0.5, ny - 0.5
    return F / (2.0 * nu) * (y - y_lo) * (y_hi - y)

"""Lid-driven square cavity: bounce-back walls on three sides, a moving
lid (+x) on top. The canonical wall-bounded LBM validation problem — no
reference analog (the reference hard-codes the cylinder channel,
LBMGrid.h:104-127); validated here against the Ghia, Ghia & Shin (1982)
benchmark structure (centerline extrema, tests/test_cavity.py).

Conventions: Re = U_lid * (nx - 1) / nu — the reference-style wall BC
rewrites all inward populations at the boundary NODES, pinning u ~ 0 at
the nodes themselves (measured on Poiseuille: wall at node +- 0.01 of a
cell, models/poiseuille.py), so the cavity side length is nx - 1 cells.
`inlet_velocity` doubles as the lid speed (the single velocity scale of
the problem, mirroring how the reference reuses its one inlet speed).
"""
from __future__ import annotations

from ..config import SimulationParams
from ..lattice import D2Q9
from .base import Problem


def tau_for_cavity_reynolds(re: float, u_lid: float, nx: int) -> float:
    """tau with nu = u_lid * (nx - 1) / re and nu = (tau - 1/2)/3."""
    return 3.0 * u_lid * (nx - 1) / re + 0.5


def make_problem(params: SimulationParams) -> Problem:
    if params.is_3d:
        raise ValueError("the cavity model is 2-D (set nz=0)")
    if params.nx != params.ny:
        raise ValueError(
            f"the cavity model is a square: nx ({params.nx}) must equal "
            f"ny ({params.ny})")
    return Problem(
        params=params,
        lattice=D2Q9,
        solid=None,
        init_rho=1.0,
        init_u=(0.0, 0.0),
        inlet_zou_he=False,
        outlet_zou_he=False,
        walls_y=True,
        walls_x=True,
        lid_u=params.inlet_velocity,
        closed_box=True,
        periodic_x=False,
        body_force=tuple(params.body_force),
        obstacle_bc=params.obstacle_bc,
        collision=params.collision,
        smagorinsky=params.smagorinsky,
        power_law=params.power_law() or (),
        trt_magic=params.trt_magic,
        mrt_rates=params.mrt_rates,
    )

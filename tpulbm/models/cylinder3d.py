"""3-D flow past a sphere in a duct (D3Q19) — new capability.

The reference is strictly 2-D; this is the BASELINE.json stretch config
("D3Q19 3D cylinder/sphere flow"). BCs: equilibrium inlet, zero-gradient
outlet, bounce-back walls in y and z. No Zou-He here (its 2-D algebra does
not generalize directly); documented deviation — there is no reference
behavior to match.
"""
from __future__ import annotations

from ..config import SimulationParams
from ..geometry import sphere_mask
from ..lattice import D3Q19, D3Q27
from .base import Problem


def _sphere_sdf(params: SimulationParams):
    """Analytic sphere surface for the Bouzidi curved-wall mode (positive
    outside; matches geometry.sphere_mask's inclusive voxelization)."""
    import numpy as np
    cx, cy = params.get_cylinder_x(), params.get_cylinder_y()
    cz = params.nz // 2
    r = float(params.get_cylinder_radius_cells())

    def sdf(pts):
        return np.sqrt((pts[..., 0] - cx) ** 2 + (pts[..., 1] - cy) ** 2
                       + (pts[..., 2] - cz) ** 2) - r

    return sdf


def make_problem(params: SimulationParams) -> Problem:
    if not params.is_3d:
        raise ValueError("cylinder3d requires nz > 0")
    return Problem(
        params=params,
        lattice=D3Q27 if params.lattice3d == "d3q27" else D3Q19,
        solid=sphere_mask(params),
        obstacle_sdf=_sphere_sdf(params),
        init_rho=1.0,
        init_u=(params.inlet_velocity, 0.0, 0.0),
        inlet_equilibrium=True,
        outlet_zero_grad=True,
        walls_y=True,
        walls_z=True,
        periodic_x=False,
        body_force=tuple(params.body_force),
        obstacle_bc=params.obstacle_bc,
        collision=params.collision,
        smagorinsky=params.smagorinsky,
        power_law=params.power_law() or (),
        trt_magic=params.trt_magic,
        mrt_rates=params.mrt_rates,
    )

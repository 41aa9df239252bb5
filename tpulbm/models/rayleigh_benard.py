"""Rayleigh-Bénard convection: a fluid layer heated from below between two
no-slip plates, periodic in x — the canonical thermal-LBM benchmark.

Double-population method: D2Q9 carries the flow, D2Q5 carries temperature
as an advected-diffused scalar (physics.thermal_equilibrium), coupled by
the Boussinesq buoyancy force F_y = buoyancy · (T − t_ref). No reference
analog — the reference is strictly isothermal (its only model is the
cylinder channel, LBMGrid.h:104-127).

Nondimensional control parameters (H = ny − 1, the wall-node gap):

    Ra = buoyancy · ΔT · H³ / (nu · alpha)      (Rayleigh number)
    Pr = nu / alpha                             (Prandtl number)

Onset of convection at Ra_c = 1707.76 (free parameter-free physics gate,
tests/test_thermal.py); Nu(Ra) against the Clever & Busse (1974) data.
"""
from __future__ import annotations

from ..config import SimulationParams
from ..lattice import D2Q5, D2Q9
from .base import Problem, ThermalConfig


def effective_height(params: SimulationParams) -> float:
    """Plate gap H in lattice units. The thermal step's walls (full-way
    bounce-back returning the node's own post-collision outward
    populations + half-link anti-bounce-back Dirichlet for T,
    ops/step_thermal.py) sit half a link OUTSIDE the boundary nodes on
    each side, so H = ny — measured via the convection onset: with this
    H the discrete critical Rayleigh number lands within ~2% of the
    theoretical Ra_c = 1707.76 (tests/test_thermal.py), while H = ny-1
    misplaces it by ~8%."""
    return float(params.ny)


def buoyancy_for_rayleigh(ra: float, params: SimulationParams) -> float:
    """Boussinesq coefficient beta·g giving the requested Rayleigh number
    on this grid: buoyancy = Ra · nu · alpha / (ΔT · H³)."""
    nu = params.nu()
    alpha = (params.thermal_tau - 0.5) / 3.0
    dt = params.t_hot - params.t_cold
    return ra * nu * alpha / (dt * effective_height(params) ** 3)


def make_problem(params: SimulationParams) -> Problem:
    if params.is_3d:
        raise ValueError("the rayleigh-benard model is 2-D (set nz=0)")
    if params.thermal_tau <= 0.5:
        raise ValueError(
            f"rayleigh-benard needs thermal_tau > 0.5 (alpha > 0), got "
            f"{params.thermal_tau}")
    buoyancy = params.buoyancy
    if not buoyancy and params.rayleigh:
        buoyancy = buoyancy_for_rayleigh(params.rayleigh, params)
    # "heated-cavity" = the de Vahl Davis (1983) differentially heated
    # square cavity, ROTATED into this module's frame so the Dirichlet
    # machinery carries over: the hot/cold walls stay the y walls, the
    # formerly-periodic x direction becomes adiabatic no-slip walls, and
    # gravity acts along −x (buoyancy force +x on hot fluid, axis 0).
    cavity = params.problem == "heated-cavity"
    thermal = ThermalConfig(
        lattice=D2Q5,
        tau_g=params.thermal_tau,
        t_bottom=params.t_hot,
        t_top=params.t_cold,
        buoyancy=buoyancy,
        buoyancy_axis=0 if cavity else 1,
        # the side-heated base state is already convective (no onset
        # bifurcation) — no seed mode needed
        perturb=0.0 if cavity else ThermalConfig.perturb,
    )
    return Problem(
        params=params,
        lattice=D2Q9,
        solid=None,
        init_rho=1.0,
        init_u=(0.0, 0.0),
        inlet_zou_he=False,
        outlet_zou_he=False,
        walls_y=True,
        walls_x=cavity,
        periodic_x=not cavity,
        # NOT closed_box: the runner's mass gauge rescales the whole state,
        # which is exact only for homogeneous steps — the buoyancy source
        # is affine in T (the −t_ref offset), so rescaling would not be a
        # gauge here. Wall mass drift is ~1e-6/step relative and the
        # benchmark quantities (onset, Nu) are insensitive to it.
        closed_box=False,
        body_force=(),
        collision=params.collision,
        smagorinsky=params.smagorinsky,
        thermal=thermal,
    )

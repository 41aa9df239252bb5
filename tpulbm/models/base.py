"""Problem definition: lattice + geometry + boundary-condition layout.

The reference hard-codes one problem (cylinder in a channel) across
LBMGrid/LBMSolver; here a `Problem` bundles everything the step kernels need,
so cylinder / Poiseuille / 3-D flows share one engine (SURVEY §2 C2, §7).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import SimulationParams
from ..lattice import Lattice
from .. import physics


@dataclasses.dataclass(frozen=True)
class Problem:
    """Static description of one simulation setup.

    Masks are host NumPy (they are compile-time constants for the kernels);
    `solid` may be None when there is no obstacle.
    """

    params: SimulationParams
    lattice: Lattice
    solid: np.ndarray | None          # bool, (*spatial) in (…, ny, nx) order
    init_rho: float = 1.0
    init_u: tuple[float, ...] = (0.0, 0.0)
    # Boundary-condition layout
    inlet_zou_he: bool = False        # Zou-He velocity inlet at x=0 (LBMSolver.h:179-207)
    outlet_zou_he: bool = False       # Zou-He pressure outlet at x=nx-1 (LBMSolver.h:210-236)
    inlet_equilibrium: bool = False   # simple equilibrium inlet (3-D model)
    outlet_zero_grad: bool = False    # zero-gradient outlet (3-D model)
    walls_y: bool = True              # bounce-back walls at y extremes (LBMSolver.h:153-176)
    walls_z: bool = False
    walls_x: bool = False             # bounce-back walls at x extremes (cavity)
    lid_u: float = 0.0                # moving-lid speed (+x) at the top wall (cavity)
    closed_box: bool = False          # no open BCs: runner renormalizes total mass
    periodic_x: bool = False
    body_force: tuple[float, ...] = ()
    obstacle_bc: str = "equilibrium"  # see ops/step_jax.py for semantics
    collision: str = "bgk"            # "bgk" | "trt" | "mrt" (physics.collide_*)
    clean_corners: bool = False       # Zou-He corner closure (2-D; opt-in)
    trt_magic: float = 3.0 / 16.0
    mrt_rates: tuple = ()             # ((moment, rate), ...) ghost overrides
    smagorinsky: float = 0.0          # LES constant Cs (physics.smagorinsky_inv_tau)

    @property
    def spatial_shape(self) -> tuple[int, ...]:
        p = self.params
        return (p.nz, p.ny, p.nx) if p.is_3d else (p.ny, p.nx)

    @property
    def dtype(self):
        return np.float64 if self.params.precision == "f64" else np.float32

    def ghost_ring_values(self) -> np.ndarray:
        """(Q,) per-direction values held by out-of-domain ghost cells.

        Parity: the reference initializes ghost cells to equilibrium(rho=1,
        u=inlet) and never updates them at physical domain edges
        (LBMGrid.h:185-213), so streaming at domain edges pulls these frozen
        constants forever. We reproduce that as the padded ring / sanitize
        values.
        """
        return physics.uniform_equilibrium(
            self.lattice, self.init_rho, self.init_u, dtype=self.dtype)

    def initial_state(self) -> np.ndarray:
        """(Q, *spatial) initial populations: uniform equilibrium(1, init_u),
        with solid cells at rest equilibrium. Parity: LBMGrid.h:185-246."""
        Q = self.lattice.Q
        feq = self.ghost_ring_values()
        f = np.broadcast_to(
            feq.reshape((Q,) + (1,) * len(self.spatial_shape)),
            (Q,) + self.spatial_shape).copy()
        if self.solid is not None:
            rest = physics.rest_equilibrium(self.lattice, self.dtype)
            f[:, self.solid] = rest[:, None]
        return f

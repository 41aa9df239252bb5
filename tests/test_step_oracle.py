"""Golden test: the JAX rolled step vs an independent loop-based NumPy oracle
that mirrors the reference's buffers and loop structure literally
(LBMSolver.h:48-265, LBMGrid.h:185-246). Run in f64 on a small cylinder grid.

The oracle keeps the reference's two ghost-padded buffers, skips solids in
collision (so f_next at solids stays frozen rest equilibrium — the
reference's effective "equilibrium wall", SURVEY §2 C20 note), streams with a
pull loop, and applies BCs in reference order. Our state is compared on
fluid cells; at solid cells our state holds rest equilibrium by construction
while the reference holds dynamically-dead swapped values (documented
deviation — the physics is identical).
"""
import jax
import numpy as np

from tpulbm.config import SimulationParams
from tpulbm.lattice import D2Q9
from tpulbm.models import make_problem
from tpulbm.ops import forces as forces_mod
from tpulbm.ops.step_jax import make_step_rolled
from tpulbm import physics

C = np.array(D2Q9.velocities)
W = np.array(D2Q9.w)
OPP = np.array(D2Q9.opposite)


def eq(rho, ux, uy):
    out = np.empty(9)
    usq = ux * ux + uy * uy
    for i in range(9):
        cu = C[i, 0] * ux + C[i, 1] * uy
        out[i] = W[i] * rho * (1 + 3 * cu + 4.5 * cu * cu - 1.5 * usq)
    return out


class Oracle:
    """Literal re-creation of the reference solver on one rank, in NumPy."""

    def __init__(self, params: SimulationParams, solid: np.ndarray):
        self.p = params
        ny, nx = params.ny, params.nx
        self.solid = solid
        self.f_curr = np.empty((ny + 2, nx + 2, 9))
        self.f_curr[:, :] = eq(1.0, params.inlet_velocity, 0.0)
        for (y, x) in zip(*np.nonzero(solid)):
            self.f_curr[y + 1, x + 1] = eq(1.0, 0.0, 0.0)
        self.f_next = self.f_curr.copy()

    def collision(self):
        p = self.p
        inv_tau = 1.0 / p.tau
        for y in range(p.ny):
            for x in range(p.nx):
                if self.solid[y, x]:
                    continue  # LBMSolver.h:91 — f_next at solids stays frozen
                fc = self.f_curr[y + 1, x + 1]
                rho = fc.sum()
                ux = (C[:, 0] * fc).sum() / rho
                uy = (C[:, 1] * fc).sum() / rho
                self.f_next[y + 1, x + 1] = fc - inv_tau * (fc - eq(rho, ux, uy))

    def exchange_ghost_cells(self):
        """Single-rank ghost exchange, mirroring the reference exactly:
        unpack_ghost_cells copies the east/west recv buffers UNCONDITIONALLY
        (LBMGrid.h:448-466) even though nothing was received from
        MPI_PROC_NULL, so the zero-initialized buffers wipe the E/W ghost
        columns (interior rows) of f_next every step. N/S ghost rows and
        corner ghosts are neighbor-guarded / never touched and keep their
        initial equilibrium."""
        p = self.p
        self.f_next[1:p.ny + 1, 0, :] = 0.0        # west ghost column
        self.f_next[1:p.ny + 1, p.nx + 1, :] = 0.0  # east ghost column

    def streaming(self):
        p = self.p
        for y in range(p.ny):
            for x in range(p.nx):
                for i in range(9):
                    sx, sy = x + 1 - C[i, 0], y + 1 - C[i, 1]
                    self.f_curr[y + 1, x + 1, i] = self.f_next[sy, sx, i]

    def boundary_conditions(self):
        p = self.p
        f = self.f_curr
        ny, nx = p.ny, p.nx
        for x in range(nx):  # bottom wall (LBMSolver.h:153-163)
            if not self.solid[0, x]:
                f[1, x + 1, 2] = f[1, x + 1, 4]
                f[1, x + 1, 5] = f[1, x + 1, 7]
                f[1, x + 1, 6] = f[1, x + 1, 8]
        for x in range(nx):  # top wall (LBMSolver.h:166-175)
            if not self.solid[ny - 1, x]:
                f[ny, x + 1, 4] = f[ny, x + 1, 2]
                f[ny, x + 1, 7] = f[ny, x + 1, 5]
                f[ny, x + 1, 8] = f[ny, x + 1, 6]
        u = p.inlet_velocity
        for y in range(ny):  # Zou-He inlet (LBMSolver.h:179-207)
            if self.solid[y, 0]:
                continue
            ff = f[y + 1, 1]
            rho_bc = (ff[0] + ff[2] + ff[4] + 2 * (ff[3] + ff[6] + ff[7])) / (1 - u)
            ff[1] = ff[3] + (2 / 3) * rho_bc * u
            ff[5] = ff[7] - 0.5 * (ff[2] - ff[4]) + (1 / 6) * rho_bc * u
            ff[8] = ff[6] + 0.5 * (ff[2] - ff[4]) + (1 / 6) * rho_bc * u
        for y in range(ny):  # Zou-He outlet (LBMSolver.h:210-236)
            if self.solid[y, nx - 1]:
                continue
            ff = f[y + 1, nx]
            u_out = -1.0 + (ff[0] + ff[2] + ff[4] + 2 * (ff[1] + ff[5] + ff[8]))
            ff[3] = ff[1] - (2 / 3) * u_out
            ff[6] = ff[8] - 0.5 * (ff[2] - ff[4]) - (1 / 6) * u_out
            ff[7] = ff[5] + 0.5 * (ff[2] - ff[4]) - (1 / 6) * u_out
        # cylinder swap (LBMSolver.h:240-263) — dynamically dead, kept for parity
        for (y, x) in zip(*np.nonzero(self.solid)):
            self.f_curr[y + 1, x + 1] = self.f_curr[y + 1, x + 1][OPP]

    def step(self):
        self.collision()
        self.exchange_ghost_cells()
        self.streaming()
        self.boundary_conditions()

    def interior(self):
        return np.moveaxis(self.f_curr[1:-1, 1:-1], -1, 0)  # (9, ny, nx)

    def record_forces(self):
        """Reference LBMIO.h:114-162 on the post-collision buffer."""
        fx = fy = 0.0
        p = self.p
        for (y, x) in zip(*np.nonzero(self.solid)):
            for i in range(1, 9):
                fl_x, fl_y = x - C[i, 0], y - C[i, 1]
                if 0 <= fl_x < p.nx and 0 <= fl_y < p.ny and not self.solid[fl_y, fl_x]:
                    fi = self.f_next[fl_y + 1, fl_x + 1, i]
                    fx += 2 * C[i, 0] * fi
                    fy += 2 * C[i, 1] * fi
        return fx, fy


def small_params(**kw):
    return SimulationParams(nx=48, ny=24, tau=0.6, inlet_velocity=0.05,
                            precision="f64", **kw)


def test_rolled_step_matches_oracle():
    params = small_params()
    problem = make_problem(params)
    oracle = Oracle(params, problem.solid)
    step = jax.jit(make_step_rolled(problem))
    f = np.asarray(problem.initial_state())
    assert f.dtype == np.float64
    fluid = ~problem.solid
    for t in range(12):
        oracle.step()
        f = np.asarray(step(f))
        ref = oracle.interior()
        np.testing.assert_allclose(f[:, fluid], ref[:, fluid], rtol=1e-12,
                                   atol=1e-15, err_msg=f"step {t}")
        # our solid cells hold rest equilibrium by construction
        n_solid = int(problem.solid.sum())
        np.testing.assert_allclose(
            f[:, problem.solid], np.broadcast_to(W[:, None], (9, n_solid)),
            rtol=1e-12)


def test_forces_match_oracle():
    params = small_params()
    problem = make_problem(params)
    oracle = Oracle(params, problem.solid)
    step = jax.jit(make_step_rolled(problem))
    ffn = jax.jit(forces_mod.forces_fn(problem))
    f = np.asarray(problem.initial_state())
    for t in range(5):
        # reference records after collision of step t, i.e. from state at start
        # of step t
        oracle.collision()
        fx_ref, fy_ref = oracle.record_forces()
        force = np.asarray(ffn(f))
        np.testing.assert_allclose(force, [fx_ref, fy_ref], rtol=1e-10,
                                   atol=1e-14, err_msg=f"step {t}")
        oracle.exchange_ghost_cells()
        oracle.streaming()
        oracle.boundary_conditions()
        f = np.asarray(step(f))


def test_mass_is_finite_and_stable_over_100_steps():
    params = small_params()
    problem = make_problem(params)
    step = jax.jit(make_step_rolled(problem))
    f = problem.initial_state()
    for _ in range(100):
        f = step(f)
    assert bool(physics.is_stable(f))
    rho, uvec = physics.moments(D2Q9, f)
    assert 0.8 < float(np.asarray(rho).mean()) < 1.2

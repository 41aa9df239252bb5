"""End-to-end differentiability: the solver is a pure function of its
state, so reverse-mode AD through the unrolled time loop works out of
the box — a structural capability the C++ reference cannot have (its
state is mutated in place across OpenMP/MPI passes).

The gate differentiates a flow functional through many collide-stream
steps (lax.scan; with and without jax.checkpoint rematerialization) and
checks the gradient against central finite differences along a random
direction — adjoint consistency of the whole discrete solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpulbm import physics
from tpulbm.config import SimulationParams
from tpulbm.lattice import D2Q9
from tpulbm.models import make_problem
from tpulbm.ops.step_jax import make_step_rolled


def _problem():
    params = SimulationParams(nx=32, ny=32, tau=0.8,
                              problem="taylor-green",
                              inlet_velocity=0.04, periodic_x=True,
                              cylinder_radius=0.0, precision="f64")
    return make_problem(params)


def _loss_fn(pr, steps, remat=False):
    step = make_step_rolled(pr)
    body = jax.checkpoint(lambda f, _: (step(f), None)) if remat \
        else (lambda f, _: (step(f), None))

    def loss(f0):
        f, _ = lax.scan(body, f0, None, length=steps)
        rho, u = physics.moments(D2Q9, f)
        return jnp.sum(rho * (u[0] ** 2 + u[1] ** 2))

    return loss


@pytest.mark.parametrize("remat", [False, True], ids=["plain", "remat"])
def test_grad_matches_finite_difference(remat):
    pr = _problem()
    loss = jax.jit(_loss_fn(pr, steps=50, remat=remat))
    grad = jax.jit(jax.grad(_loss_fn(pr, steps=50, remat=remat)))
    f0 = jnp.asarray(pr.initial_state())
    g = grad(f0)
    assert np.isfinite(np.asarray(g)).all()
    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.standard_normal(f0.shape))
    d = d / jnp.linalg.norm(d.ravel())
    eps = 1e-6
    fd = (float(loss(f0 + eps * d)) - float(loss(f0 - eps * d))) / (2 * eps)
    ad = float(jnp.vdot(g, d))
    np.testing.assert_allclose(ad, fd, rtol=1e-6, atol=1e-12)


def test_remat_gradient_identical_to_plain():
    """jax.checkpoint (rematerialization — the memory/FLOPs trade for
    long horizons) must not change the adjoint values at all."""
    pr = _problem()
    f0 = jnp.asarray(pr.initial_state())
    g1 = jax.jit(jax.grad(_loss_fn(pr, 30, remat=False)))(f0)
    g2 = jax.jit(jax.grad(_loss_fn(pr, 30, remat=True)))(f0)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-12,
                               atol=1e-15)


def test_gradient_flows_through_kolmogorov_forcing():
    """The in-step force path (Problem.force_fn) is differentiable too:
    the sensitivity of the forcing-mode amplitude to the initial state
    is finite and non-trivial through 40 forced steps."""
    params = SimulationParams(nx=32, ny=32, tau=0.8, problem="kolmogorov",
                              kolmogorov_n=2, inlet_velocity=0.01,
                              periodic_x=True, cylinder_radius=0.0,
                              precision="f64")
    pr = make_problem(params)
    step = make_step_rolled(pr)
    kappa = 2.0 * np.pi * 2 / 32.0
    cosy = jnp.asarray(np.cos(kappa * np.arange(32))[:, None]
                       * np.ones((1, 32)))

    def loss(f0):
        f, _ = lax.scan(lambda g, _: (step(g), None), f0, None, length=40)
        rho, u = physics.moments(D2Q9, f)
        return jnp.mean(u[0] * cosy)

    f0 = jnp.asarray(pr.initial_state())
    g = jax.jit(jax.grad(loss))(f0)
    assert np.isfinite(np.asarray(g)).all()
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.standard_normal(f0.shape))
    d = d / jnp.linalg.norm(d.ravel())
    eps = 1e-6
    fd = (float(jax.jit(loss)(f0 + eps * d))
          - float(jax.jit(loss)(f0 - eps * d))) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, d)), fd, rtol=1e-5,
                               atol=1e-14)

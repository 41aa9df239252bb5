"""Kolmogorov flow (problem="kolmogorov"): spatially varying body force
F_x(y) = F0·cos(κy) via Problem.force_fn, evaluated in-step from global
coordinates. Gates: the laminar profile is a fixed point at the analytic
amplitude, spin-up from rest follows the exact linear solution
(validating F0 end-to-end), sharded == oracle (the padded-block force
must wrap correctly at halo cells), and the runner + statistics +
spectrum pipeline runs end-to-end.

New capability — the reference's only forcing is a uniform constant in
dead code (LBMUtils.h:15-19)."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpulbm import physics
from tpulbm.config import SimulationParams
from tpulbm.lattice import D2Q9
from tpulbm.models import make_problem
from tpulbm.models.periodic2d import (kolmogorov_fields, kolmogorov_f0,
                                      kolmogorov_kappa)
from tpulbm.ops.step_jax import make_step_rolled
from tpulbm.parallel.mesh import make_mesh
from tpulbm.parallel.sharded_step import make_chunk_fn, shard_state


def _params(**kw):
    d = dict(nx=32, ny=32, tau=0.8, problem="kolmogorov", kolmogorov_n=1,
             inlet_velocity=0.01, periodic_x=True, cylinder_radius=0.0,
             precision="f64")
    d.update(kw)
    return SimulationParams(**d)


def _amplitude(params, u):
    """Projection of ux onto the forcing mode: a = 2·⟨ux·cos(κy)⟩."""
    kappa = kolmogorov_kappa(params)
    y = np.arange(params.ny, dtype=np.float64)[:, None]
    return 2.0 * float(np.mean(np.asarray(u[0]) * np.cos(kappa * y)))


def test_laminar_profile_is_a_fixed_point():
    """At Re = u0/(νκ) ≈ 0.5 ≪ critical, starting AT the laminar profile
    must stay there: u_x(y) = u0·cos(κy) to ~1% after 1000 steps (the 1%
    transverse seed decays in ~260 steps)."""
    params = _params()
    pr = make_problem(params)
    step = jax.jit(make_step_rolled(pr))
    f = jnp.asarray(pr.initial_state())
    f = lax.fori_loop(0, 1000, lambda i, x: step(x), f)
    _, u = physics.moments(D2Q9, f)
    u0 = params.inlet_velocity
    kappa = kolmogorov_kappa(params)
    y = np.arange(params.ny, dtype=np.float64)[:, None]
    ux_ana = u0 * np.cos(kappa * y) * np.ones((1, params.nx))
    err = np.max(np.abs(np.asarray(u[0]) - ux_ana)) / u0
    assert err < 0.015, err
    # transverse component decayed away
    assert np.max(np.abs(np.asarray(u[1]))) / u0 < 0.005
    # periodic box: mass conserved exactly
    np.testing.assert_allclose(float(jnp.sum(f)), 32.0 * 32.0, rtol=1e-12)


def test_spinup_from_rest_matches_linear_solution():
    """From rest the forcing mode grows as u0·(1 − e^{−νκ²t}) (exact for
    the linearized equation; nonlinear terms are O(u²) here). Validates
    the F0 = u0·ν·κ² amplitude calibration end-to-end."""
    params = _params()
    pr = make_problem(params)
    import dataclasses
    rest = (np.ones((params.ny, params.nx)),
            np.zeros((2, params.ny, params.nx)))
    pr = dataclasses.replace(pr, init_fields=rest)
    step = jax.jit(make_step_rolled(pr))
    f = jnp.asarray(pr.initial_state())
    nu, kappa = params.nu(), kolmogorov_kappa(params)
    u0 = params.inlet_velocity
    t = 0
    for t_target in (200, 600):
        f = lax.fori_loop(0, t_target - t, lambda i, x: step(x), f)
        t = t_target
        _, u = physics.moments(D2Q9, f)
        a_exp = u0 * (1.0 - np.exp(-nu * kappa * kappa * t))
        a_meas = _amplitude(params, u)
        assert abs(a_meas / a_exp - 1.0) < 0.02, (t, a_meas, a_exp)


@pytest.mark.parametrize("mesh_shape", [(2, 1), (2, 2)], ids=["y", "2d"])
def test_sharded_matches_oracle(mesh_shape):
    """The padded-block force (global coords offset−1…n, periodic wrap at
    halo cells) must reproduce the oracle."""
    params = _params(kolmogorov_n=2)
    pr = make_problem(params)
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(10):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    n = mesh_shape[0] * mesh_shape[1]
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
    chunk = make_chunk_fn(pr, mesh, 5, backend="jax")
    s, solid = shard_state(mesh, pr.initial_state(),
                           np.zeros((params.ny, params.nx), bool))
    s = chunk(s, solid)
    s = chunk(s, solid)
    np.testing.assert_allclose(np.asarray(jax.device_get(s)), s_ref,
                               rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("mesh_shape", [(1, 1), (2, 1)], ids=["1dev", "y"])
def test_pallas_force_matches_jax(mesh_shape):
    """The fused path evaluates the force IN-KERNEL from global
    coordinates rebuilt with broadcasted_iota + the shard y offset
    (flags[4], step_pallas._collide_rows) — it must match the jax tier's
    padded-block force to f32 roundoff, including at shard-boundary halo
    rows (unwrapped −1/nyl coords on both tiers)."""
    params = _params(precision="f32", nx=128, kolmogorov_n=2)
    pr = make_problem(params)
    solid = np.zeros((params.ny, params.nx), bool)
    n = mesh_shape[0] * mesh_shape[1]
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
    cj = make_chunk_fn(pr, mesh, 10, backend="jax")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # fused: no demotion warning allowed
        cp = make_chunk_fn(pr, mesh, 10, backend="pallas")
    sj, sd = shard_state(mesh, pr.initial_state(), solid)
    sp, _ = shard_state(mesh, pr.initial_state(), solid)
    a = np.asarray(jax.device_get(cj(sj, sd)))
    b = np.asarray(jax.device_get(cp(sp, sd)))
    np.testing.assert_allclose(b, a, atol=5e-7, rtol=0)


def test_pallas_x_sharded_demotes_to_jax():
    """The in-kernel force coords assume full-width slabs; an x-sharded
    mesh must warn and fall back to the jax tier (still correct, just
    slower) rather than compute wrong x offsets."""
    params = _params(precision="f32", nx=128, kolmogorov_n=2)
    pr = make_problem(params)
    mesh = make_mesh((1, 2), devices=jax.devices()[:2])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        chunk = make_chunk_fn(pr, mesh, 4, backend="pallas")
    assert any("force_fn" in str(x.message) for x in w)
    ref = make_chunk_fn(pr, mesh, 4, backend="jax")
    s0, solid = shard_state(mesh, pr.initial_state(),
                            np.zeros((params.ny, params.nx), bool))
    a = np.asarray(jax.device_get(chunk(s0, solid)))
    s0, solid = shard_state(mesh, pr.initial_state(),
                            np.zeros((params.ny, params.nx), bool))
    b = np.asarray(jax.device_get(ref(s0, solid)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_runner_end_to_end_with_stats_and_spectrum(tmp_path):
    """Runner + --stats-from + spectra on a short laminar Kolmogorov run:
    the energy spectrum must be concentrated at the forcing shell."""
    from tpulbm.runner import Runner
    from tpulbm.utils.analysis import energy_spectrum
    params = _params(nx=64, ny=64, kolmogorov_n=2, num_timesteps=200,
                     output_frequency=50, output_dir=str(tmp_path),
                     backend="jax", enable_vtk=False, stats_from=100,
                     precision="f32")
    res = Runner(params, verbose=False).run()
    assert res.success
    z = np.load(tmp_path / "stats_fields.npz")
    assert int(z["n_samples"]) == 2      # t = 100, 150
    u = np.stack([z["mean_ux"], z["mean_uy"]])
    k, E = energy_spectrum(u)
    assert np.argmax(E) == 2             # forcing wavenumber n = 2
    assert E[2] / E.sum() > 0.99

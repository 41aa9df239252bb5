"""Fully periodic boxes (models/periodic2d.py): Taylor-Green vortex +
double shear layer. New capability — the reference has no periodic-y
mode at all (its y rows are always bounce-back walls, LBMSolver.h:150-176).

The Taylor-Green vortex is the sharpest accuracy gate in the suite: an
exact Navier-Stokes solution, so the simulated field is compared against
the analytic field AND the measured energy-decay rate must recover
nu = (tau - 1/2)/3 to a fraction of a percent.
"""
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
from tpulbm.models.periodic2d import taylor_green_fields
from tpulbm.ops.step_jax import make_step_rolled
from tpulbm.parallel.mesh import make_mesh
from tpulbm.parallel.sharded_step import make_chunk_fn, shard_state


def _params(**kw):
    d = dict(nx=64, ny=64, tau=0.8, problem="taylor-green",
             inlet_velocity=0.04, periodic_x=True, cylinder_radius=0.0,
             precision="f64")
    d.update(kw)
    return SimulationParams(**d)


@pytest.mark.slow
def test_taylor_green_matches_analytic_solution():
    # direct field comparison against the exact NS solution at t = 1200
    params = _params()
    pr = make_problem(params)
    step = jax.jit(make_step_rolled(pr))
    t_end = 1200
    f = jnp.asarray(pr.initial_state())
    f = lax.fori_loop(0, t_end, lambda i, x: step(x), f)
    rho, u = physics.moments(D2Q9, f)
    _, u_ana = taylor_green_fields(params, t=float(t_end))
    u0 = params.inlet_velocity
    err = np.max(np.abs(np.asarray(u) - u_ana)) / u0
    assert err < 5e-3, err
    # mass is conserved exactly in a periodic box (no open boundaries)
    np.testing.assert_allclose(float(jnp.sum(f)), 64.0 * 64.0, rtol=1e-12)


@pytest.mark.slow
def test_taylor_green_recovers_viscosity():
    # energy decay rate -> nu_eff == (tau - 1/2)/3 (measured 4e-5 rel)
    params = _params(tau=0.8)
    pr = make_problem(params)
    step = jax.jit(make_step_rolled(pr))
    f = jnp.asarray(pr.initial_state())

    def energy(f):
        rho, u = physics.moments(D2Q9, f)
        return float(jnp.sum(rho * (u[0] ** 2 + u[1] ** 2)))

    e, ts = [], []
    for k in range(12):
        f = lax.fori_loop(0, 150, lambda i, x: step(x), f)
        e.append(energy(f))
        ts.append((k + 1) * 150.0)
    slope = np.polyfit(np.asarray(ts), np.log(np.asarray(e)), 1)[0]
    k2 = 2.0 * (2.0 * np.pi / 64.0) ** 2
    nu_eff = -slope / (2.0 * k2)
    assert abs(nu_eff / params.nu() - 1.0) < 0.005, nu_eff


def test_runner_applies_init_fields(tmp_path):
    """Regression: the Runner's device-side fresh-start build
    (shard_initial_state) must honor init_fields — it used to silently
    build the uniform broadcast, running every Runner-driven periodic box
    from a quiescent state. The final field must match the analytic TG
    solution at t = num_timesteps."""
    from tpulbm.runner import Runner
    T = 120
    params = _params(num_timesteps=T, output_frequency=60,
                     output_dir=str(tmp_path), enable_vtk=False,
                     backend="jax")
    res = Runner(params, verbose=False).run(resume=False)
    assert res.success
    import numpy.lib.recfunctions  # noqa: F401  (genfromtxt names path)
    data = np.genfromtxt(tmp_path / "velocity_field.csv", delimiter=",",
                         names=True)
    nx, ny = params.nx, params.ny
    ux = data["ux"].reshape(ny, nx)
    uy = data["uy"].reshape(ny, nx)
    _, u_ana = taylor_green_fields(params, t=float(T))
    err = max(np.max(np.abs(ux - u_ana[0])), np.max(np.abs(uy - u_ana[1])))
    assert err / params.inlet_velocity < 5e-3, err


@pytest.mark.parametrize("mesh_shape", [(2, 1), (2, 2)], ids=["y", "2d"])
def test_periodic_sharded_matches_oracle(mesh_shape):
    # the y-wrapping ppermute ring must reproduce the oracle bitwise (f64)
    pr = make_problem(_params(nx=32, ny=32))
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(10):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    n = mesh_shape[0] * mesh_shape[1]
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
    chunk = make_chunk_fn(pr, mesh, 5, backend="jax")
    s, solid = shard_state(mesh, pr.initial_state(),
                           np.zeros(pr.spatial_shape, bool))
    for _ in range(2):
        s = chunk(s, solid)
    np.testing.assert_allclose(np.asarray(jax.device_get(s)), s_ref,
                               rtol=1e-13, atol=1e-15)


# fast lane keeps single + blocked (the production path); the mesh-shape
# variants are covered fast at the jax tier (test_periodic_sharded_matches
# _oracle) and in the slow lane on pallas
@pytest.mark.parametrize("mesh_shape,ty,tiled",
                         [((1, 1), "1sub", False),
                          pytest.param((4, 1), None, False,
                                       marks=pytest.mark.slow),
                          pytest.param((1, 1), "8", False,
                                       marks=pytest.mark.slow),
                          pytest.param((1, 2), None, False,
                                       marks=pytest.mark.slow),
                          pytest.param((2, 2), None, False,
                                       marks=pytest.mark.slow),
                          pytest.param((1, 1), None, True,
                                       marks=pytest.mark.slow)],
                         ids=["single", "y-sharded", "blocked",
                              "x-sharded", "2d-mesh", "forced-tiled"])
def test_periodic_pallas_matches_oracle(mesh_shape, ty, tiled, monkeypatch):
    # full-width kernels with wrapped rings; ty="8" forces small slabs so
    # the N-step BLOCKED kernel engages in interpret mode (on TPU it
    # engages naturally) — the temporal-blocking halo recompute must be
    # wrap-correct too. x-sharded / forced-tiled cases route to the
    # x-tiled kernel, whose extended rings wrap diagonally (two-phase
    # composition: x columns first, then wrapped rows carry the corners).
    if ty == "1sub":
        # fast rep pins the 1-step wrapped-ring kernel; the blocked wrap
        # is its own (slow-lane) case below
        monkeypatch.setenv("TPULBM_SUBSTEPS", "1")
    elif ty is not None:
        monkeypatch.setenv("TPULBM_PALLAS_TY", ty)
    if tiled:
        monkeypatch.setenv("TPULBM_FORCE_TILED", "1")
    pr = make_problem(_params(precision="f32"))
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(12):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    n = mesh_shape[0] * mesh_shape[1]
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # no silent tier loss
        chunk = make_chunk_fn(pr, mesh, 6, backend="pallas")
    s, solid = shard_state(mesh, pr.initial_state(),
                           np.zeros(pr.spatial_shape, bool))
    for _ in range(2):
        s = chunk(s, solid)
    d = np.max(np.abs(np.asarray(jax.device_get(s)) - s_ref))
    assert d < 1e-5, d


@pytest.mark.slow  # fast lane-pad reps: tiled wrap-self + 2-D lane-pad gates
def test_periodic_pallas_padded_x_sharded():
    # unaligned width on an x-sharded periodic box: shadow-column lane
    # padding + wrapped y rings compose
    pr = make_problem(_params(nx=100, precision="f32"))
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(8):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    mesh = make_mesh((1, 2), devices=jax.devices()[:2])
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        chunk = make_chunk_fn(pr, mesh, 4, backend="pallas")
    s, solid = shard_state(mesh, pr.initial_state(),
                           np.zeros(pr.spatial_shape, bool))
    for _ in range(2):
        s = chunk(s, solid)
    d = np.max(np.abs(np.asarray(jax.device_get(s)) - s_ref))
    assert d < 1e-5, d


def test_shear_layer_preset_runs(tmp_path):
    # the preset pairs the stability benchmark with the regularized
    # operator; short runner smoke (the full BGK-vs-regularized gate is
    # tests/test_regularized.py)
    from tpulbm.config import PRESETS
    from tpulbm.runner import Runner
    p = PRESETS["shear-layer"].replace(
        nx=64, ny=64, num_timesteps=200, output_frequency=100,
        output_dir=str(tmp_path), backend="jax", precision="f32")
    assert p.collision == "regularized"
    res = Runner(p, verbose=False).run(resume=False)
    assert res.success
    assert (tmp_path / "velocity_field.csv").exists()


# ---------------------------------------------------------------- 3-D ----

def _params3d(**kw):
    d = dict(nx=32, ny=16, nz=16, problem="taylor-green", tau=0.8,
             inlet_velocity=0.04, periodic_x=True, cylinder_radius=0.0,
             precision="f64")
    d.update(kw)
    return SimulationParams(**d)


def _zwave_decay_err(nzv, steps, tau=0.8):
    """Relative error of the z-shear-wave amplitude decay vs the exact
    exp(-nu k^2 t) — the wave u_x = A sin(2 pi z / nz) has (u.grad)u = 0,
    so it is an EXACT Navier-Stokes solution probing the z-periodic
    machinery in isolation."""
    import dataclasses
    from jax import lax
    params = _params3d(nx=8, ny=8, nz=nzv, tau=tau)
    pr = make_problem(params)
    A = 0.01
    z = np.arange(nzv)[:, None, None] * (2.0 * np.pi / nzv)
    ux = A * np.sin(z) * np.ones((nzv, 8, 8))
    u0 = np.stack([ux, np.zeros_like(ux), np.zeros_like(ux)])
    pr = dataclasses.replace(pr, init_fields=(np.ones((nzv, 8, 8)), u0))
    step = jax.jit(make_step_rolled(pr))
    f = jnp.asarray(pr.initial_state())
    f = lax.fori_loop(0, steps, lambda i, x: step(x), f)
    rho, u = physics.moments(pr.lattice, f)
    amp = np.max(np.abs(np.asarray(u[0])))
    expect = A * np.exp(-params.nu() * (2.0 * np.pi / nzv) ** 2 * steps)
    return abs(amp / expect - 1.0)


@pytest.mark.slow
def test_z_shear_wave_second_order_viscosity():
    # measured: 4.6e-2 / 1.2e-2 / 2.9e-3 at nz = 16/32/64 — clean
    # second-order lattice dispersion converging to the exact decay
    e16 = _zwave_decay_err(16, 300)
    e32 = _zwave_decay_err(32, 1200)
    assert e32 < 0.02, e32
    assert 3.0 < e16 / e32 < 5.5, (e16, e32)     # O(k^2) convergence


def test_taylor_green_3d_energy_and_mass():
    from jax import lax
    pr = make_problem(_params3d())
    assert pr.periodic_x and pr.periodic_y and pr.periodic_z
    step = jax.jit(make_step_rolled(pr))
    f = jnp.asarray(pr.initial_state())
    m0 = float(jnp.sum(f))

    def energy(f):
        rho, u = physics.moments(pr.lattice, f)
        return float(jnp.sum(rho * sum(u[d] ** 2 for d in range(3))))

    e_prev = energy(f)
    for _ in range(4):
        f = lax.fori_loop(0, 40, lambda i, x: step(x), f)
        e = energy(f)
        assert e < e_prev          # viscous decay, no spurious forcing
        e_prev = e
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_allclose(float(jnp.sum(f)), m0, rtol=1e-12)


@pytest.mark.parametrize("mesh_shape", [(2, 1), (2, 2)], ids=["y", "2d"])
def test_periodic3d_sharded_matches_oracle(mesh_shape):
    pr = make_problem(_params3d())
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(8):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    n = mesh_shape[0] * mesh_shape[1]
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
    chunk = make_chunk_fn(pr, mesh, 4, backend="jax")
    s, solid = shard_state(mesh, pr.initial_state(),
                           np.zeros(pr.spatial_shape, bool))
    for _ in range(2):
        s = chunk(s, solid)
    np.testing.assert_allclose(np.asarray(jax.device_get(s)), s_ref,
                               rtol=1e-13, atol=1e-15)


@pytest.mark.slow  # fast 3-D periodic rep: blocked extended sweep [n2]
def test_periodic3d_pallas_full_plane_matches_oracle():
    # the full-plane kernel with wrapped z ring planes (interpret mode)
    pr = make_problem(_params3d(precision="f32"))
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(10):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    with warnings.catch_warnings():
        warnings.simplefilter("error")        # no silent tier loss
        chunk = make_chunk_fn(pr, mesh, 5, backend="pallas")
    s, solid = shard_state(mesh, pr.initial_state(),
                           np.zeros(pr.spatial_shape, bool))
    for _ in range(2):
        s = chunk(s, solid)
    d = np.max(np.abs(np.asarray(jax.device_get(s)) - s_ref))
    assert d / np.abs(s_ref).max() < 3e-5, d


def _run_periodic3d_pallas(pr, mesh_shape, n_chunks=2, chunk_len=5,
                           env=None):
    import os
    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        n = mesh_shape[0] * mesh_shape[1]
        mesh = make_mesh(mesh_shape, devices=jax.devices()[:n])
        with warnings.catch_warnings():
            warnings.simplefilter("error")        # no silent tier loss
            chunk = make_chunk_fn(pr, mesh, chunk_len, backend="pallas")
        s, solid = shard_state(mesh, pr.initial_state(),
                               np.zeros(pr.spatial_shape, bool))
        for _ in range(n_chunks):
            s = chunk(s, solid)
        return np.asarray(jax.device_get(s))
    finally:
        for k in env:
            os.environ.pop(k, None)
            if old[k] is not None:
                os.environ[k] = old[k]


@pytest.mark.slow
def test_periodic3d_tiled_pallas_matches_oracle():
    # the y-tiled 1-step kernel wraps fully periodic boxes: y via the
    # periodic ring rows, x via native lane rolls, z via in-kernel
    # wrapped ring planes (zc scratch) — forced past the full-plane
    # kernel on (1,1), then y-sharded (2,1)
    pr = make_problem(_params3d(precision="f32"))
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(10):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    got = _run_periodic3d_pallas(pr, (1, 1),
                                 env={"TPULBM_FORCE_TILED": "1"})
    d = np.max(np.abs(got - s_ref))
    assert d / np.abs(s_ref).max() < 3e-5, d
    got2 = _run_periodic3d_pallas(pr, (2, 1))
    d2 = np.max(np.abs(got2 - s_ref))
    assert d2 / np.abs(s_ref).max() < 3e-5, d2


@pytest.mark.parametrize("subs,mesh_shape",
                         [("2", (1, 1)),
                          pytest.param("3", (2, 1),
                                       marks=pytest.mark.slow)],
                         ids=["n2", "n3-sharded"])
def test_periodic3d_blocked_extended_sweep(subs, mesh_shape):
    # temporally blocked periodic boxes run the EXTENDED sweep (iterate
    # [-N, nz+N), wrapped raw refetches, gated output DMAs) — no zc
    # scratch, no eq ghosts
    pr = make_problem(_params3d(precision="f32"))
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(12):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    # chunk_len 6 divides by both depths — TPULBM_SUBSTEPS only engages
    # when it divides the chunk, so an indivisible length would silently
    # test the 1-step path
    got = _run_periodic3d_pallas(pr, mesh_shape, n_chunks=2, chunk_len=6,
                                 env={"TPULBM_FORCE_TILED": "1",
                                      "TPULBM_SUBSTEPS": subs})
    d = np.max(np.abs(got - s_ref))
    assert d / np.abs(s_ref).max() < 3e-5, d


@pytest.mark.parametrize("mesh_shape",
                         [pytest.param((1, 2), marks=pytest.mark.slow),
                          pytest.param((2, 2), marks=pytest.mark.slow)],
                         ids=["x-sharded", "2d-mesh"])
def test_periodic3d_x_sharded_pallas_matches_oracle(mesh_shape):
    # x-sharded periodic boxes run FUSED through the blocked extended
    # sweep (VERDICT r4 #3b): ring_cols_3d wraps x (periodic_x ppermute),
    # ring_rows_ext_3d wraps y with diagonally-wrapped corner data from
    # the x-first composition, and the sweep's wrapped raw refetches ride
    # the x-piece DMAs (whbm). No demotion warning allowed.
    pr = make_problem(_params3d(precision="f32"))
    step = jax.jit(make_step_rolled(pr))
    s_ref = pr.initial_state()
    for _ in range(12):
        s_ref = step(s_ref)
    s_ref = np.asarray(jax.device_get(s_ref))
    got = _run_periodic3d_pallas(pr, mesh_shape, n_chunks=2, chunk_len=6)
    d = np.max(np.abs(got - s_ref))
    assert d / np.abs(s_ref).max() < 3e-5, d

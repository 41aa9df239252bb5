"""D3Q19 3-D model (new capability; BASELINE config 5): sanity + sharded
equivalence on the jax backend."""
import jax
import numpy as np

from tpulbm import physics
from tpulbm.config import SimulationParams
from tpulbm.lattice import D3Q19
from tpulbm.models import make_problem
from tpulbm.ops.step_jax import make_step_rolled
from tpulbm.parallel.mesh import make_mesh
from tpulbm.parallel.sharded_step import make_chunk_fn, shard_state


def _params(**kw):
    d = dict(nx=32, ny=16, nz=8, problem="cylinder3d", tau=0.6,
             inlet_velocity=0.05, precision="f64")
    d.update(kw)
    return SimulationParams(**d)


def test_3d_step_runs_and_conserves_sanity():
    problem = make_problem(_params())
    assert problem.lattice is D3Q19
    assert problem.solid.shape == (8, 16, 32)
    assert problem.solid.sum() > 0
    step = jax.jit(make_step_rolled(problem))
    f = problem.initial_state()
    assert f.shape == (19, 8, 16, 32)
    for _ in range(20):
        f = step(f)
    assert bool(physics.is_stable(f))
    rho, u = physics.moments(D3Q19, f)
    rho = np.asarray(rho)
    assert 0.8 < rho.mean() < 1.2
    # flow enters at x=0 with +x velocity
    ux = np.asarray(u[0])
    assert ux[:, :, 2:6].mean() > 0


def test_3d_sharded_matches_single_device():
    problem = make_problem(_params())
    step = jax.jit(make_step_rolled(problem))
    f_ref = problem.initial_state()
    for _ in range(8):
        f_ref = step(f_ref)

    mesh = make_mesh((2, 4))
    chunk = make_chunk_fn(problem, mesh, chunk_len=4, backend="jax")
    f, solid = shard_state(mesh, problem.initial_state(), problem.solid)
    for _ in range(2):
        f = chunk(f, solid)
    np.testing.assert_allclose(np.asarray(jax.device_get(f)),
                               np.asarray(f_ref), rtol=1e-12, atol=1e-15)


def test_3d_runner_end_to_end(tmp_path):
    params = _params(num_timesteps=20, output_frequency=10, precision="f32",
                     output_dir=str(tmp_path), backend="jax",
                     enable_vtk=False)
    from tpulbm.runner import Runner
    result = Runner(params, verbose=False).run()
    assert result.success
    assert (tmp_path / "fields3d.npz").exists()
    data = np.load(tmp_path / "fields3d.npz")
    assert data["ux"].shape == (8, 16, 32)


def test_3d_pallas_matches_jax():
    # fused D3Q19 plane-slab kernel (interpret mode) vs the jax tier
    params = _params(precision="f32")
    problem = make_problem(params)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])

    def run(backend):
        chunk = make_chunk_fn(problem, mesh, 4, backend=backend)
        f, solid = shard_state(mesh, problem.initial_state(), problem.solid)
        f = chunk(f, solid)
        f = chunk(f, solid)
        return np.asarray(jax.device_get(f))

    ref = run("jax")
    got = run("pallas")
    np.testing.assert_allclose(got, ref, rtol=5e-6, atol=1e-7)


def test_3d_pallas_bounce_back_and_trt():
    params = _params(precision="f32", obstacle_bc="bounce_back",
                     collision="trt")
    problem = make_problem(params)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])

    def run(backend):
        chunk = make_chunk_fn(problem, mesh, 3, backend=backend)
        f, solid = shard_state(mesh, problem.initial_state(), problem.solid)
        f = chunk(f, solid)
        return np.asarray(jax.device_get(f))

    np.testing.assert_allclose(run("pallas"), run("jax"), rtol=5e-6,
                               atol=1e-7)

"""Slow physics gate: von Kármán vortex shedding frequency (SURVEY §4).

The full validated result lives in runs/re200 (TPU, 120k steps, 2048x512:
St = 0.2177 vs the reference's claimed ≈0.22). This CPU-feasible gate runs
Re=100 on 1024x256 for 50k steps (~10 min on 8 CPU cores), calibrated to
St ≈ 0.186 (blockage-elevated from the unconfined 0.164, matching the
behavior of the reference's confined setup).

Opt in with TPULBM_RUN_SLOW_PHYSICS=1 (kept out of the default suite purely
for runtime).
"""
import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.environ.get("TPULBM_RUN_SLOW_PHYSICS"),
                       reason="set TPULBM_RUN_SLOW_PHYSICS=1 to run (~10 min)"),
]


def test_vortex_shedding_strouhal_number():
    import jax
    from tpulbm.config import SimulationParams, tau_for_reynolds
    from tpulbm.models import make_problem
    from tpulbm.ops import forces as fmod
    from tpulbm.parallel.mesh import make_mesh
    from tpulbm.parallel.sharded_step import make_chunk_fn, shard_state
    from tpulbm.utils.analysis import strouhal_number

    ny, u, re = 256, 0.05, 100.0
    params = SimulationParams(nx=1024, ny=ny, inlet_velocity=u,
                              tau=tau_for_reynolds(re, u, ny),
                              precision="f32")
    problem = make_problem(params)
    mesh = make_mesh((2, 4))
    chunk = make_chunk_fn(problem, mesh, 250, backend="jax")
    ffn = jax.jit(fmod.forces_fn(problem))
    f, solid = shard_state(mesh, problem.initial_state(), problem.solid)

    ts, cls = [], []
    for k in range(200):  # 50k steps
        ts.append(k * 250)
        cls.append(float(np.asarray(jax.device_get(ffn(f)))[1]))
        f = chunk(f, solid)

    D = 2.0 * params.get_cylinder_radius_cells()
    q = 0.5 * u * u * D
    res = strouhal_number(np.array(ts), np.array(cls) / q, u, D,
                          start=20000, prominence=0.1)
    assert res is not None, "no vortex shedding detected"
    assert res["n_peaks"] >= 6
    assert 0.16 <= res["strouhal"] <= 0.21, res

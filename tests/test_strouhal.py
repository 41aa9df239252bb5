"""Vortex-shedding physics gate: Strouhal number of the Kármán street
(SURVEY §4; reference validation scripts/lift.py:112, README.md §4).

The full validated result lives in runs/re200 (TPU, 120k steps, 2048x512:
St = 0.2177 vs the reference's claimed ≈0.22). This gate runs Re=100 on
1024x256 for 50k steps, calibrated to St ≈ 0.186 (blockage-elevated from
the unconfined 0.164, matching the behavior of the reference's confined
setup).

Two ways to run:
  * On a machine with a TPU it runs BY DEFAULT, in a subprocess on the real
    chip (the suite's conftest pins this process to a virtual CPU mesh, so
    the device run must live in a fresh interpreter). ~1 min of wall time.
  * TPULBM_RUN_SLOW_PHYSICS=1 forces the CPU-mesh path (~10 min on 8 cores).
"""
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = [pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Probe + run in a clean interpreter: no forced-CPU config, so the axon TPU
# plugin (if present) becomes the default backend. Prints one JSON line.
_CHILD = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, __REPO__)
    import jax
    if jax.default_backend() == "cpu":
        print(json.dumps({"skip": "no accelerator"}))
        sys.exit(0)
    import numpy as np
    from tpulbm.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from tpulbm.config import SimulationParams, tau_for_reynolds
    from tpulbm.models import make_problem
    from tpulbm.parallel.mesh import make_mesh
    from tpulbm.parallel.sharded_step import make_super_chunk_fn, shard_state
    from tpulbm.utils.analysis import strouhal_number

    ny, u, re = 256, 0.05, 100.0
    params = SimulationParams(nx=1024, ny=ny, inlet_velocity=u,
                              tau=tau_for_reynolds(re, u, ny),
                              precision="f32")
    problem = make_problem(params)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    # forces sampled every 250 steps ON DEVICE, fetched 2000 steps at a time
    # (host round trips through the TPU relay cost 50-300 ms each)
    sup = make_super_chunk_fn(problem, mesh, 250, 8, backend="pallas")
    f, solid = shard_state(mesh, problem.initial_state(), problem.solid)
    ts, cls = [], []
    for k in range(25):  # 25 x 8 x 250 = 50k steps
        f, (forces_k, _, stable_k) = sup(f, solid)
        forces_k = np.asarray(jax.device_get(forces_k))
        assert bool(np.asarray(jax.device_get(stable_k)).all()), "unstable"
        for j in range(8):
            ts.append((k * 8 + j) * 250)
            cls.append(float(forces_k[j][1]))
    D = 2.0 * params.get_cylinder_radius_cells()
    q = 0.5 * u * u * D
    res = strouhal_number(np.array(ts), np.array(cls) / q, u, D,
                          start=20000, prominence=0.1)
    print(json.dumps({"strouhal": None if res is None else res["strouhal"],
                      "n_peaks": 0 if res is None else res["n_peaks"]}))
""").replace("__REPO__", repr(REPO))


def test_vortex_shedding_strouhal_number():
    if not os.environ.get("TPULBM_RUN_SLOW_PHYSICS"):
        # default path: run on the real accelerator in a clean interpreter
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        proc = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                              cwd=REPO, capture_output=True, timeout=1500)
        out = proc.stdout.decode()
        assert proc.returncode == 0, \
            f"device subprocess failed:\n{out[-2000:]}\n" \
            f"{proc.stderr.decode()[-3000:]}"
        res = json.loads(out.strip().splitlines()[-1])
        if "skip" in res:
            pytest.skip("no accelerator present; set "
                        "TPULBM_RUN_SLOW_PHYSICS=1 for the CPU-mesh run")
        assert res["strouhal"] is not None, "no vortex shedding detected"
        assert res["n_peaks"] >= 6, res
        assert 0.16 <= res["strouhal"] <= 0.21, res
        return

    # opt-in CPU-mesh path (uses this process's 8-device virtual mesh)
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

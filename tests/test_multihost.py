"""Multi-host I/O semantics: a real 2-process jax.distributed run on CPU.

The reference gathers fields to rank 0 over MPI_Gatherv and writes files
there (LBMSolver.h:289-337, LBMIO.h:35-46). Here two OS processes each own
one device of a (2,1) mesh; gathers go through
multihost_utils.process_allgather and process 0 writes forces.csv /
velocity_field.csv / VTK frames / checkpoints. The artifacts must be
byte-identical to the same run executed in one process (the two-phase halo
exchange is exact, so sharded == single in f64).
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import os, sys
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags
            + " --xla_force_host_platform_device_count=1").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.devices()
    sys.path.insert(0, __REPO__)
    from tpulbm.config import SimulationParams
    from tpulbm.runner import Runner
    params = SimulationParams(nx=64, ny=32, tau=0.6, inlet_velocity=0.05,
                              num_timesteps=60, output_frequency=20,
                              backend="jax", precision="f64",
                              mesh_shape=(2, 1), output_dir=outdir,
                              enable_vtk=True, checkpoint_every=1)
    res = Runner(params, verbose=False).run(resume=False)
    assert res.success, "multi-host run went unstable"
""").replace("__REPO__", repr(REPO))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_run_writes_rank0_artifacts(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # children force 1 device each
    procs = [subprocess.Popen([sys.executable, "-c", CHILD, str(port),
                               str(pid), out],
                              env=env, cwd=REPO,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in (0, 1)]
    outputs = [p.communicate(timeout=560)[0].decode() for p in procs]
    for pid, (p, text) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{text[-3000:]}"

    # single-process reference on a (2,1) virtual mesh (same math)
    from tpulbm.config import SimulationParams
    from tpulbm.runner import Runner
    import jax
    ref_dir = str(tmp_path / "ref")
    params = SimulationParams(nx=64, ny=32, tau=0.6, inlet_velocity=0.05,
                              num_timesteps=60, output_frequency=20,
                              backend="jax", precision="f64",
                              mesh_shape=(2, 1), output_dir=ref_dir,
                              enable_vtk=True, checkpoint_every=1)
    res = Runner(params, devices=jax.devices()[:2], verbose=False).run(
        resume=False)
    assert res.success

    for name in ("forces.csv", "velocity_field.csv",
                 "simulation_params.csv", "vtk_output/lbm_000020.vtk",
                 "vtk_output/lbm_000040.vtk"):
        got = open(os.path.join(out, name), "rb").read()
        ref = open(os.path.join(ref_dir, name), "rb").read()
        assert got == ref, f"{name} differs between 2-process and 1-process"

    # checkpoint written by process 0 resumes cleanly
    from tpulbm.utils import checkpoint as ckpt
    latest = ckpt.latest(os.path.join(out, "checkpoints"))
    assert latest is not None
    step, f = ckpt.load(latest)
    assert step == 60 and np.isfinite(f).all()

"""x-tiled pallas kernel equivalence (interpret mode on CPU).

The tiled kernel must match the pure-JAX tier bit-close in f32 for every
tile layout: forced single-device tiling (the wide-grid VMEM case), all
temporal-blocking depths, x-sharded and fully 2-D meshes (the reference's
arbitrary Cartesian decompositions, LBMGrid.h:347-392), obstacles straddling
x shard boundaries, and periodic channels."""
import os

import jax
import numpy as np
import pytest

from tpulbm.config import SimulationParams
from tpulbm.models import make_problem
from tpulbm.parallel.mesh import make_mesh
from tpulbm.parallel.sharded_step import make_chunk_fn, shard_state


def _run(params, mesh_shape, backend, chunk_len=6, n_chunks=2, env=None):
    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        problem = make_problem(params)
        n_dev = mesh_shape[0] * mesh_shape[1]
        mesh = make_mesh(mesh_shape, devices=jax.devices()[:n_dev])
        chunk = make_chunk_fn(problem, mesh, chunk_len, backend=backend)
        solid = problem.solid if problem.solid is not None else \
            np.zeros(problem.spatial_shape, bool)
        f, solid = shard_state(mesh, problem.initial_state(), solid)
        out = []
        for _ in range(n_chunks):
            f = chunk(f, solid)
            out.append(np.asarray(jax.device_get(f)))
        return out
    finally:
        for k in env:
            os.environ.pop(k, None)
            if old[k] is not None:
                os.environ[k] = old[k]


CYL = SimulationParams(nx=128, ny=64, tau=0.6, inlet_velocity=0.05,
                       precision="f32")


def _compare(params, mesh_shape, env, **kw):
    # rtol 2e-5: under the suite's x64 mode the jax tier promotes Zou-He
    # scalar constants to f64, and over ~36 steps the outlet column drifts
    # ~6e-6 relative vs the pure-f32 kernels (full-width kernels show the
    # identical drift, so this is not a tiled-kernel artifact).
    ref = _run(params, (1, 1), "jax", **kw)
    got = _run(params, mesh_shape, "pallas", env=env, **kw)
    for k, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=1e-7,
                                   err_msg=f"chunk {k}")


def _assert_tiled_engages(params, mesh_shape, n_sub, tile_x=None):
    """The builder must actually produce a tiled stepper for this config."""
    from tpulbm.ops.step_pallas_tiled import make_local_step_tiled
    problem = make_problem(params)
    local = (params.ny // mesh_shape[0], params.nx // mesh_shape[1])
    old = os.environ.get("TPULBM_TILE_X")
    if tile_x:
        os.environ["TPULBM_TILE_X"] = str(tile_x)
    try:
        step = make_local_step_tiled(problem, local, n_sub, interpret=True)
    finally:
        os.environ.pop("TPULBM_TILE_X", None)
        if old is not None:
            os.environ["TPULBM_TILE_X"] = old
    assert step is not None
    if tile_x:
        assert step.n_tx == local[1] // tile_x
    return step


@pytest.mark.parametrize("n_sub", [1,
                                   pytest.param(2, marks=pytest.mark.slow),
                                   pytest.param(3, marks=pytest.mark.slow),
                                   pytest.param(4, marks=pytest.mark.slow)])
def test_tiled_forced_single_device_depths(n_sub):
    # single shard, forced 4-wide tile grid: the wide-row VMEM configuration
    _assert_tiled_engages(CYL, (1, 1), n_sub, tile_x=32)
    env = {"TPULBM_FORCE_TILED": "1", "TPULBM_TILE_X": "32"}
    if n_sub == 1:
        env["TPULBM_NO_FUSED2"] = "1"
    else:
        env["TPULBM_SUBSTEPS"] = str(n_sub)
    _compare(CYL, (1, 1), env, chunk_len=2 * n_sub * (1 if n_sub != 3 else 3),
             n_chunks=2)


@pytest.mark.slow
def test_tiled_x_sharded_mesh():
    # pure x decomposition: halo columns ride ppermute over the 'x' axis
    _compare(CYL, (1, 4), {}, chunk_len=6, n_chunks=3)


@pytest.mark.slow
def test_tiled_2d_mesh():
    # fully 2-D decomposition incl. corner data in the extended ring rows
    _compare(CYL, (2, 2), {}, chunk_len=6, n_chunks=3)


@pytest.mark.slow
def test_tiled_2d_mesh_with_inner_tiles():
    # 2-D mesh AND multiple tiles per shard (both halo sources exercised)
    _compare(CYL, (2, 4), {"TPULBM_TILE_X": "16"}, chunk_len=6, n_chunks=2)


@pytest.mark.slow
def test_tiled_cylinder_straddling_x_boundary():
    # obstacle cells appear in the x-halo columns/corners of both x-shards
    params = CYL.replace(cylinder_x=0.5, cylinder_radius=0.15)
    _compare(params, (1, 2), {}, chunk_len=6, n_chunks=3)


def test_tiled_bounce_back_straddling_2d():
    params = CYL.replace(nx=128, ny=128, cylinder_x=0.5, cylinder_y=0.5,
                         cylinder_radius=0.12, obstacle_bc="bounce_back")
    _compare(params, (2, 2), {"TPULBM_SUBSTEPS": "2"}, chunk_len=6,
             n_chunks=2)


@pytest.mark.slow
def test_tiled_poiseuille_periodic_x_sharded():
    params = SimulationParams(nx=128, ny=48, tau=0.8, problem="poiseuille",
                              periodic_x=True, body_force=(1e-5, 0.0),
                              inlet_velocity=0.0, precision="f32")
    _compare(params, (1, 2), {}, chunk_len=6, n_chunks=2)


@pytest.mark.slow
def test_tiled_trt_collision_2d():
    params = CYL.replace(collision="trt", tau=0.55)
    _compare(params, (2, 2), {}, chunk_len=6, n_chunks=2)


@pytest.mark.slow
def test_tiled_matches_full_width_kernel():
    # the two pallas paths must agree with each other bitwise-close too
    full = _run(CYL, (1, 1), "pallas", chunk_len=6, n_chunks=2)
    tiled = _run(CYL, (1, 1), "pallas", chunk_len=6, n_chunks=2,
                 env={"TPULBM_FORCE_TILED": "1", "TPULBM_TILE_X": "32"})
    for k, (r, g) in enumerate(zip(full, tiled)):
        np.testing.assert_allclose(g, r, rtol=5e-6, atol=1e-7,
                                   err_msg=f"chunk {k}")


@pytest.mark.slow  # fast guard rep: test_3d_inlet_piercing_solid_runs_fused[single]
def test_tiled_guard_bcs_solid_touching_inlet():
    # 2-D solid overlapping the inlet column and bottom wall: the BC strips
    # must be mask-guarded (guard_bcs) in the tiled kernel too
    params = CYL.replace(nx=128, ny=64, cylinder_x=0.0, cylinder_y=0.0,
                         cylinder_radius=0.2)
    from tpulbm.models import make_problem
    problem = make_problem(params)
    assert problem.solid[:, 0].any() and problem.solid[0, :].any()
    from tpulbm.ops.step_pallas import _physics_cfg_fields
    assert _physics_cfg_fields(problem)["guard_bcs"]
    _compare(params, (2, 2), {}, chunk_len=6, n_chunks=2)


@pytest.mark.slow
def test_tiled_guard_bcs_solid_touching_outlet():
    params = CYL.replace(nx=128, ny=64, cylinder_x=1.0, cylinder_y=0.5,
                         cylinder_radius=0.15)
    from tpulbm.models import make_problem
    problem = make_problem(params)
    assert problem.solid[:, -1].any()
    _compare(params, (1, 2), {"TPULBM_SUBSTEPS": "2"}, chunk_len=6,
             n_chunks=2)


@pytest.mark.slow
def test_tiled_lane_padded_x_sharded():
    # unaligned local width on an x-sharded mesh: the tiled kernel runs on
    # lane-PADDED blocks whose pad columns are live shadow copies of the
    # east neighbor's first columns (halo.ring_cols_padded), so ANY real
    # width runs fused — the reference runs any divisible grid
    # (LBMGrid.h:366-392). TPULBM_FORCE_PAD emulates the TPU 128-lane pad
    # in interpret mode.
    _compare(CYL.replace(nx=120), (1, 2), {"TPULBM_FORCE_PAD": "4"},
             chunk_len=6, n_chunks=3)


@pytest.mark.slow
def test_tiled_lane_padded_2d_mesh_straddle_bounce_back():
    # padded shadow columns carrying obstacle cells: a bounce-back cylinder
    # straddling the x shard boundary must read the same mask through the
    # stitched pad as through the halo columns, on a fully 2-D mesh
    params = CYL.replace(nx=120, ny=128, cylinder_x=0.5, cylinder_y=0.5,
                         cylinder_radius=0.12, obstacle_bc="bounce_back")
    _compare(params, (2, 2), {"TPULBM_FORCE_PAD": "4"},
             chunk_len=6, n_chunks=2)


@pytest.mark.parametrize("mesh_shape",
                         [(1, 1),
                          pytest.param((1, 2), marks=pytest.mark.slow)],
                         ids=["wrap-self", "wrap-ppermute"])
def test_tiled_lane_padded_periodic(mesh_shape):
    # periodic channel + padding: the physically-east shard's pad columns
    # shadow the WRAP neighbor (no dead pin — _apply_bcs skips the eq pin
    # under periodic_x); full-width kernels would roll through the pad, so
    # the builder must route this to the tiled kernel — including on a
    # single shard (mesh (1,1)), where the wrap shadow is its own west edge
    params = SimulationParams(nx=120, ny=48, tau=0.8, problem="poiseuille",
                              periodic_x=True, body_force=(1e-5, 0.0),
                              inlet_velocity=0.0, precision="f32")
    _compare(params, mesh_shape, {"TPULBM_FORCE_PAD": "8"},
             chunk_len=6, n_chunks=2)


@pytest.mark.slow
def test_tiled_lane_padded_single_shard():
    # mx == 1 + forced pad: the pad columns are dead (eq-pinned in-kernel),
    # same as the full-width kernels' pad semantics
    _compare(CYL.replace(nx=124), (1, 1),
             {"TPULBM_FORCE_TILED": "1", "TPULBM_FORCE_PAD": "4"},
             chunk_len=6, n_chunks=2)


@pytest.mark.slow
def test_tiled_clean_corners_2d_mesh():
    # the in-kernel Zou & He corner closure on the x-tiled kernel over a
    # (2,2) mesh: each corner lives on a different shard AND a different
    # x-tile; the closure must fire only where (is_bottom/top, flt/frt)
    # coincide
    _compare(CYL.replace(zou_he_corners="clean"), (2, 2), {},
             chunk_len=6, n_chunks=3)

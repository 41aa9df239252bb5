"""The distributed chunked time-stepper: shard_map + lax.scan.

TPU-native equivalent of the reference's Solver::run hot loop
(LBMSolver.h:43-78): the per-step sequence collision → halo exchange →
streaming → BCs runs entirely on-device for `chunk_len` steps under one
`lax.scan` inside one `shard_map` region; host interaction (forces, VTK,
stability abort) happens only at chunk boundaries (runner.py), replacing the
reference's every-step MPI_Allreduce sync (LBMSolver.h:60; SURVEY §6: its
scalability ceiling).

Layout: global state f is (Q, [z,] ny, nx) sharded over a ('y','x') device
mesh; inside the region each shard steps a halo-padded local block, with the
ring refreshed by two-phase ppermute (parallel/halo.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.base import Problem
from ..ops.step_jax import make_local_step_padded
from . import halo
from .mesh import local_block_shape


def make_chunk_fn(problem: Problem, mesh: Mesh, chunk_len: int,
                  backend: str = "jax"):
    """Build a jitted fn(f, solid) -> f advanced by chunk_len steps.

    f: global (Q, *spatial) array (sharded or to-be-sharded); donated.
    solid: global bool mask (or None-placeholder of zeros when no obstacle).
    """
    spatial = problem.spatial_shape
    ndim = len(spatial)
    local_shape = local_block_shape(mesh, spatial)
    mesh_shape = tuple(mesh.devices.shape)
    eq_ring = problem.ghost_ring_values()
    has_solid = problem.solid is not None

    if backend == "pallas":
        from ..ops.step_pallas import make_local_step_pallas
        local_step = make_local_step_pallas(problem, local_shape)
    elif backend == "jax":
        local_step = make_local_step_padded(problem, local_shape)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    ring_kw = dict(eq_ring=eq_ring, mesh_shape=mesh_shape,
                   periodic_x=problem.periodic_x)

    def body(f_local, solid_local):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        offsets = (0,) * (ndim - 2) + (iy * local_shape[-2], ix * local_shape[-1])
        solid_arg = solid_local if has_solid else None
        solid_pad = None
        if has_solid and problem.obstacle_bc == "bounce_back":
            solid_pad = halo.pad_mask(solid_local, mesh_shape=mesh_shape,
                                      periodic_x=problem.periodic_x)
        fpad = halo.make_padded(f_local, eq_ring)

        def one_step(fp, _):
            fp = halo.refresh_ring(fp, **ring_kw)
            fp = local_step(fp, solid_arg, offsets, solid_pad)
            return fp, None

        fpad, _ = lax.scan(one_step, fpad, None, length=chunk_len)
        center = (slice(None),) + (slice(1, -1),) * ndim
        return fpad[center]

    spec_f = P(*((None,) + (None,) * (ndim - 2) + ("y", "x")))
    spec_m = P(*((None,) * (ndim - 2) + ("y", "x")))
    sharded = shard_map(body, mesh=mesh, in_specs=(spec_f, spec_m),
                        out_specs=spec_f)
    return jax.jit(sharded, donate_argnums=(0,))


def shard_state(mesh: Mesh, f, solid=None):
    """Place global arrays with the canonical ('y','x') sharding."""
    ndim = f.ndim - 1
    spec_f = P(*((None,) + (None,) * (ndim - 2) + ("y", "x")))
    spec_m = P(*((None,) * (ndim - 2) + ("y", "x")))
    f = jax.device_put(f, NamedSharding(mesh, spec_f))
    if solid is not None:
        solid = jax.device_put(solid, NamedSharding(mesh, spec_m))
    return f, solid

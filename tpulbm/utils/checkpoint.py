"""Checkpoint / resume — a capability the reference lacks entirely
(SURVEY §5: "a 120k-step run that dies restarts from scratch").

The whole simulation state is one population array plus the step counter, so
a checkpoint is a single .npz with the params JSON embedded for a
consistency check on restore. Written at chunk boundaries by the runner.
"""
from __future__ import annotations

import glob
import os
import re

import numpy as np

from ..config import SimulationParams

_PAT = re.compile(r"ckpt_(\d+)\.npz$")

# Fields that do not change the physics of the trajectory: safe to differ
# between the checkpointing run and the resuming run. Everything else
# (grid, tau, velocities, BC/collision choices, body force, precision, …)
# must match — resuming with different physics silently mixes two
# simulations (the inlet velocity even shapes the frozen ghost ring).
_RUNTIME_FIELDS = frozenset({
    "num_timesteps", "output_frequency", "vtk_start_step", "backend",
    "mesh_shape", "checkpoint_every", "checkpoint_dir", "output_dir",
    "enable_vtk", "vtk_format",
})


def save(ckpt_dir: str, step: int, f: np.ndarray,
         params: SimulationParams, keep: int = 3) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step:09d}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, f=np.asarray(f), step=np.int64(step),
                 params_json=np.bytes_(params.to_json().encode()))
    os.replace(tmp, path)  # atomic publish
    for old in sorted(glob.glob(os.path.join(ckpt_dir, "ckpt_*.npz")))[:-keep]:
        os.remove(old)
    return path


def latest(ckpt_dir: str) -> str | None:
    paths = sorted(p for p in glob.glob(os.path.join(ckpt_dir, "ckpt_*.npz"))
                   if _PAT.search(p))
    return paths[-1] if paths else None


def load(path: str, params: SimulationParams | None = None
         ) -> tuple[int, np.ndarray]:
    """Returns (step, f). If params given, verifies grid compatibility."""
    with np.load(path) as data:
        f = data["f"]
        step = int(data["step"])
        saved = SimulationParams.from_json(bytes(data["params_json"]).decode())
    if params is not None:
        saved_d, run_d = saved.to_dict(), params.to_dict()
        for field in sorted(set(saved_d) & set(run_d) - _RUNTIME_FIELDS):
            if saved_d[field] != run_d[field]:
                raise ValueError(
                    f"checkpoint {path} was written with {field}="
                    f"{saved_d[field]!r}, run has {run_d[field]!r}")
    return step, f

"""Persistent XLA compilation cache (per-machine).

Remote-TPU compiles in this environment cost 30-90 s per program per
process; the persistent cache cuts repeat runs to milliseconds. Call early
(before the first jit executes)."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    path = path or os.environ.get("TPULBM_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/tpulbm_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail a run over it

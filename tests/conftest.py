"""Test config: run on CPU with 8 virtual devices (the fake-cluster mechanism
the reference lacks — SURVEY §4) and enable x64 so oracle comparisons can be
done in f64.

Note: the environment's sitecustomize imports jax and registers a TPU plugin
at interpreter start, so env vars alone are too late — use jax.config
updates (backends are not yet initialized at conftest import time).
"""
import os

from tpulbm.utils.hostenv import force_virtual_cpu_devices

force_virtual_cpu_devices(8)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the fast lane is dominated by
# COMPILES of interpret-mode pallas programs (measured: an 18-step
# x-sharded equivalence test spends ~45 of 55 s tracing/compiling, and a
# warm cache cuts the test to ~21 s), so repeat lane runs — the common
# case while iterating — get ~2.5x faster. Cache keys are HLO hashes;
# kernel-source changes recompile exactly the affected programs.
_cache = os.environ.get("TPULBM_TEST_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/tpulbm_xla_cpu"))
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass  # the cache is an optimization; never fail the suite over it

assert jax.device_count() == 8, jax.devices()

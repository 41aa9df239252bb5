"""Test config: run on CPU with 8 virtual devices (the fake-cluster mechanism
the reference lacks — SURVEY §4) and enable x64 so oracle comparisons can be
done in f64.

Note: the environment's sitecustomize imports jax and registers a TPU plugin
at interpreter start, so env vars alone are too late — use jax.config
updates (backends are not yet initialized at conftest import time).
"""
from tpulbm.utils.hostenv import force_virtual_cpu_devices

force_virtual_cpu_devices(8)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

assert jax.device_count() == 8, jax.devices()

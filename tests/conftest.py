"""Test config: run on CPU with 8 virtual devices (the fake-cluster mechanism
the reference lacks — SURVEY §4) and enable x64 so oracle comparisons can be
done in f64.

Note: the environment's sitecustomize imports jax and registers a TPU plugin
at interpreter start, so env vars alone are too late — use jax.config
updates (backends are not yet initialized at conftest import time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.device_count() == 8, jax.devices()

"""Test env setup: force CPU backend with 8 virtual devices (SURVEY.md §4.3).

The axon sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon already exported, so env-var overrides are too late —
we must use jax.config.update instead (XLA_FLAGS is still read lazily at
first backend init, so forcing the device count via env works).

Set KMERAX_TPU_TESTS=1 to run against the real TPU chip (tests/tpu only).
"""

import os
import sys

if not os.environ.get("KMERAX_TPU_TESTS"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))  # make `sim` importable

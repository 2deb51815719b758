"""Test env setup: force CPU backend with 8 virtual devices (SURVEY.md §4.3).

Set KMERAX_TPU_TESTS=1 to run against the real TPU chip (tests/tpu only).
Must run before any jax import, hence conftest at the test root.
"""

import os
import sys

if not os.environ.get("KMERAX_TPU_TESTS"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))  # make `sim` importable

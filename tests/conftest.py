"""Test configuration: run on an 8-device virtual CPU mesh.

The reference has no tests (SURVEY.md §4); this suite is our own pyramid:
unit tests for scope/coefficient math against hand-computed and
naive-loop goldens, numerics tests for the MAT forward and optimizers vs
torch, and multi-device integration tests on jax's CPU device emulation.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Mirrors SURVEY.md §4's "multi-node without a real cluster" strategy — sharding
logic is exercised on host-platform virtual devices so the suite runs anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep tests deterministic and fast on CPU.
os.environ.setdefault("JAX_ENABLE_X64", "1")

"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

All tests run accelerator-free; multi-chip sharding is exercised on the
virtual mesh (XLA_FLAGS host-platform device count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

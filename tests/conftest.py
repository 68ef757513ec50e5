"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

All tests run accelerator-free; multi-chip sharding is exercised on the
virtual mesh.  The session environment pins JAX_PLATFORMS=axon (the real
TPU tunnel) and that plugin wins over the env-var override, so we drop the
variable and force the platform through jax.config instead.
"""

import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (SURVEY.md §4 point 4).

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (a TPU
tunnel); env vars alone don't win, so we also flip jax.config after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

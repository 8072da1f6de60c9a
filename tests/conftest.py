"""Test config: force real CPU with 8 virtual devices so multi-chip sharding
logic is exercised quickly without TPU hardware (SURVEY §4 test plan).

NOTE: this environment's sitecustomize registers an 'axon' TPU-tunnel PJRT
plugin and *hard-sets* ``jax_platforms='axon,cpu'`` via ``jax.config.update``,
which overrides the ``JAX_PLATFORMS`` env var. Tests must therefore re-update
the config AFTER importing jax, or every compile goes over the (slow) tunnel.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

"""Test configuration: force all tests onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (and without
claiming the real chip, which the bench driver uses).

The container's sitecustomize registers the TPU PJRT plugin and overrides
jax_platforms at interpreter start, so we must override it back *after*
importing jax, before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

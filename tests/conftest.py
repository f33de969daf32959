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
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's producer-duplicating loop fusion re-expands the deep select
# chains of the polygon-clip narrowphase (box_box_cm) into every consumer:
# one fused box-box pair ballooned an 11k-op HLO to 245k post-opt and took
# ~9 min of LLVM on this single-core container (16s without the pass).
# CPU-test-only — TPU (Mosaic) compiles are unaffected by this env.
if "xla_disable_hlo_passes" not in flags:
    flags += " --xla_disable_hlo_passes=fusion"
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fused-pipeline tests compile multi-
# thousand-op XLA:CPU programs (minutes each, single-core container);
# caching them makes re-runs and unchanged-test runs cheap.
_cache_dir = os.environ.get("DXK_TEST_CACHE",
                            "/tmp/dxk_tpu_xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

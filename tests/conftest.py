"""Test configuration: run everything on a virtual 8-device CPU mesh so that
sharding/pjit paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path).  Must set XLA flags before jax import."""

import os

# the axon accelerator plugin registers itself whenever
# PALLAS_AXON_POOL_IPS is set and then overrides JAX_PLATFORMS=cpu,
# putting the whole suite on the real TPU chip — drop it first
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax can arrive pre-imported at interpreter startup (site hook), in which
# case the env vars above were captured too late — but backends initialize
# lazily, so the config update still wins as long as no device was touched
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: per-level shapes recompile otherwise
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_sph")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

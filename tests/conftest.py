"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (the standard JAX
substitute for multi-host testing).

Note: the axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start;
a plain env override is ignored, so we also update the jax config directly.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: the suite re-jits the same step shapes every
# run; CPU-backend executables cache fine (the axon TPU backend doesn't)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.jax_cache_cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

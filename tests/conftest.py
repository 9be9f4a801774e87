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

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

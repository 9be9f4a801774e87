"""ngp_tpu — TPU-native neural graphics primitives.

A from-scratch JAX/Pallas re-design of instant-ngp + the blender-ngp fork
(reference: JamesPerlman/blender-ngp). Four neural primitives (NeRF, SDF,
image, volume) built on a shared multiresolution hash encoding and small
MXU-friendly MLPs, with an occupancy-grid ray marcher expressed as masked
fixed-shape compute under jit.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: compiles through the remote TPU tunnel run
# minutes; caching them across processes is a large quality-of-life win.
_cache_dir = _os.environ.get("NGP_TPU_JAX_CACHE",
                             _os.path.expanduser("~/.cache/ngp_tpu_jax"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

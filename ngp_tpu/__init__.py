"""ngp_tpu — TPU-native neural graphics primitives.

A from-scratch JAX/Pallas re-design of instant-ngp + the blender-ngp fork
(reference: JamesPerlman/blender-ngp). Four neural primitives (NeRF, SDF,
image, volume) built on a shared multiresolution hash encoding and small
MXU-friendly MLPs, with an occupancy-grid ray marcher expressed as masked
fixed-shape compute under jit.
"""

__version__ = "0.1.0"

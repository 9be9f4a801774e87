"""Distributed execution: device mesh + sharding helpers.

The reference is strictly single-GPU (ref: README.md:239-241 — multi-GPU
unsupported); scaling here is a new, first-class TPU design (SURVEY §2.10):

- **DP (ray/sample parallel)**: the batch axis of training samples/rays is
  sharded across the mesh's ``data`` axis; XLA inserts the gradient psum
  over ICI. Rays are embarrassingly parallel, so this is the main axis.
- **TP (table parallel)**: the hash table is the only large parameter
  (tens of MB); for very large configs it can be sharded by rows across
  the ``model`` axis (gathers become all-gathers of requested rows).
  MLPs are tiny and always replicated.
- PP/SP/EP do not apply to these MLP workloads (no layers deep enough, no
  sequence axis, no experts) — recorded deliberately, mirroring SURVEY
  §2.10's analysis.

Everything is expressed with ``jax.sharding`` + jit (GSPMD); there is no
hand-written collective on the training path.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (sample/ray) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard the flat hash table across the model axis (TP)."""
    return NamedSharding(mesh, P("model"))


def shard_params(params, mesh: Mesh, shard_tables: bool = False):
    """Place a parameter pytree on the mesh: tables optionally TP-sharded
    (1-D leaves above 1M elements), everything else replicated."""
    rep = replicated(mesh)
    tab = table_sharding(mesh)

    def place(x):
        if shard_tables and x.ndim == 1 and x.size >= (1 << 20):
            return jax.device_put(x, tab)
        return jax.device_put(x, rep)

    return jax.tree.map(place, params)

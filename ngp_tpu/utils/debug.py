"""Numerics debugging: NaN/Inf checks for pytrees (SURVEY §5 — the
functional substitute for the sanitizers the reference doesn't have)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def find_nonfinite(tree, prefix: str = "") -> list[str]:
    """Paths of leaves containing NaN/Inf."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(prefix + jax.tree_util.keystr(path))
    return bad


def assert_finite(tree, name: str = "pytree") -> None:
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"{name} has non-finite leaves: {bad}")

#!/usr/bin/env python3
"""Microbenchmark: device-side sort / gather primitives that would power a
sorted-window encode (selection restricted to a 128-row table window per
sample tile instead of a full-R one-hot).

Feasibility numbers needed:
  - sort_key_val of the per-level row ids (2^18 keys, or 16 levels packed
    into one 4M-key sort)
  - inverse-permutation gather of the (N, 2) per-level features
  - segment histogram + cumsum (work-list construction)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """block_until_ready LIES under the axon tunnel — force a real
    device->host read of one element."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    N = 1 << 18
    L = 16
    R = 1 << 13

    rows18 = jax.random.randint(key, (N,), 0, R, jnp.int32)
    vals18 = jnp.arange(N, dtype=jnp.int32)
    rowsLN = jax.random.randint(key, (L, N), 0, R, jnp.int32)
    # packed: level in high bits → one sort orders (level, row)
    packed = (jnp.arange(L, dtype=jnp.int32)[:, None] * R + rowsLN).reshape(-1)
    valsLN = jnp.tile(jnp.arange(N, dtype=jnp.int32), (L,)).reshape(-1)

    sort1 = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
    t = timeit(sort1, rows18, vals18)
    print(f"sort_key_val 2^18: {t:.2f} ms  ({t * L:.1f} ms for {L} levels)")

    t = timeit(sort1, packed, valsLN)
    print(f"sort_key_val packed {L}x2^18 = 4M: {t:.2f} ms")

    # batched: vmap the per-level sort (XLA may parallelize poorly/well)
    sortb = jax.jit(jax.vmap(lambda k, v: jax.lax.sort_key_val(k, v)))
    vb = jnp.tile(vals18, (L, 1))
    t = timeit(sortb, rowsLN, vb)
    print(f"vmapped sort {L}x(2^18): {t:.2f} ms")

    # inverse-permutation gather: feats (N,2) picked by perm (N,)
    feats = jax.random.normal(key, (N, 2), jnp.float32)
    perm = jax.random.permutation(key, N)
    gath = jax.jit(lambda f, p: f[p])
    t = timeit(gath, feats, perm)
    print(f"gather (2^18,2) by perm: {t:.2f} ms  (x{L} = {t * L:.1f} ms)")

    featsL = jax.random.normal(key, (L, N, 2), jnp.float32)
    permL = jnp.tile(perm, (L, 1))
    gathL = jax.jit(jax.vmap(lambda f, p: f[p]))
    t = timeit(gathL, featsL, permL)
    print(f"vmapped gather {L}x(2^18,2): {t:.2f} ms")

    # scatter variant (write-to-slot instead of gather-back)
    scat = jax.jit(lambda f, p: jnp.zeros_like(f).at[p].set(f))
    t = timeit(scat, feats, perm)
    print(f"scatter (2^18,2) by perm: {t:.2f} ms")

    # histogram over R bins + cumsum (work-list construction)
    hist = jax.jit(lambda r: jnp.cumsum(jnp.zeros((R,), jnp.int32).at[r].add(1)))
    t = timeit(hist, rows18)
    print(f"histogram+cumsum R={R}: {t:.2f} ms")

    # ONE-HOT baseline at these shapes for context: (2048, R) x (R, 128)
    T0 = 2048
    oh = jax.random.normal(key, (T0, R), jnp.bfloat16)
    tbl = jax.random.normal(key, (R, 128), jnp.bfloat16)
    mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    t = timeit(mm, oh, tbl, reps=50)
    per_level = t * (N // T0)
    print(f"selection matmul tile ({T0},{R})x({R},128): {t:.3f} ms "
          f"-> {per_level:.1f} ms/level fwd, {per_level * L:.0f} ms total")

    # windowed equivalent: (2048, 128) x (128, 128) x (n_tiles + R/128 items)
    W = 128
    ohw = jax.random.normal(key, (T0, W), jnp.bfloat16)
    tblw = jax.random.normal(key, (W, 128), jnp.bfloat16)
    t = timeit(mm, ohw, tblw, reps=50)
    items = (N // T0) + R // W
    print(f"windowed matmul ({T0},{W})x({W},128): {t:.3f} ms "
          f"-> {t * items:.1f} ms/level fwd at {items} work items")


if __name__ == "__main__":
    main()

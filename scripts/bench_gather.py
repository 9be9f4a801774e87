#!/usr/bin/env python3
"""Microbenchmark the candidate encode-selection primitives on the chip.

The blocked-grid encode needs, per (sample, level), ONE 128-lane row from a
(R, 128) table. Candidate implementations:
  a) one-hot bf16 MXU matmul (current Pallas kernel)  — cost ∝ N·R·128
  b) XLA row gather (take_along_axis over axis=1)     — cost ∝ N rows
  c) XLA scatter-add of rows (the backward of b)
This measures (b) and (c) at the training shape (N=2^18, L=16, R=2^13) to
decide whether the forward/backward should move off the one-hot matmul.

    python scripts/bench_gather.py [--n 262144] [--levels 16] [--rows 13]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# persistent XLA compile cache: today's tunnel compiles run 4-10 min;
# cached reloads are seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def bench(fn, *args, n=20, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    return (time.time() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 18)
    p.add_argument("--levels", type=int, default=16)
    p.add_argument("--rows", type=int, default=13)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform, flush=True)
    N, L, R = args.n, args.levels, 1 << args.rows
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (L, R, 128), jnp.float32)
    rows = jax.random.randint(jax.random.PRNGKey(1), (L, N), 0, R)
    vals = jax.random.normal(jax.random.PRNGKey(2), (L, N, 128))
    nrows = N * L

    # (b) row gather: (L, R, 128)[l, rows[l, i]] -> (L, N, 128)
    def gather_rows(t, r):
        return jnp.take_along_axis(t, r[:, :, None], axis=1)

    f = jax.jit(gather_rows)
    dt = bench(f, table, rows)
    print(f"gather f32 rows: {dt * 1e3:.2f} ms  "
          f"({nrows / dt / 1e9:.2f} G rows/s, "
          f"{nrows * 512 / dt / 1e9:.0f} GB/s)", flush=True)

    tb = table.astype(jnp.bfloat16)
    dt = bench(jax.jit(gather_rows), tb, rows)
    print(f"gather bf16 rows: {dt * 1e3:.2f} ms  "
          f"({nrows / dt / 1e9:.2f} G rows/s)", flush=True)

    # (b') vmap-over-levels variant (sometimes lowers differently)
    f2 = jax.jit(lambda t, r: jax.vmap(lambda tl, rl: tl[rl])(t, r))
    dt = bench(f2, table, rows)
    print(f"gather f32 rows (vmap-index): {dt * 1e3:.2f} ms  "
          f"({nrows / dt / 1e9:.2f} G rows/s)", flush=True)

    # (c) scatter-add rows back (encode backward w.r.t. table)
    def scatter_rows(r, v):
        return jnp.zeros((L, R, 128)).at[
            jnp.arange(L)[:, None], r].add(v)

    f3 = jax.jit(scatter_rows)
    dt = bench(f3, rows, vals, n=5)
    print(f"scatter-add f32 rows: {dt * 1e3:.2f} ms  "
          f"({nrows / dt / 1e9:.2f} G rows/s)", flush=True)

    # (c') sort-based segment-sum alternative
    def seg_sum(r, v):
        flat_r = (r + (jnp.arange(L) * R)[:, None]).reshape(-1)
        order = jnp.argsort(flat_r)
        sr = flat_r[order]
        sv = v.reshape(-1, 128)[order]
        return jax.ops.segment_sum(sv, sr, num_segments=L * R)

    f4 = jax.jit(seg_sum)
    dt = bench(f4, rows, vals, n=3)
    print(f"sort+segment-sum: {dt * 1e3:.2f} ms", flush=True)

    # 2-float-row gather at tcnn granularity for comparison
    flat = jax.random.normal(key, (L * R * 64,))
    idx2 = jax.random.randint(jax.random.PRNGKey(3), (L, 8, N), 0, L * R * 64)
    f5 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = bench(f5, flat, idx2, n=5)
    print(f"gather scalar (tcnn-style, {L * 8 * N / 1e6:.0f}M): "
          f"{dt * 1e3:.2f} ms ({L * 8 * N / dt / 1e9:.2f} G/s)", flush=True)


if __name__ == "__main__":
    main()

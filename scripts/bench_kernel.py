#!/usr/bin/env python3
"""Microbenchmark the blocked-grid Pallas kernel vs the XLA gather paths
on the current accelerator. Run when the chip is reachable:

    python scripts/bench_kernel.py [--n 262144] [--levels 16] [--rows 11]
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
    p.add_argument("--rows", type=int, default=11)
    p.add_argument("--tile", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from ngp_tpu.kernels.blocked_grid import BlockedGridMeta, encode_reference
    from ngp_tpu.kernels.hashgrid import HashGridMeta, hashgrid_encode
    from ngp_tpu.kernels.hashgrid_pallas import blocked_grid_encode

    print("platform:", jax.devices()[0].platform, flush=True)
    N, L = args.n, args.levels
    meta = BlockedGridMeta(n_dims=3, n_levels=L, base_resolution=16,
                           per_level_scale=1.447, log2_rows=args.rows)
    table = meta.init_params(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    print(f"blocked table {table.shape} = "
          f"{table.size * 4 / 1e6:.0f} MB", flush=True)

    fwd = jax.jit(lambda t, p: blocked_grid_encode(t, p, meta, args.tile))
    dt = bench(fwd, table, pos)
    print(f"pallas fwd: {dt * 1e3:.2f} ms  "
          f"({N * L / dt / 1e9:.2f} G lookups/s)", flush=True)

    g = jax.jit(jax.grad(lambda t, p: jnp.sum(
        blocked_grid_encode(t, p, meta, args.tile) ** 2), argnums=(0, 1)))
    dt = bench(g, table, pos, n=10)
    print(f"pallas fwd+bwd: {dt * 1e3:.2f} ms", flush=True)

    # XLA gather baseline (tcnn layout)
    hmeta = HashGridMeta(n_dims=3, n_levels=L, n_features_per_level=2,
                         log2_hashmap_size=args.rows + 6,
                         base_resolution=16, per_level_scale=1.447)
    htable = hmeta.init_params(jax.random.PRNGKey(0))
    hf = jax.jit(lambda t, p: hashgrid_encode(t, p, hmeta))
    dt = bench(hf, htable, pos, n=5)
    print(f"xla-gather fwd: {dt * 1e3:.2f} ms", flush=True)
    hg = jax.jit(jax.grad(lambda t, p: jnp.sum(
        hashgrid_encode(t, p, hmeta) ** 2), argnums=(0, 1)))
    dt = bench(hg, htable, pos, n=3)
    print(f"xla-gather fwd+bwd: {dt * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

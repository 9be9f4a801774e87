"""Low-discrepancy and stratified samplers.

Equivalents of the reference's halton23 / sobol2 / stratify2 kernels
(ref: src/testbed_image.cu:34-76, random_val.cuh) as vectorized jnp ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def radical_inverse_base2(i: jax.Array) -> jax.Array:
    """Van der Corput sequence: bit-reverse of the index, as float in [0,1)."""
    i = i.astype(jnp.uint32)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = (i << 16) | (i >> 16)
    return i.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def radical_inverse(i: jax.Array, base: int, n_digits: int = 20) -> jax.Array:
    """Radical inverse in an arbitrary base (fixed digit count for jit)."""
    i = i.astype(jnp.uint64) if base > 3 else i.astype(jnp.uint32)
    inv_base = 1.0 / base
    result = jnp.zeros(i.shape, jnp.float32)
    factor = jnp.float32(inv_base)
    for _ in range(n_digits):
        digit = (i % base).astype(jnp.float32)
        result = result + digit * factor
        factor = factor * inv_base
        i = i // base
    return result


def halton23(indices: jax.Array) -> jax.Array:
    """(N,) indices → (N, 2) Halton points (bases 2 and 3)."""
    return jnp.stack([radical_inverse_base2(indices),
                      radical_inverse(indices, 3)], axis=-1)


# Sobol dimension-2 direction numbers (primitive polynomial x^2+x+1, m=[1,3]).
def _sobol_dim2_directions() -> np.ndarray:
    v = np.zeros(32, np.uint32)
    m = [1, 3]
    a = 1  # encoded coefficient
    s = 2
    for i in range(s):
        v[i] = np.uint32(m[i] << (31 - i))
    for i in range(s, 32):
        val = v[i - s] ^ (v[i - s] >> s)
        for k in range(1, s):
            if (a >> (s - 1 - k)) & 1:
                val ^= v[i - k]
        v[i] = val
    return v


_SOBOL_V2 = _sobol_dim2_directions()


def sobol2(indices: jax.Array, seed: int = 0) -> jax.Array:
    """(N,) indices → (N, 2) Sobol points (dims 1 and 2), XOR-scrambled."""
    i = indices.astype(jnp.uint32)
    # dim 1 of Sobol = van der Corput
    x = radical_inverse_base2(i)
    v = jnp.asarray(_SOBOL_V2, jnp.uint32)
    acc = jnp.zeros_like(i)
    for bit in range(32):
        acc = acc ^ jnp.where((i >> bit) & 1 > 0, v[bit], jnp.uint32(0))
    if seed:
        acc = acc ^ (jnp.uint32(seed) * jnp.uint32(2654435761))
    y = acc.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    return jnp.stack([x, y], axis=-1)


def stratify2(positions: jax.Array, log2_batch_size: int) -> jax.Array:
    """Stratify uniform (N,2) samples over a sqrt(B)×sqrt(B) grid per batch
    (ref: stratify2_kernel src/testbed_image.cu:62-76). Requires an even
    power-of-two batch; callers fall back to plain uniform otherwise."""
    n = positions.shape[0]
    log2_size = log2_batch_size // 2
    size = 1 << log2_size
    idx = jnp.arange(n, dtype=jnp.uint32) & jnp.uint32((1 << log2_batch_size) - 1)
    x = (idx & jnp.uint32(size - 1)).astype(jnp.float32)
    y = (idx >> log2_size).astype(jnp.float32)
    cell = jnp.stack([x, y], axis=-1)
    return positions / size + cell / size


def sample_positions(mode: str, key: jax.Array, batch_size: int,
                     step: jax.Array | int, seed: int = 1337) -> jax.Array:
    """Generate a (B, 2) training-position batch like Testbed::train_image
    (ref: src/testbed_image.cu:227-252)."""
    mode = mode.lower()
    if mode == "halton":
        base = jnp.uint32(batch_size) * jnp.uint32(step)
        return halton23(base + jnp.arange(batch_size, dtype=jnp.uint32))
    if mode == "sobol":
        base = jnp.uint32(batch_size) * jnp.uint32(step)
        return sobol2(base + jnp.arange(batch_size, dtype=jnp.uint32), seed)
    pos = jax.random.uniform(key, (batch_size, 2), jnp.float32)
    if mode == "stratified":
        lb = int(batch_size).bit_length() - 1
        if (1 << lb) == batch_size and lb % 2 == 0:
            pos = stratify2(pos, lb)
    return pos

"""Quasi-Monte-Carlo helpers: radical inverse / Halton points.

TPU-native rebuild of mitsuba2's QMC utilities (src/libcore/qmc.cpp ::
RadicalInverse). Base-b digit reversal implemented with static loops
(bounded digit counts), vectorized over index arrays.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
          59, 61, 67, 71, 73, 79, 83, 89, 97, 101)


def radical_inverse_base2(i):
    """Van der Corput sequence: reverse the 32 bits of i (qmc.cpp)."""
    i = jnp.asarray(i, jnp.uint32)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i >> 1) & jnp.uint32(0x55555555))
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i >> 2) & jnp.uint32(0x33333333))
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i >> 4) & jnp.uint32(0x0F0F0F0F))
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i >> 8) & jnp.uint32(0x00FF00FF))
    i = (i << 16) | (i >> 16)
    return i.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def radical_inverse(i, base: int):
    """Radical inverse of i in `base` (static base -> static digit loop)."""
    if base == 2:
        return radical_inverse_base2(i)
    i = jnp.asarray(i, jnp.uint32)
    n_digits = int(np.ceil(32 * np.log(2) / np.log(base))) + 1
    inv_base = np.float32(1.0 / base)
    result = jnp.zeros(i.shape, jnp.float32)
    scale = jnp.float32(1.0)
    for _ in range(n_digits):
        digit = (i % base).astype(jnp.float32)
        scale = scale * inv_base
        result = result + digit * scale
        i = i // base
    return jnp.minimum(result, jnp.float32(1.0 - 1e-7))


def halton(i, dim: int):
    """dim-th Halton coordinate of sample i (dim < len(PRIMES))."""
    return radical_inverse(i, PRIMES[dim])


def halton_points(n: int, dims: int):
    """(n, dims) Halton point set (host-friendly, used for quadrature and
    stratified warm starts)."""
    i = jnp.arange(n, dtype=jnp.uint32)
    return jnp.stack([halton(i, d) for d in range(dims)], axis=-1)

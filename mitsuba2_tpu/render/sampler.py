"""Wavefront samplers.

TPU-native rebuild of mitsuba2's Sampler layer (src/librender/sampler.cpp,
src/samplers/independent.cpp — the reference ships only `independent`; the
stratified and low-discrepancy samplers below match the mitsuba 0.5/3
plugins of the same names as capability extensions):

- `independent`: one decorrelated PCG32 stream per lane, seeded from
  (base_seed, lane index) through a TEA hash. The correctness baseline and
  the default (existing goldens depend on its stream).
- `stratified`: dimension d of pixel p uses stratum (spp_index + shift(p,
  d)) mod spp jittered within the stratum — a cyclic-shift permutation per
  (pixel, dimension), exact for any spp, fully vectorized.
- `ldsampler`: Halton radical inverse of the sample index in a per-
  dimension prime base, Cranley-Patterson rotated per (pixel, dimension,
  seed) — rotation keeps the estimator unbiased while the point set keeps
  its low-discrepancy stratification. Dimensions cycle through 16 primes
  (random padding decorrelates reuse across bounces, standard practice).

All samplers share the functional `next_1d`/`next_2d` protocol and are
pytrees, so they flow through jit/scan/grad; the dimension counter is a
traced scalar carried through the bounce scan.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import pcg32, qmc

# numpy, not jnp: a device constant at module level would initialize the
# accelerator backend at import time
_GOLDEN = np.uint32(0x9E3779B9)


def _hash3(a, b, c):
    """Cheap uint32 mix (Wang-style) of three values."""
    h = (a ^ (b * _GOLDEN)) + (c * jnp.uint32(0x85EBCA6B))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    return h ^ (h >> 16)


@struct.dataclass
class Sampler:
    """`independent` (PCG32 per lane)."""
    state: pcg32.PCG32State

    @staticmethod
    def seed(base_seed, n_lanes: int = None, lane_idx=None) -> "Sampler":
        """Seed one PCG32 stream per lane (independent.cpp::seed)."""
        if lane_idx is None:
            lane_idx = jnp.arange(n_lanes, dtype=jnp.uint32)
        return Sampler(state=pcg32.seed_lanes(base_seed, lane_idx))

    def next_1d(self) -> Tuple[jnp.ndarray, "Sampler"]:
        f, st = pcg32.next_float32(self.state)
        return f, Sampler(state=st)

    def next_2d(self) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], "Sampler"]:
        """Two uniforms as a PLANAR (u, v) tuple (never an (N, 2) stack —
        see core/vec.py's layout note)."""
        f1, st = pcg32.next_float32(self.state)
        f2, st = pcg32.next_float32(st)
        return (f1, f2), Sampler(state=st)


@struct.dataclass
class StratifiedSampler:
    """Per-(pixel, dimension) stratified jittered sampling."""
    rng: pcg32.PCG32State     # jitter stream (per lane)
    pix: jnp.ndarray          # (N,) uint32 pixel id
    sidx: jnp.ndarray         # (N,) uint32 stratum (spp position)
    dim: jnp.ndarray          # () uint32 dimension counter (traced)
    seed: jnp.ndarray         # () uint32
    spp: int = struct.field(pytree_node=False, default=1)

    def _draw(self, rng_state, dim):
        jit_, st = pcg32.next_float32(rng_state)
        shift = _hash3(self.pix, dim, self.seed) % jnp.uint32(self.spp)
        stratum = (self.sidx + shift) % jnp.uint32(self.spp)
        v = (stratum.astype(jnp.float32) + jit_) * (1.0 / self.spp)
        return jnp.minimum(v, 1.0 - 1e-7), st

    def next_1d(self):
        v, st = self._draw(self.rng, self.dim)
        return v, self.replace(rng=st, dim=self.dim + 1)

    def next_2d(self):
        v1, st = self._draw(self.rng, self.dim)
        v2, st2 = self._draw(st, self.dim + 1)
        return (v1, v2), self.replace(rng=st2, dim=self.dim + 2)


_LD_PRIMES = qmc.PRIMES[:16]


def _halton_switch(dim, i):
    """Radical inverse of i in PRIMES[dim % 16]; dim may be traced."""
    branches = tuple(
        (lambda idx, b=b: qmc.radical_inverse(idx, b)) for b in _LD_PRIMES)
    return jax.lax.switch((dim % jnp.uint32(16)).astype(jnp.int32),
                          branches, i)


@struct.dataclass
class LDSampler:
    """Halton low-discrepancy sampler with Cranley-Patterson rotation."""
    pix: jnp.ndarray          # (N,) uint32 pixel id
    sidx: jnp.ndarray         # (N,) uint32 sample index within the pass
    dim: jnp.ndarray          # () uint32 dimension counter (traced)
    seed: jnp.ndarray         # () uint32

    def _draw(self, dim):
        h = _halton_switch(dim, self.sidx)
        rot = _hash3(self.pix, dim, self.seed).astype(jnp.float32) * \
            jnp.float32(2.3283064365386963e-10)
        v = h + rot
        return jnp.where(v >= 1.0, v - 1.0, v)

    def next_1d(self):
        return self._draw(self.dim), self.replace(dim=self.dim + 1)

    def next_2d(self):
        return ((self._draw(self.dim), self._draw(self.dim + 1)),
                self.replace(dim=self.dim + 2))


def make_sampler(kind: str, seed, lane_idx, n_pixels: int, spp: int):
    """Factory: lane layout is (spp, pixels) flattened (render_pass)."""
    if kind == "independent":
        return Sampler.seed(seed, lane_idx=lane_idx)
    seed = jnp.uint32(seed)
    pix = (lane_idx % jnp.uint32(n_pixels)).astype(jnp.uint32)
    sidx = (lane_idx // jnp.uint32(n_pixels)).astype(jnp.uint32)
    if kind == "stratified":
        # jitter stream decorrelated from the independent sampler's
        rng = pcg32.seed_lanes(seed ^ jnp.uint32(0xC0FFEE11), lane_idx)
        return StratifiedSampler(rng=rng, pix=pix, sidx=sidx,
                                 dim=jnp.uint32(0), seed=seed, spp=spp)
    if kind in ("ldsampler", "halton"):
        return LDSampler(pix=pix, sidx=sidx, dim=jnp.uint32(0), seed=seed)
    raise ValueError(f"unknown sampler {kind!r}")

"""Wavefront sampler.

TPU-native rebuild of mitsuba2's Sampler/`independent` plugin
(src/librender/sampler.cpp, src/samplers/independent.cpp): a whole lane
array of decorrelated PCG32 streams, seeded from (base_seed, lane index)
through a TEA hash. `next_1d`/`next_2d` mirror the reference API but
operate on all lanes at once and thread the state functionally.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from ..core import pcg32


@struct.dataclass
class Sampler:
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

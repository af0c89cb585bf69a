"""Spec — planar (struct-of-arrays) colors, the wavefront's radiance type.

Same layout finding as core/vec.py: an (N, C) color array with C in
{1, 3, 4} pads its minor dim C -> 128 lanes on TPU, wasting ~40x VPU
throughput and HBM bandwidth on every radiance/throughput op in the path
tracer. A Spec instead holds C separate (N,) channel arrays — each tiled
densely — so color arithmetic runs at full vector-unit rate.

The channel count is static (part of the pytree structure), matching the
render config's color mode: mono=1, rgb=3, spectral=4 (hero wavelengths).
Spec covers both roles the reference's `Spectrum` template plays
(include/mitsuba/core/spectrum.h): radiance carriers and per-channel
throughput/weights. Conversion to packed (N, C) rows happens only at true
boundaries (film develop, host I/O).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct


def _coerce(o, n):
    """Broadcast a scalar / (N,) array to n channels."""
    if isinstance(o, Spec):
        if len(o.ch) == n:
            return o.ch
        if len(o.ch) == 1:
            return (o.ch[0],) * n
        raise ValueError(f"channel mismatch: {len(o.ch)} vs {n}")
    return (o,) * n


@struct.dataclass
class Spec:
    ch: Tuple[jnp.ndarray, ...] = struct.field(pytree_node=True)

    # ---- construction -------------------------------------------------------
    @staticmethod
    def from_array(a) -> "Spec":
        """(..., C) array -> Spec (boundary conversion)."""
        a = jnp.asarray(a, jnp.float32)
        return Spec(tuple(a[..., i] for i in range(a.shape[-1])))

    @staticmethod
    def full(shape, vals) -> "Spec":
        return Spec(tuple(jnp.full(shape, float(v), jnp.float32) for v in vals))

    @staticmethod
    def zeros(shape, n: int) -> "Spec":
        z = jnp.zeros(shape, jnp.float32)
        return Spec((z,) * n)

    @staticmethod
    def ones(shape, n: int) -> "Spec":
        o = jnp.ones(shape, jnp.float32)
        return Spec((o,) * n)

    @staticmethod
    def splat(x, n: int) -> "Spec":
        """One (N,) array replicated across n channels (gray)."""
        return Spec((jnp.asarray(x, jnp.float32),) * n)

    @staticmethod
    def gather(table, idx) -> "Spec":
        """Row gather from a (P, C) table -> planar channels."""
        return Spec(tuple(table[idx, i] for i in range(table.shape[-1])))

    def to_array(self):
        """Spec -> (..., C) array (boundary conversion)."""
        return jnp.stack(jnp.broadcast_arrays(*self.ch), -1)

    # ---- shape/meta ----------------------------------------------------------
    @property
    def n(self) -> int:
        return len(self.ch)

    @property
    def shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(c) for c in self.ch))

    def __len__(self):
        return len(self.ch)

    def __getitem__(self, i):
        return self.ch[i]

    def map(self, f) -> "Spec":
        return Spec(tuple(f(c) for c in self.ch))

    # ---- arithmetic ----------------------------------------------------------
    def __add__(self, o):
        oc = _coerce(o, len(self.ch))
        return Spec(tuple(a + b for a, b in zip(self.ch, oc)))

    __radd__ = __add__

    def __sub__(self, o):
        oc = _coerce(o, len(self.ch))
        return Spec(tuple(a - b for a, b in zip(self.ch, oc)))

    def __rsub__(self, o):
        oc = _coerce(o, len(self.ch))
        return Spec(tuple(b - a for a, b in zip(self.ch, oc)))

    def __mul__(self, o):
        oc = _coerce(o, len(self.ch))
        return Spec(tuple(a * b for a, b in zip(self.ch, oc)))

    __rmul__ = __mul__

    def __truediv__(self, o):
        oc = _coerce(o, len(self.ch))
        return Spec(tuple(a / b for a, b in zip(self.ch, oc)))

    def __rtruediv__(self, o):
        oc = _coerce(o, len(self.ch))
        return Spec(tuple(b / a for a, b in zip(self.ch, oc)))

    def __pow__(self, p):
        return Spec(tuple(c ** p for c in self.ch))

    def __neg__(self):
        return Spec(tuple(-c for c in self.ch))

    # ---- reductions over the channel axis ------------------------------------
    def hmax(self):
        out = self.ch[0]
        for c in self.ch[1:]:
            out = jnp.maximum(out, c)
        return out

    def hmin(self):
        out = self.ch[0]
        for c in self.ch[1:]:
            out = jnp.minimum(out, c)
        return out

    def hsum(self):
        out = self.ch[0]
        for c in self.ch[1:]:
            out = out + c
        return out

    def hmean(self):
        return self.hsum() * (1.0 / len(self.ch))

    def any_positive(self):
        out = self.ch[0] > 0
        for c in self.ch[1:]:
            out = out | (c > 0)
        return out

    # ---- lane select ----------------------------------------------------------
    def masked(self, mask) -> "Spec":
        """Zero out lanes where mask is False (the `jnp.where(active[..., None],
        v, 0)` idiom)."""
        return Spec(tuple(jnp.where(mask, c, 0.0) for c in self.ch))


def swhere(mask, a, b) -> Spec:
    """Lane select between two Specs (scalars broadcast)."""
    if isinstance(a, Spec):
        n = len(a.ch)
    elif isinstance(b, Spec):
        n = len(b.ch)
    else:
        raise TypeError("swhere needs at least one Spec")
    ac = _coerce(a, n)
    bc = _coerce(b, n)
    return Spec(tuple(jnp.where(mask, x, y) for x, y in zip(ac, bc)))


def slerp(a: Spec, b: Spec, t) -> Spec:
    return a + (b - a) * t

"""Vec3 — planar (struct-of-arrays) 3-vectors, the wavefront's native type.

WHY THIS EXISTS (measured, see kernels/brute.py and the bench history):
TPU tiles the trailing two array dims as (8 sublanes x 128 lanes). An
(N, 3) float array therefore pads its minor dim 3 -> 128, and EVERY
elementwise op on that layout wastes ~40x VPU throughput and HBM
bandwidth; XLA does not re-layout it away (a (3, N) shape fares no
better). Holding x/y/z as three separate (N,) arrays — each tiled densely
— recovers the full vector unit: a prototype path tracer went from
~35 Mrays/s to ~490 Mrays/s on one chip from this change alone.

Vec3 is a flax pytree: it flows through jit/grad/vmap/shard_map, carries
operator overloads so vector expressions read like the reference's Enoki
code, and converts to/from (N, 3) arrays only at module boundaries that
genuinely need packed rows (host I/O, film).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from . import math as m


@struct.dataclass
class Vec3:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # ---- construction -------------------------------------------------------
    @staticmethod
    def from_array(a) -> "Vec3":
        """(..., 3) array -> Vec3 (boundary conversion)."""
        a = jnp.asarray(a, jnp.float32)
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def full(shape, cx, cy, cz) -> "Vec3":
        return Vec3(jnp.full(shape, cx, jnp.float32),
                    jnp.full(shape, cy, jnp.float32),
                    jnp.full(shape, cz, jnp.float32))

    @staticmethod
    def zeros(shape) -> "Vec3":
        z = jnp.zeros(shape, jnp.float32)
        return Vec3(z, z, z)

    @staticmethod
    def gather(table, idx) -> "Vec3":
        """Row gather from a (P, 3) table -> planar components."""
        return Vec3(table[idx, 0], table[idx, 1], table[idx, 2])

    def to_array(self):
        """Vec3 -> (..., 3) array (boundary conversion)."""
        return jnp.stack(jnp.broadcast_arrays(self.x, self.y, self.z), -1)

    @property
    def shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.x), jnp.shape(self.y),
                                    jnp.shape(self.z))

    # ---- arithmetic ----------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        inv = 1.0 / o
        return Vec3(self.x * inv, self.y * inv, self.z * inv)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)


@struct.dataclass
class Vec2:
    """Planar 2-vector (same layout rationale as Vec3) — used for uv
    coordinates, barycentrics, and film jitter."""
    x: jnp.ndarray
    y: jnp.ndarray

    @staticmethod
    def from_array(a) -> "Vec2":
        a = jnp.asarray(a, jnp.float32)
        return Vec2(a[..., 0], a[..., 1])

    @staticmethod
    def zeros(shape) -> "Vec2":
        z = jnp.zeros(shape, jnp.float32)
        return Vec2(z, z)

    @staticmethod
    def gather(table, idx) -> "Vec2":
        return Vec2(table[idx, 0], table[idx, 1])

    def to_array(self):
        return jnp.stack(jnp.broadcast_arrays(self.x, self.y), -1)

    @property
    def shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.x), jnp.shape(self.y))

    def __add__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x + o.x, self.y + o.y)
        if isinstance(o, (tuple, list)):
            return Vec2(self.x + o[0], self.y + o[1])
        return Vec2(self.x + o, self.y + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x - o.x, self.y - o.y)
        if isinstance(o, (tuple, list)):
            return Vec2(self.x - o[0], self.y - o[1])
        return Vec2(self.x - o, self.y - o)

    def __mul__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x * o.x, self.y * o.y)
        return Vec2(self.x * o, self.y * o)

    __rmul__ = __mul__


def as_vec2(v) -> Vec2:
    """Coerce an (..., 2) array / (x, y) tuple / Vec2 to Vec2."""
    if isinstance(v, Vec2):
        return v
    if isinstance(v, (tuple, list)):
        return Vec2(jnp.asarray(v[0], jnp.float32), jnp.asarray(v[1], jnp.float32))
    return Vec2.from_array(v)


def v2where(mask, a: Vec2, b: Vec2) -> Vec2:
    a = as_vec2(a) if not isinstance(a, Vec2) else a
    b = as_vec2(b) if not isinstance(b, Vec2) else b
    return Vec2(jnp.where(mask, a.x, b.x), jnp.where(mask, a.y, b.y))


# ---- free functions (match geometry.py's helper names) ----------------------

def vdot(a: Vec3, b: Vec3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def vcross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(a.y * b.z - a.z * b.y,
                a.z * b.x - a.x * b.z,
                a.x * b.y - a.y * b.x)


def vsqnorm(v: Vec3):
    return v.x * v.x + v.y * v.y + v.z * v.z


def vnorm(v: Vec3):
    return jnp.sqrt(jnp.maximum(vsqnorm(v), 0.0))


def vnormalize(v: Vec3) -> Vec3:
    inv = m.safe_rsqrt(vsqnorm(v))
    return Vec3(v.x * inv, v.y * inv, v.z * inv)


def vwhere(mask, a: Vec3, b: Vec3) -> Vec3:
    """Lane select; mask is (N,) — no [..., None] needed."""
    if not isinstance(a, Vec3):
        a = Vec3(a, a, a) if not isinstance(a, (tuple, list)) else Vec3(*a)
    if not isinstance(b, Vec3):
        b = Vec3(b, b, b) if not isinstance(b, (tuple, list)) else Vec3(*b)
    return Vec3(jnp.where(mask, a.x, b.x),
                jnp.where(mask, a.y, b.y),
                jnp.where(mask, a.z, b.z))


def vmax_abs(v: Vec3):
    return jnp.maximum(jnp.maximum(jnp.abs(v.x), jnp.abs(v.y)), jnp.abs(v.z))


def vlerp(a: Vec3, b: Vec3, t) -> Vec3:
    return a + (b - a) * t

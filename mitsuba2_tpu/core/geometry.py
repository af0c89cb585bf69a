"""Geometry core: rays, frames, bounding boxes, 4x4 transforms.

TPU-native rebuild of mitsuba2's geometry headers
(include/mitsuba/core/{ray,bbox,frame,transform,vector}.h). All records are
SoA pytrees of jnp arrays — a `Ray` holding N rays is a struct of (N, 3)
arrays, never an array of structs. Everything is jit/vmap/grad-safe.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import math as m


# ---------------------------------------------------------------------------
# Vector helpers (trailing axis = xyz)
# ---------------------------------------------------------------------------

def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def norm(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=keepdims), 0.0))


def squared_norm(v, keepdims=False):
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def normalize(v):
    return v * m.safe_rsqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def vec3(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32)), axis=-1)


def coordinate_system(n):
    """Build an orthonormal basis around unit vector n.

    Duff et al. 2017 branchless construction — same algorithm as mitsuba's
    `coordinate_system` (include/mitsuba/core/vector.h). n: (..., 3).
    Returns (s, t) with s x t = n.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack([1.0 + sign * n[..., 0] * n[..., 0] * a,
                   sign * b,
                   -sign * n[..., 0]], axis=-1)
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


# ---------------------------------------------------------------------------
# Frame — local shading coordinate system (include/mitsuba/core/frame.h)
# ---------------------------------------------------------------------------

@struct.dataclass
class Frame:
    """Shading frame; n is the +z axis in local coordinates."""
    s: jnp.ndarray  # (..., 3) tangent
    t: jnp.ndarray  # (..., 3) bitangent
    n: jnp.ndarray  # (..., 3) normal

    @staticmethod
    def from_n(n):
        s, t = coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v):
        return jnp.stack([dot(v, self.s), dot(v, self.t), dot(v, self.n)], axis=-1)

    def to_world(self, v):
        return (self.s * v[..., 0:1] + self.t * v[..., 1:2] + self.n * v[..., 2:3])

    # Frame::cos_theta and friends operate on LOCAL-space directions
    @staticmethod
    def cos_theta(v):
        return v[..., 2]

    @staticmethod
    def cos_theta_2(v):
        return v[..., 2] * v[..., 2]

    @staticmethod
    def sin_theta_2(v):
        return jnp.maximum(1.0 - v[..., 2] * v[..., 2], 0.0)

    @staticmethod
    def sin_theta(v):
        return jnp.sqrt(Frame.sin_theta_2(v))

    @staticmethod
    def tan_theta(v):
        return Frame.sin_theta(v) / jnp.where(v[..., 2] == 0, 1e-20, v[..., 2])

    @staticmethod
    def tan_theta_2(v):
        c2 = v[..., 2] * v[..., 2]
        return jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-20)

    @staticmethod
    def sin_phi(v):
        st = Frame.sin_theta(v)
        return jnp.where(st == 0, 0.0, jnp.clip(v[..., 1] / jnp.maximum(st, 1e-20), -1.0, 1.0))

    @staticmethod
    def cos_phi(v):
        st = Frame.sin_theta(v)
        return jnp.where(st == 0, 1.0, jnp.clip(v[..., 0] / jnp.maximum(st, 1e-20), -1.0, 1.0))


# ---------------------------------------------------------------------------
# Ray (include/mitsuba/core/ray.h)
# ---------------------------------------------------------------------------

@struct.dataclass
class Ray:
    """A (batch of) rays. o/d: (..., 3); maxt/time: (...,).

    `wavelengths`: (..., C) — hero wavelengths in spectral mode, else a
    zero-width placeholder. Mirrors mitsuba's `Ray3f`.
    """
    o: jnp.ndarray
    d: jnp.ndarray
    maxt: jnp.ndarray
    time: jnp.ndarray
    wavelengths: jnp.ndarray

    @staticmethod
    def make(o, d, maxt=None, time=None, wavelengths=None):
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
        if maxt is None:
            maxt = jnp.full(batch, jnp.inf, jnp.float32)
        else:
            maxt = jnp.broadcast_to(jnp.asarray(maxt, jnp.float32), batch)
        if time is None:
            time = jnp.zeros(batch, jnp.float32)
        else:
            time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), batch)
        if wavelengths is None:
            wavelengths = jnp.zeros(batch + (0,), jnp.float32)
        return Ray(o=o, d=d, maxt=maxt, time=time, wavelengths=wavelengths)

    def at(self, t):
        return self.o + self.d * t[..., None]


def spawn_ray(p, d, n=None, maxt=None, wavelengths=None, time=None):
    """Offset ray origin along the geometric normal to avoid self-intersection
    (mirrors Interaction::spawn_ray, include/mitsuba/render/interaction.h)."""
    if n is not None:
        offset = n * m.mulsign(jnp.float32(m.RAY_EPSILON) *
                               (1.0 + jnp.max(jnp.abs(p), axis=-1, keepdims=True)),
                               dot(n, d, keepdims=True))
        o = p + offset
    else:
        o = p
    return Ray.make(o, d, maxt=maxt, time=time, wavelengths=wavelengths)


# ---------------------------------------------------------------------------
# AABB ops (include/mitsuba/core/bbox.h)
# ---------------------------------------------------------------------------

def ray_bbox_slab(o, inv_d, bb_min, bb_max, maxt):
    """Slab test. All args broadcast; returns (hit, tmin, tmax).

    Follows BoundingBox::ray_intersect: handles inf*0 by relying on IEEE
    min/max NaN suppression via jnp.minimum/maximum ordering.
    """
    t0 = (bb_min - o) * inv_d
    t1 = (bb_max - o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tmin = jnp.max(tsmall, axis=-1)
    tmax = jnp.min(tbig, axis=-1)
    hit = (tmin <= tmax) & (tmax >= 0.0) & (tmin <= maxt)
    return hit, tmin, tmax


# ---------------------------------------------------------------------------
# Transform4 (include/mitsuba/core/transform.h) — host-constructed, device-applied
# ---------------------------------------------------------------------------

@struct.dataclass
class Transform4:
    """4x4 affine transform with cached inverse-transpose (like mitsuba's
    Transform4f which caches the inverse). matrix/inverse: (4, 4)."""
    matrix: jnp.ndarray
    inverse_transpose: jnp.ndarray

    @staticmethod
    def from_matrix(mat) -> "Transform4":
        mat = jnp.asarray(mat, jnp.float32).reshape(4, 4)
        inv_t = jnp.linalg.inv(mat).T.astype(jnp.float32)
        return Transform4(matrix=mat, inverse_transpose=inv_t)

    @staticmethod
    def identity() -> "Transform4":
        return Transform4.from_matrix(jnp.eye(4))

    @staticmethod
    def translate(v) -> "Transform4":
        mat = np.eye(4, dtype=np.float32)
        mat[:3, 3] = np.asarray(v, np.float32)
        return Transform4.from_matrix(mat)

    @staticmethod
    def scale(v) -> "Transform4":
        v = np.broadcast_to(np.asarray(v, np.float32), (3,))
        mat = np.diag(np.concatenate([v, [1.0]]).astype(np.float32))
        return Transform4.from_matrix(mat)

    @staticmethod
    def rotate(axis, angle_deg) -> "Transform4":
        axis = np.asarray(axis, np.float64)
        axis = axis / np.linalg.norm(axis)
        th = np.deg2rad(float(angle_deg))
        c, s = np.cos(th), np.sin(th)
        x, y, z = axis
        R = np.array([
            [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s, 0],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s, 0],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c), 0],
            [0, 0, 0, 1]], dtype=np.float32)
        return Transform4.from_matrix(R)

    @staticmethod
    def look_at(origin, target, up) -> "Transform4":
        """Camera-to-world: +z looks from origin toward target (mitsuba's
        Transform4f::look_at convention: left-handed +z forward, +y up,
        +x left... upstream uses dir=normalize(target-origin), left=normalize
        (cross(up,dir)), new_up=cross(dir,left))."""
        origin = np.asarray(origin, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)
        dirv = target - origin
        dirv = dirv / np.linalg.norm(dirv)
        left = np.cross(up / np.linalg.norm(up), dirv)
        left = left / np.linalg.norm(left)
        new_up = np.cross(dirv, left)
        mat = np.eye(4, dtype=np.float32)
        mat[:3, 0] = left
        mat[:3, 1] = new_up
        mat[:3, 2] = dirv
        mat[:3, 3] = origin
        return Transform4.from_matrix(mat)

    @staticmethod
    def perspective(fov_deg, near, far) -> "Transform4":
        """Perspective projection matching mitsuba's
        Transform4f::perspective (maps view frustum to [0,1]^2 x [0,1])."""
        recip = 1.0 / (far - near)
        tan_half = np.tan(np.deg2rad(float(fov_deg)) * 0.5)
        cot = 1.0 / tan_half
        mat = np.array([
            [cot, 0, 0, 0],
            [0, cot, 0, 0],
            [0, 0, far * recip, -near * far * recip],
            [0, 0, 1, 0]], dtype=np.float32)
        return Transform4.from_matrix(mat)

    def __matmul__(self, other: "Transform4") -> "Transform4":
        return Transform4(
            matrix=self.matrix @ other.matrix,
            inverse_transpose=self.inverse_transpose @ other.inverse_transpose)

    def inv(self) -> "Transform4":
        return Transform4(matrix=self.inverse_transpose.T,
                          inverse_transpose=self.matrix.T)

    def apply_point(self, p):
        r = p @ self.matrix[:3, :3].T + self.matrix[:3, 3]
        w = p @ self.matrix[3, :3].T + self.matrix[3, 3]
        return r / w[..., None]

    def apply_vector(self, v):
        return v @ self.matrix[:3, :3].T

    def apply_normal(self, n):
        return n @ self.inverse_transpose[:3, :3].T


def sph_dir(theta, phi):
    """Spherical to cartesian unit vector (z-up)."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([st * cp, st * sp, ct], axis=-1)


def dir_sph(v):
    """Cartesian to (theta, phi)."""
    theta = m.safe_acos(v[..., 2])
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    return theta, phi

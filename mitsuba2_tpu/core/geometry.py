"""Geometry core: rays, frames, bounding boxes, 4x4 transforms.

TPU-native rebuild of mitsuba2's geometry headers
(include/mitsuba/core/{ray,bbox,frame,transform,vector}.h). All records are
SoA pytrees — and since the vec.py layout finding (TPU pads an (N, 3)
array's minor dim to 128 lanes, wasting ~40x VPU throughput), per-lane
3-vectors are PLANAR `Vec3` structs of (N,) component arrays. The array
helpers below (dot/cross/normalize on (..., 3)) remain for host-side code
and small fixed-size math (transforms, Mueller matrices).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import math as m
from .vec import (Vec3, vcross, vdot, vnorm, vnormalize, vsqnorm,  # noqa: F401
                  vwhere, vmax_abs)


def as_vec3(v) -> Vec3:
    """Coerce an (..., 3) array (or Vec3) to Vec3 — boundary adapter."""
    if isinstance(v, Vec3):
        return v
    return Vec3.from_array(v)


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


def coordinate_system(n: Vec3):
    """Build an orthonormal basis around unit Vec3 n.

    Duff et al. 2017 branchless construction — same algorithm as mitsuba's
    `coordinate_system` (include/mitsuba/core/vector.h). Returns (s, t)
    with s x t = n.
    """
    sign = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    s = Vec3(1.0 + sign * n.x * n.x * a, sign * b, -sign * n.x)
    t = Vec3(b, sign + n.y * n.y * a, -n.y)
    return s, t


# ---------------------------------------------------------------------------
# Frame — local shading coordinate system (include/mitsuba/core/frame.h)
# ---------------------------------------------------------------------------

@struct.dataclass
class Frame:
    """Shading frame; n is the +z axis in local coordinates. All planar."""
    s: Vec3  # tangent
    t: Vec3  # bitangent
    n: Vec3  # normal

    @staticmethod
    def from_n(n) -> "Frame":
        n = as_vec3(n)
        s, t = coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v: Vec3) -> Vec3:
        v = as_vec3(v)
        return Vec3(vdot(v, self.s), vdot(v, self.t), vdot(v, self.n))

    def to_world(self, v: Vec3) -> Vec3:
        v = as_vec3(v)
        return Vec3(self.s.x * v.x + self.t.x * v.y + self.n.x * v.z,
                    self.s.y * v.x + self.t.y * v.y + self.n.y * v.z,
                    self.s.z * v.x + self.t.z * v.y + self.n.z * v.z)

    # Frame::cos_theta and friends operate on LOCAL-space Vec3 directions
    @staticmethod
    def cos_theta(v: Vec3):
        return v.z

    @staticmethod
    def cos_theta_2(v: Vec3):
        return v.z * v.z

    @staticmethod
    def sin_theta_2(v: Vec3):
        return jnp.maximum(1.0 - v.z * v.z, 0.0)

    @staticmethod
    def sin_theta(v: Vec3):
        return jnp.sqrt(Frame.sin_theta_2(v))

    @staticmethod
    def tan_theta(v: Vec3):
        return Frame.sin_theta(v) / jnp.where(v.z == 0, 1e-20, v.z)

    @staticmethod
    def tan_theta_2(v: Vec3):
        c2 = v.z * v.z
        return jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-20)

    @staticmethod
    def sin_phi(v: Vec3):
        st = Frame.sin_theta(v)
        return jnp.where(st == 0, 0.0,
                         jnp.clip(v.y / jnp.maximum(st, 1e-20), -1.0, 1.0))

    @staticmethod
    def cos_phi(v: Vec3):
        st = Frame.sin_theta(v)
        return jnp.where(st == 0, 1.0,
                         jnp.clip(v.x / jnp.maximum(st, 1e-20), -1.0, 1.0))


# ---------------------------------------------------------------------------
# Ray (include/mitsuba/core/ray.h)
# ---------------------------------------------------------------------------

@struct.dataclass
class Ray:
    """A (batch of) rays. o/d: planar Vec3; maxt/time: (N,).

    `wavelengths`: planar Spec (4 hero wavelengths per lane) in spectral
    mode, else None. Mirrors mitsuba's `Ray3f`.
    """
    o: Vec3
    d: Vec3
    maxt: jnp.ndarray
    time: jnp.ndarray
    wavelengths: object = None

    @staticmethod
    def make(o, d, maxt=None, time=None, wavelengths=None):
        o = as_vec3(o)
        d = as_vec3(d)
        batch = jnp.broadcast_shapes(o.shape, d.shape)
        if maxt is None:
            maxt = jnp.full(batch, jnp.inf, jnp.float32)
        else:
            maxt = jnp.broadcast_to(jnp.asarray(maxt, jnp.float32), batch)
        if time is None:
            time = jnp.zeros(batch, jnp.float32)
        else:
            time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), batch)
        return Ray(o=o, d=d, maxt=maxt, time=time, wavelengths=wavelengths)

    def at(self, t) -> Vec3:
        return self.o + self.d * t


# ---------------------------------------------------------------------------
# AnimatedTransform (include/mitsuba/core/transform.h::AnimatedTransform)
# ---------------------------------------------------------------------------

def quat_from_matrix(R: "np.ndarray") -> "np.ndarray":
    """3x3 rotation -> quaternion (x, y, z, w), host numpy (Shepperd)."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z, w = q
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)


def quat_slerp(q0, q1, t):
    """Device slerp; q0/q1 (4,), t (...,) -> (..., 4)."""
    q0 = jnp.asarray(q0, jnp.float32)
    q1 = jnp.asarray(q1, jnp.float32)
    d = jnp.sum(q0 * q1)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.clip(jnp.abs(d), -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_t = jnp.sin(theta)
    t = jnp.asarray(t, jnp.float32)[..., None]
    small = sin_t < 1e-5
    w0 = jnp.where(small, 1.0 - t[..., 0], jnp.sin((1 - t[..., 0]) * theta) /
                   jnp.maximum(sin_t, 1e-9))
    w1 = jnp.where(small, t[..., 0], jnp.sin(t[..., 0] * theta) /
                   jnp.maximum(sin_t, 1e-9))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v: Vec3) -> Vec3:
    """Rotate planar Vec3 by per-lane quaternion q (..., 4):
    v' = v + 2 q_xyz x (q_xyz x v + w v)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx = 2.0 * (qy * v.z - qz * v.y)
    ty = 2.0 * (qz * v.x - qx * v.z)
    tz = 2.0 * (qx * v.y - qy * v.x)
    return Vec3(v.x + qw * tx + (qy * tz - qz * ty),
                v.y + qw * ty + (qz * tx - qx * tz),
                v.z + qw * tz + (qx * ty - qy * tx))


@struct.dataclass
class AnimatedTransform:
    """Keyframed affine transform (transform.h::AnimatedTransform): each
    key decomposed host-side into translation + rotation quaternion +
    scale/shear 3x3 via polar decomposition (enoki transform_decompose);
    eval lerps translation/scale and slerps rotation
    (transform_compose(M) = T * R * S). Two-key linear shutter is the
    common case (sensor motion blur); K keys supported via interval
    search on the (small) key table."""
    times: jnp.ndarray   # (K,)
    trans: jnp.ndarray   # (K, 3)
    quats: jnp.ndarray   # (K, 4) x,y,z,w
    scales: jnp.ndarray  # (K, 3, 3)

    @staticmethod
    def from_keys(times, matrices) -> "AnimatedTransform":
        times = np.asarray(times, np.float32)
        mats = [np.asarray(m, np.float64).reshape(4, 4) for m in matrices]
        tr, qu, sc = [], [], []
        for m in mats:
            A = m[:3, :3]
            U, S, Vt = np.linalg.svd(A)
            R = U @ Vt
            if np.linalg.det(R) < 0:  # keep a proper rotation
                U = U.copy()
                U[:, -1] *= -1
                S = S.copy()
                S[-1] *= -1
                R = U @ Vt
            scale = Vt.T @ np.diag(S) @ Vt
            tr.append(m[:3, 3])
            qu.append(quat_from_matrix(R))
            sc.append(scale)
        # consistent quaternion hemisphere for shortest-path slerp
        for i in range(1, len(qu)):
            if np.dot(qu[i - 1], qu[i]) < 0:
                qu[i] = -qu[i]
        return AnimatedTransform(
            times=jnp.asarray(times, jnp.float32),
            trans=jnp.asarray(np.stack(tr), jnp.float32),
            quats=jnp.asarray(np.stack(qu), jnp.float32),
            scales=jnp.asarray(np.stack(sc), jnp.float32))

    def interp(self, t):
        """Per-lane interpolated (trans (...,3), quat (...,4),
        scale (...,3,3)) at times t (...,)."""
        K = self.times.shape[0]
        t = jnp.asarray(t, jnp.float32)
        if K == 1:
            sh = t.shape
            return (jnp.broadcast_to(self.trans[0], sh + (3,)),
                    jnp.broadcast_to(self.quats[0], sh + (4,)),
                    jnp.broadcast_to(self.scales[0], sh + (3, 3)))
        # interval search over the small key table (unrolled selects)
        i1 = jnp.full(t.shape, 1, jnp.int32)
        for k in range(2, K):
            i1 = jnp.where(t >= self.times[k - 1], k, i1)
        i0 = i1 - 1
        t0 = self.times[i0]
        t1 = self.times[i1]
        f = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
        tr = (self.trans[i0] * (1 - f)[..., None] +
              self.trans[i1] * f[..., None])
        sc = (self.scales[i0] * (1 - f)[..., None, None] +
              self.scales[i1] * f[..., None, None])
        # per-lane slerp between gathered keys
        q0 = self.quats[i0]
        q1 = self.quats[i1]
        d = jnp.sum(q0 * q1, -1, keepdims=True)
        q1 = jnp.where(d < 0, -q1, q1)
        dd = jnp.clip(jnp.abs(d[..., 0]), 0.0, 1.0)
        theta = jnp.arccos(dd)
        sin_t = jnp.sin(theta)
        small = sin_t < 1e-5
        w0 = jnp.where(small, 1 - f, jnp.sin((1 - f) * theta) /
                       jnp.maximum(sin_t, 1e-9))
        w1 = jnp.where(small, f, jnp.sin(f * theta) /
                       jnp.maximum(sin_t, 1e-9))
        q = w0[..., None] * q0 + w1[..., None] * q1
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return tr, q, sc

    def apply_vector(self, t, v: Vec3) -> Vec3:
        tr, q, sc = self.interp(t)
        sv = Vec3(sc[..., 0, 0] * v.x + sc[..., 0, 1] * v.y + sc[..., 0, 2] * v.z,
                  sc[..., 1, 0] * v.x + sc[..., 1, 1] * v.y + sc[..., 1, 2] * v.z,
                  sc[..., 2, 0] * v.x + sc[..., 2, 1] * v.y + sc[..., 2, 2] * v.z)
        return quat_rotate(q, sv)

    def apply_point(self, t, p: Vec3) -> Vec3:
        tr, _, _ = self.interp(t)
        r = self.apply_vector(t, p)
        return Vec3(r.x + tr[..., 0], r.y + tr[..., 1], r.z + tr[..., 2])

    def translation(self, t) -> Vec3:
        tr, _, _ = self.interp(t)
        return Vec3(tr[..., 0], tr[..., 1], tr[..., 2])


@struct.dataclass
class RayDifferential(Ray):
    """Ray with the two offset rays of its pixel footprint
    (include/mitsuba/core/ray.h::RayDifferential): o_x/d_x is the ray
    through the +1-pixel-in-x film sample, o_y/d_y through +1 in y. Used
    to derive `si.duv_dx/duv_dy` for texture-LOD filtering
    (sensors/perspective.cpp::sample_ray_differential)."""
    o_x: Vec3 = None
    o_y: Vec3 = None
    d_x: Vec3 = None
    d_y: Vec3 = None

    @property
    def has_differentials(self) -> bool:
        return self.o_x is not None

    def scale_differential(self, amount):
        """ray.h::scale_differential — shrink the footprint toward the main
        ray (amount = 1/sqrt(spp): each sample covers 1/spp of a pixel)."""
        if not self.has_differentials:
            return self
        return self.replace(
            o_x=self.o + (self.o_x - self.o) * amount,
            o_y=self.o + (self.o_y - self.o) * amount,
            d_x=self.d + (self.d_x - self.d) * amount,
            d_y=self.d + (self.d_y - self.d) * amount)


def spawn_ray(p, d, n=None, maxt=None, wavelengths=None, time=None):
    """Offset ray origin along the geometric normal to avoid self-intersection
    (mirrors Interaction::spawn_ray, include/mitsuba/render/interaction.h)."""
    p, d = as_vec3(p), as_vec3(d)
    if n is not None:
        n = as_vec3(n)
        eps = m.mulsign(jnp.float32(m.RAY_EPSILON) * (1.0 + vmax_abs(p)),
                        vdot(n, d))
        o = p + n * eps
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
        if isinstance(p, Vec3):
            mm = self.matrix
            return Vec3(mm[0, 0] * p.x + mm[0, 1] * p.y + mm[0, 2] * p.z + mm[0, 3],
                        mm[1, 0] * p.x + mm[1, 1] * p.y + mm[1, 2] * p.z + mm[1, 3],
                        mm[2, 0] * p.x + mm[2, 1] * p.y + mm[2, 2] * p.z + mm[2, 3])
        r = p @ self.matrix[:3, :3].T + self.matrix[:3, 3]
        w = p @ self.matrix[3, :3].T + self.matrix[3, 3]
        return r / w[..., None]

    def apply_vector(self, v):
        if isinstance(v, Vec3):
            mm = self.matrix
            return Vec3(mm[0, 0] * v.x + mm[0, 1] * v.y + mm[0, 2] * v.z,
                        mm[1, 0] * v.x + mm[1, 1] * v.y + mm[1, 2] * v.z,
                        mm[2, 0] * v.x + mm[2, 1] * v.y + mm[2, 2] * v.z)
        return v @ self.matrix[:3, :3].T

    def apply_normal(self, n):
        if isinstance(n, Vec3):
            it = self.inverse_transpose
            return Vec3(it[0, 0] * n.x + it[0, 1] * n.y + it[0, 2] * n.z,
                        it[1, 0] * n.x + it[1, 1] * n.y + it[1, 2] * n.z,
                        it[2, 0] * n.x + it[2, 1] * n.y + it[2, 2] * n.z)
        return n @ self.inverse_transpose[:3, :3].T


def sph_dir(theta, phi) -> Vec3:
    """Spherical to cartesian unit Vec3 (z-up)."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return Vec3(st * cp, st * sp, ct)


def dir_sph(v: Vec3):
    """Cartesian to (theta, phi)."""
    v = as_vec3(v)
    theta = m.safe_acos(v.z)
    phi = jnp.arctan2(v.y, v.x)
    return theta, phi

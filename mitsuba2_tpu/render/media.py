"""Participating media + phase functions.

TPU-native rebuild of mitsuba2's Medium/PhaseFunction layer
(src/librender/medium.cpp, include/mitsuba/render/{medium,phase}.h;
plugins src/media/{homogeneous,heterogeneous}.cpp, src/phase/{isotropic,
hg}.cpp). Media live in the scene pytree as a packed table; shapes carry an
interior-medium index; the volumetric integrator (volpath.py) tracks the
per-lane current medium as an int32.

Medium row layout (MED_W = 8):
    [0:3] sigma_t RGB (extinction)  [3:6] albedo RGB (sigma_s / sigma_t)
    [6]   phase g (Henyey-Greenstein; 0 = isotropic)
    [7]   scale applied to grid densities (heterogeneous)

Heterogeneous media share ONE density grid slot per scene (like the envmap),
stored as a `GridVolume`; sigma_t(x) = grid(x) * row_sigma_t * scale.
Free flight through heterogeneous media uses delta tracking with a bounded
step count (static shapes; SURVEY.md §7.3 item 3).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import warp

MED_W = 8
MEDIUM_HOMOGENEOUS = 0
MEDIUM_HETEROGENEOUS = 1


@struct.dataclass
class GridVolume:
    """3D voxel grid over a world-space bbox, trilinear interpolation
    (include/mitsuba/render/volume.h's grid3d)."""
    data: jnp.ndarray   # (D, H, W) density
    bbox_min: jnp.ndarray  # (3,)
    bbox_max: jnp.ndarray  # (3,)

    def eval(self, p):
        """Trilinear density lookup at world points p: (..., 3) -> (...)."""
        D, H, W = self.data.shape
        res = jnp.asarray([W, H, D], jnp.float32)
        t = (p - self.bbox_min) / (self.bbox_max - self.bbox_min)
        inside = jnp.all((t >= 0) & (t <= 1), axis=-1)
        x = t * (res - 1)  # node-centered grid (grid3d convention)
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                      jnp.asarray([W - 2, H - 2, D - 2]))
        f = x - i0
        flat = self.data.reshape(-1)

        def g(dx, dy, dz):
            return flat[(i0[..., 2] + dz) * H * W + (i0[..., 1] + dy) * W +
                        (i0[..., 0] + dx)]

        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        v = ((g(0, 0, 0) * (1 - fx) + g(1, 0, 0) * fx) * (1 - fy) +
             (g(0, 1, 0) * (1 - fx) + g(1, 1, 0) * fx) * fy) * (1 - fz) + \
            ((g(0, 0, 1) * (1 - fx) + g(1, 0, 1) * fx) * (1 - fy) +
             (g(0, 1, 1) * (1 - fx) + g(1, 1, 1) * fx) * fy) * fz
        return jnp.where(inside, v, 0.0)


def pack_medium(desc: dict) -> Tuple[int, np.ndarray, Optional[dict]]:
    """Host: medium descriptor -> (type, row, grid descriptor or None).

    homogeneous: {"type": "homogeneous", "sigma_t": rgb, "albedo": rgb,
                  "g": float} or {"sigma_s": rgb, "sigma_a": rgb}
    heterogeneous: {"type": "heterogeneous", "density": (D,H,W) array,
                    "bbox_min", "bbox_max", "sigma_t", "albedo", "scale"}
    """
    row = np.zeros(MED_W, np.float32)
    t = desc.get("type", "homogeneous")

    def rgb(v, default):
        v = desc.get(v, default)
        if isinstance(v, (int, float)):
            v = [v] * 3
        return np.asarray(v, np.float32)

    if "sigma_s" in desc or "sigma_a" in desc:
        ss = rgb("sigma_s", 1.0)
        sa = rgb("sigma_a", 0.0)
        st = ss + sa
        alb = ss / np.maximum(st, 1e-20)
    else:
        st = rgb("sigma_t", 1.0)
        alb = rgb("albedo", 0.75)
    row[0:3] = st
    row[3:6] = alb
    row[6] = float(desc.get("g", 0.0))
    row[7] = float(desc.get("scale", 1.0))
    if t == "homogeneous":
        return MEDIUM_HOMOGENEOUS, row, None
    if t == "heterogeneous":
        return MEDIUM_HETEROGENEOUS, row, {
            "density": np.asarray(desc["density"], np.float32),
            "bbox_min": np.asarray(desc.get("bbox_min", [0, 0, 0]), np.float32),
            "bbox_max": np.asarray(desc.get("bbox_max", [1, 1, 1]), np.float32)}
    raise ValueError(f"unknown medium type {t!r}")


# ---------------------------------------------------------------------------
# Phase functions (src/phase/{isotropic,hg}.cpp). g = 0 -> isotropic; the
# HG formulas below degrade gracefully to 1/(4pi) at g = 0, so one code
# path serves both plugins.
# ---------------------------------------------------------------------------

def phase_hg_eval(g, cos_theta):
    """Henyey-Greenstein phase value (= its pdf; normalized over sphere)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return warp.INV_FOUR_PI * (1.0 - g * g) / \
        jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def phase_hg_sample(g, wi, u2):
    """Sample wo from HG around -wi (forward scattering for g>0).

    Conventions follow phase_hg.cpp: wi points TOWARD the viewer (like
    si.wi); sampled wo points away along the new propagation direction.
    Returns (wo_world, pdf)."""
    from ..core.geometry import Frame
    g = jnp.where(jnp.abs(g) < 1e-4, jnp.full_like(g, 1e-4), g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    cos_theta = -(1.0 + g * g - sqr * sqr) / (2.0 * g)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    frame = Frame.from_n(-wi)  # propagation direction
    wo_local = jnp.stack([sin_theta * jnp.cos(phi),
                          sin_theta * jnp.sin(phi), cos_theta], axis=-1)
    wo = frame.to_world(wo_local)
    pdf = phase_hg_eval(g, cos_theta)
    return wo, pdf


def phase_eval(g, wi, wo):
    """Phase value for scattering wi (toward viewer) -> wo.

    cos_theta is measured between the propagation direction (-wi) and wo."""
    cos_theta = jnp.sum(-wi * wo, axis=-1)
    return phase_hg_eval(g, cos_theta)

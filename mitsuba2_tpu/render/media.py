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
        """Trilinear density lookup at world points p (Vec3 or (..., 3))."""
        if not hasattr(p, "x"):
            from ..core.vec import Vec3
            p = Vec3.from_array(p)
        D, H, W = self.data.shape
        bmn, bmx = self.bbox_min, self.bbox_max
        tx = (p.x - bmn[0]) / (bmx[0] - bmn[0])
        ty = (p.y - bmn[1]) / (bmx[1] - bmn[1])
        tz = (p.z - bmn[2]) / (bmx[2] - bmn[2])
        inside = ((tx >= 0) & (tx <= 1) & (ty >= 0) & (ty <= 1) &
                  (tz >= 0) & (tz <= 1))
        xx = tx * (W - 1)
        xy = ty * (H - 1)
        xz = tz * (D - 1)
        ix = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 2)
        iy = jnp.clip(jnp.floor(xy).astype(jnp.int32), 0, H - 2)
        iz = jnp.clip(jnp.floor(xz).astype(jnp.int32), 0, D - 2)
        fx, fy, fz = xx - ix, xy - iy, xz - iz
        flat = self.data.reshape(-1)

        def g(dx, dy, dz):
            return flat[(iz + dz) * H * W + (iy + dy) * W + (ix + dx)]

        v = ((g(0, 0, 0) * (1 - fx) + g(1, 0, 0) * fx) * (1 - fy) +
             (g(0, 1, 0) * (1 - fx) + g(1, 1, 0) * fx) * fy) * (1 - fz) + \
            ((g(0, 0, 1) * (1 - fx) + g(1, 0, 1) * fx) * (1 - fy) +
             (g(0, 1, 1) * (1 - fx) + g(1, 1, 1) * fx) * fy) * fz
        return jnp.where(inside, v, 0.0)


def pack_medium(desc: dict) -> Tuple[int, np.ndarray, Optional[dict]]:
    """Host: medium descriptor -> (type, row, grid descriptor or None).

    homogeneous: {"type": "homogeneous", "sigma_t": rgb, "albedo": rgb,
                  "g": float} or {"sigma_s": rgb, "sigma_a": rgb}
    heterogeneous: {"type": "heterogeneous", "density": (D,H,W) array
                    or a Mitsuba .vol filename (also accepted under
                    "filename"), "bbox_min", "bbox_max" (default: the
                    .vol header bbox, else the unit cube), "sigma_t",
                    "albedo", "scale"}
    """
    row = np.zeros(MED_W, np.float32)
    t = desc.get("type", "homogeneous")

    def rgb(v, default):
        v = desc.get(v, default)
        if isinstance(v, dict):  # tabulated spectrum -> CIE-projected RGB
            from ..core import spectrum as sp
            from .spectra import tabulated_wls_vals
            v = np.clip(sp.spectrum_to_rgb_host(*tabulated_wls_vals(v)),
                        0.0, None)
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
        density = desc.get("density", desc.get("filename"))
        bmn = desc.get("bbox_min")
        bmx = desc.get("bbox_max")
        if isinstance(density, str):  # Mitsuba .vol file (gridvolume)
            from ..core.io_vol import read_vol
            density, fmn, fmx = read_vol(density)
            if density.ndim == 4:  # multi-channel grid: mean density
                density = density.mean(-1)
            bmn = fmn if bmn is None else bmn
            bmx = fmx if bmx is None else bmx
        if density is None:
            raise ValueError("heterogeneous medium needs a 'density' grid "
                             "or a .vol 'filename'")
        density = np.asarray(density, np.float32)
        if density.ndim == 0:  # constvolume density
            density = np.full((2, 2, 2), float(density), np.float32)
        return MEDIUM_HETEROGENEOUS, row, {
            "density": density,
            "bbox_min": np.asarray([0, 0, 0] if bmn is None else bmn, np.float32),
            "bbox_max": np.asarray([1, 1, 1] if bmx is None else bmx, np.float32)}
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
    wi: planar Vec3 (or (N,3) array); u2: (ua, ub) tuple or (N,2) array.
    Returns (wo_world Vec3, pdf)."""
    from ..core.geometry import Frame
    from ..core.vec import Vec3
    if not hasattr(wi, "x"):
        wi = Vec3.from_array(wi)
    ua, ub = (u2 if isinstance(u2, (tuple, list))
              else (u2[..., 0], u2[..., 1]))
    g = jnp.where(jnp.abs(g) < 1e-4, jnp.full_like(g, 1e-4), g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * ua)
    cos_theta = -(1.0 + g * g - sqr * sqr) / (2.0 * g)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * jnp.pi * ub
    frame = Frame.from_n(-wi)  # propagation direction
    wo = frame.to_world(Vec3(sin_theta * jnp.cos(phi),
                             sin_theta * jnp.sin(phi), cos_theta))
    pdf = phase_hg_eval(g, cos_theta)
    return wo, pdf


def phase_eval(g, wi, wo):
    """Phase value for scattering wi (toward viewer) -> wo.

    cos_theta is measured between the propagation direction (-wi) and wo."""
    from ..core.vec import Vec3, vdot
    if not hasattr(wi, "x"):
        wi = Vec3.from_array(wi)
    if not hasattr(wo, "x"):
        wo = Vec3.from_array(wo)
    cos_theta = -vdot(wi, wo)
    return phase_hg_eval(g, cos_theta)

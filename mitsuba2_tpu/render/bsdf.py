"""BSDF layer: wavefront dispatch over material families.

TPU-native rebuild of mitsuba2's BSDF base + plugins
(include/mitsuba/render/bsdf.h, src/bsdfs/*). The reference virtual-
dispatches per-variant C++ classes; here a BSDF family is a set of pure
functions over a packed parameter row, and wavefront dispatch is
masked-evaluate-all over the (static) set of families present in the scene
— the XLA-friendly equivalent of sorting by material (SURVEY.md §7.1).

Material table layout (SceneData):
    mat_type:  (M,)  i32 family id
    mat_flags: (M,)  i32 BSDFFlags bitmask
    mat_data:  (M, MAT_W) f32 family-specific packed params; by convention
               [0:8] / [8:16] / [16:24] are spectrum slots (see spectra.py)
               and [24:32] scalar params.

Conventions follow the reference exactly: directions are in the LOCAL
shading frame; `wi` points away from the surface; `sample` returns
(BSDFSample, weight) with weight = f * cos / pdf.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as m
from ..core import warp
from ..core.geometry import Frame
from .spectra import SLOT_W, eval_spectrum_slot, pack_spectrum_slot

MAT_W = 32

# --- BSDFFlags (include/mitsuba/render/bsdf.h) ------------------------------
F_NULL = 1 << 0
F_DIFFUSE_R = 1 << 1
F_DIFFUSE_T = 1 << 2
F_GLOSSY_R = 1 << 3
F_GLOSSY_T = 1 << 4
F_DELTA_R = 1 << 5
F_DELTA_T = 1 << 6
F_SMOOTH = F_DIFFUSE_R | F_DIFFUSE_T | F_GLOSSY_R | F_GLOSSY_T
F_DELTA = F_DELTA_R | F_DELTA_T

# Family ids
DIFFUSE = 0


@struct.dataclass
class BSDFSample:
    """BSDFSample3f (bsdf.h): wo in local frame."""
    wo: jnp.ndarray             # (N, 3)
    pdf: jnp.ndarray            # (N,)
    eta: jnp.ndarray            # (N,) relative IOR change
    sampled_flags: jnp.ndarray  # (N,) i32


# ---------------------------------------------------------------------------
# diffuse (src/bsdfs/diffuse.cpp) — smooth Lambertian reflection
# ---------------------------------------------------------------------------

class Diffuse:
    id = DIFFUSE
    flags = F_DIFFUSE_R

    @staticmethod
    def pack(props: dict) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[0:SLOT_W] = pack_spectrum_slot(props.get("reflectance", [0.5, 0.5, 0.5]))
        return data

    @staticmethod
    def sample(data, si, u1, u2, config) -> Tuple[BSDFSample, jnp.ndarray]:
        cos_i = Frame.cos_theta(si.wi)
        wo = warp.square_to_cosine_hemisphere(u2)
        pdf = warp.square_to_cosine_hemisphere_pdf(wo)
        active = cos_i > 0
        value = eval_spectrum_slot(data[..., 0:SLOT_W], si.wavelengths, config.color_mode)
        weight = jnp.where(active[..., None], value, 0.0)
        bs = BSDFSample(
            wo=wo,
            pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            sampled_flags=jnp.where(active, F_DIFFUSE_R, 0).astype(jnp.int32))
        return bs, weight

    @staticmethod
    def eval(data, si, wo, config) -> jnp.ndarray:
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        active = (cos_i > 0) & (cos_o > 0)
        value = eval_spectrum_slot(data[..., 0:SLOT_W], si.wavelengths, config.color_mode)
        return jnp.where(active[..., None],
                         value * (warp.INV_PI * cos_o)[..., None], 0.0)

    @staticmethod
    def pdf(data, si, wo, config) -> jnp.ndarray:
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        return jnp.where((cos_i > 0) & (cos_o > 0), cos_o * warp.INV_PI, 0.0)


FAMILIES = {Diffuse.id: Diffuse}
_BY_NAME = {"diffuse": Diffuse}


def pack_bsdf(desc: dict) -> Tuple[int, int, np.ndarray]:
    """Host: bsdf descriptor dict -> (family id, flags, packed row)."""
    cls = _BY_NAME.get(desc.get("type"))
    if cls is None:
        raise ValueError(f"unknown bsdf type {desc.get('type')!r}")
    return cls.id, cls.flags, cls.pack(desc)


# ---------------------------------------------------------------------------
# Wavefront dispatch (evaluate-all over families present, select by type)
# ---------------------------------------------------------------------------

def _lane_materials(scene, si):
    mat_idx = jnp.maximum(scene.shape_mat[jnp.maximum(si.shape, 0)], 0)
    return scene.mat_type[mat_idx], scene.mat_data[mat_idx], scene.mat_flags[mat_idx]

def lane_flags(scene, si):
    """Per-lane BSDFFlags."""
    _, _, flags = _lane_materials(scene, si)
    return flags


def sample(scene, si, u1, u2, config) -> Tuple[BSDFSample, jnp.ndarray]:
    """BSDF::sample over the wavefront."""
    mtype, mdata, _ = _lane_materials(scene, si)
    N = mtype.shape[0]
    bs = BSDFSample(wo=jnp.zeros((N, 3), jnp.float32),
                    pdf=jnp.zeros(N, jnp.float32),
                    eta=jnp.ones(N, jnp.float32),
                    sampled_flags=jnp.zeros(N, jnp.int32))
    weight = jnp.zeros((N, config.n_channels), jnp.float32)
    for fid in scene.mat_families:
        fam_bs, fam_w = FAMILIES[fid].sample(mdata, si, u1, u2, config)
        sel = mtype == fid
        bs = BSDFSample(
            wo=jnp.where(sel[..., None], fam_bs.wo, bs.wo),
            pdf=jnp.where(sel, fam_bs.pdf, bs.pdf),
            eta=jnp.where(sel, fam_bs.eta, bs.eta),
            sampled_flags=jnp.where(sel, fam_bs.sampled_flags, bs.sampled_flags))
        weight = jnp.where(sel[..., None], fam_w, weight)
    return bs, weight


def eval_(scene, si, wo, config) -> jnp.ndarray:
    """BSDF::eval (f * cos) over the wavefront."""
    mtype, mdata, _ = _lane_materials(scene, si)
    out = jnp.zeros((mtype.shape[0], config.n_channels), jnp.float32)
    for fid in scene.mat_families:
        val = FAMILIES[fid].eval(mdata, si, wo, config)
        out = jnp.where((mtype == fid)[..., None], val, out)
    return out


def pdf(scene, si, wo, config) -> jnp.ndarray:
    """BSDF::pdf over the wavefront."""
    mtype, mdata, _ = _lane_materials(scene, si)
    out = jnp.zeros(mtype.shape[0], jnp.float32)
    for fid in scene.mat_families:
        val = FAMILIES[fid].pdf(mdata, si, wo, config)
        out = jnp.where(mtype == fid, val, out)
    return out

"""BSDF layer: wavefront dispatch over material families.

TPU-native rebuild of mitsuba2's BSDF base + plugins
(include/mitsuba/render/bsdf.h, src/bsdfs/*). The reference virtual-
dispatches per-variant C++ classes; here a BSDF family is a set of pure
functions over a packed parameter row, and wavefront dispatch is
masked-evaluate-all over the (static) set of families present in the scene
— the XLA-friendly equivalent of sorting by material (SURVEY.md §7.1).

Families (mirroring src/bsdfs/): diffuse, conductor, roughconductor,
dielectric, thindielectric, roughdielectric, plastic, roughplastic, null,
mask, blendbsdf. `twosided` is a per-material flag applied in the dispatch
layer (frame flip); mask/blend reference child material rows by index.

Material table layout (SceneData):
    mat_type:  (M,)  i32 family id
    mat_flags: (M,)  i32 BSDFFlags bitmask
    mat_data:  (M, MAT_W) f32; [0:8]/[8:16]/[16:24] are spectrum slots
               (see spectra.py), [24:32] scalar params per family.

Per-lane parameters are accessed through a lazy LaneRows column view
(spectra.py) — materializing `mat_data[idx]` as an (N, 32) array would
lane-pad 32 -> 128 on TPU (core/vec.py layout note). All color values are
planar Specs (core/spec.py).

Conventions follow the reference exactly: directions in the LOCAL shading
frame; `wi` points away from the surface; `sample(u1, u2)` returns
(BSDFSample, weight = f * cos / pdf); radiance transport mode (the
eta^2 radiance-compression factor is applied on refraction).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as m
from ..core import warp
from ..kernels import gather as gth
from ..core.geometry import Frame
from ..core.spec import Spec, swhere
from ..core.vec import Vec3, vdot, vnormalize, vwhere
from . import fresnel as fr
from . import ior as ior_mod
from . import microfacet as mf
from .spectra import (LaneRows, SLOT_W, eval_spectrum_slot, pack_color)

MAT_W = 40
# cols [0:24]: three 8-wide spectrum/texture slots (class-specific)
# cols [24:32]: class-specific scalars (alphas, IOR ratios, child ids…)
# cols [32:40]: ALPHA_SLOT — optional roughness texture for the rough_*
#   families (src/bsdfs/roughconductor.cpp et al. accept Texture alpha);
#   all-zero when the material's roughness is the scalar in its alpha col
ALPHA_SLOT = 32

# --- BSDFFlags (include/mitsuba/render/bsdf.h) ------------------------------
F_NULL = 1 << 0
F_DIFFUSE_R = 1 << 1
F_DIFFUSE_T = 1 << 2
F_GLOSSY_R = 1 << 3
F_GLOSSY_T = 1 << 4
F_DELTA_R = 1 << 5
F_DELTA_T = 1 << 6
F_TWOSIDED_FLAG = 1 << 16  # dispatch-layer frame flip (bsdfs/twosided.cpp)
F_SMOOTH = F_DIFFUSE_R | F_DIFFUSE_T | F_GLOSSY_R | F_GLOSSY_T
F_DELTA = F_DELTA_R | F_DELTA_T

# Family ids
DIFFUSE = 0
CONDUCTOR = 1
ROUGHCONDUCTOR = 2
DIELECTRIC = 3
THINDIELECTRIC = 4
ROUGHDIELECTRIC = 5
PLASTIC = 6
ROUGHPLASTIC = 7
NULL_BSDF = 8
MASK = 9
BLEND = 10
NORMALMAP = 11
BUMPMAP = 12
MEASURED = 13
POLARIZER = 14
RETARDER = 15
MEASURED_POLARIZED = 16

_DIST_NAME = {"ggx": mf.GGX, "beckmann": mf.BECKMANN}


@struct.dataclass
class BSDFSample:
    """BSDFSample3f (bsdf.h): wo in local frame (planar Vec3)."""
    wo: Vec3
    pdf: jnp.ndarray            # (N,)
    eta: jnp.ndarray            # (N,) relative IOR change
    sampled_flags: jnp.ndarray  # (N,) i32


def _zero_sample(N):
    return BSDFSample(wo=Vec3.zeros((N,)),
                      pdf=jnp.zeros(N, jnp.float32),
                      eta=jnp.ones(N, jnp.float32),
                      sampled_flags=jnp.zeros(N, jnp.int32))


def _lanes(si):
    """Lane count of a wavefront SurfaceInteraction."""
    return jnp.shape(si.wi.z)[0]


def _spec(data, i, si, config) -> Spec:
    duv = ((si.duv_dx, si.duv_dy) if si.duv_dx is not None else None)
    return eval_spectrum_slot(data.slot(i), si.wavelengths, config.color_mode,
                              tex=si.tex, uv=si.uv, duv=duv)


def _rgb_slot(rgb_or_desc, illuminant=False) -> np.ndarray:
    return pack_color(rgb_or_desc, illuminant=illuminant)


def _pack_alpha(data, props, key="alpha", default=0.1) -> float:
    """Host: scalar roughness straight to its column; a texture dict
    packs into ALPHA_SLOT (isotropic, shared by alpha_u/v) and the column
    gets the texture's mean as the fallback/heuristic value."""
    a = props.get(key, default)
    if isinstance(a, dict):
        slot = _rgb_slot(a)
        data[ALPHA_SLOT:ALPHA_SLOT + SLOT_W] = slot
        return float(np.mean(slot[0:3]))
    return float(a)


def _alpha_tex(data, si, au, av):
    """Device: when ALPHA_SLOT carries a texture (kind col != 0), the
    per-lane roughness is the texture's channel mean at si.uv (the
    reference's Texture::eval_1), replacing both alphas isotropically.
    Statically skipped (atlas.any_alpha_tex) when no material has one —
    sample/eval/pdf all run this, so the fetch must not tax scenes with
    plain scalar roughness."""
    if si.tex is None or not getattr(si.tex, "any_alpha_tex", True):
        return au, av
    kind = data.col(ALPHA_SLOT + 7).astype(jnp.int32)
    is_tex = kind >= 2  # SLOT_TEX_BASE
    from . import texture as texture_mod
    tid = jnp.maximum((kind - 2) // 2, 0)
    duv = ((si.duv_dx, si.duv_dy) if si.duv_dx is not None else None)
    rgb = texture_mod.eval_rgb(si.tex, tid, si.uv, duv=duv)
    a = jnp.maximum(sum(rgb.ch) / len(rgb.ch), 1e-4)
    return jnp.where(is_tex, a, au), jnp.where(is_tex, a, av)


# ===========================================================================
# diffuse (src/bsdfs/diffuse.cpp)
# ===========================================================================

class Diffuse:
    id = DIFFUSE
    flags = F_DIFFUSE_R

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[0:SLOT_W] = _rgb_slot(props.get("reflectance", [0.5, 0.5, 0.5]))
        return data

    @staticmethod
    def sample(data, si, u1, u2, config):
        cos_i = Frame.cos_theta(si.wi)
        wo = warp.square_to_cosine_hemisphere(u2)
        pdf = warp.square_to_cosine_hemisphere_pdf(wo)
        active = cos_i > 0
        value = _spec(data, 0, si, config)
        bs = BSDFSample(wo=wo, pdf=jnp.where(active, pdf, 0.0),
                        eta=jnp.ones_like(pdf),
                        sampled_flags=jnp.where(active, F_DIFFUSE_R, 0).astype(jnp.int32))
        return bs, value.masked(active)

    @staticmethod
    def eval(data, si, wo, config):
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        active = (cos_i > 0) & (cos_o > 0)
        value = _spec(data, 0, si, config)
        return (value * (warp.INV_PI * cos_o)).masked(active)

    @staticmethod
    def pdf(data, si, wo, config):
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        return jnp.where((cos_i > 0) & (cos_o > 0), cos_o * warp.INV_PI, 0.0)


# ===========================================================================
# conductor (src/bsdfs/conductor.cpp) — delta reflection, complex IOR
# ===========================================================================

class Conductor:
    id = CONDUCTOR
    flags = F_DELTA_R

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        if "eta" in props or "k" in props:
            eta = props.get("eta", 0.0)
            k = props.get("k", 1.0)
        else:
            eta, k = ior_mod.lookup_conductor(props.get("material"))
        data[0:SLOT_W] = _rgb_slot(eta)
        data[SLOT_W:2 * SLOT_W] = _rgb_slot(k)
        data[2 * SLOT_W:3 * SLOT_W] = _rgb_slot(
            props.get("specular_reflectance", [1, 1, 1]))
        return data

    @staticmethod
    def _fresnel(data, si, cos_i, config) -> Spec:
        eta = _spec(data, 0, si, config)
        k = _spec(data, 1, si, config)
        return fr.fresnel_conductor(cos_i, eta, k)

    @staticmethod
    def sample(data, si, u1, u2, config):
        cos_i = Frame.cos_theta(si.wi)
        active = cos_i > 0
        wo = fr.reflect(si.wi)
        F = Conductor._fresnel(data, si, cos_i, config)
        value = _spec(data, 2, si, config) * F
        bs = BSDFSample(wo=wo, pdf=jnp.where(active, 1.0, 0.0),
                        eta=jnp.ones_like(cos_i),
                        sampled_flags=jnp.where(active, F_DELTA_R, 0).astype(jnp.int32))
        return bs, value.masked(active)

    @staticmethod
    def eval(data, si, wo, config):
        return Spec.zeros((_lanes(si),), config.n_channels)

    @staticmethod
    def pdf(data, si, wo, config):
        return jnp.zeros(_lanes(si), jnp.float32)


# ===========================================================================
# roughconductor (src/bsdfs/roughconductor.cpp)
# ===========================================================================

class RoughConductor:
    id = ROUGHCONDUCTOR
    flags = F_GLOSSY_R

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = Conductor.pack(props, build_child)
        a = _pack_alpha(data, props)
        data[24] = _pack_alpha(data, props, "alpha_u", a)
        data[25] = _pack_alpha(data, props, "alpha_v", a)
        data[26] = _DIST_NAME[props.get("distribution", "ggx")]
        return data

    @staticmethod
    def _params(data, si):
        return (*_alpha_tex(data, si,
                            jnp.maximum(data.col(24), 1e-4),
                            jnp.maximum(data.col(25), 1e-4)),
                data.col(26).astype(jnp.int32))

    @staticmethod
    def sample(data, si, u1, u2, config):
        au, av, dist = RoughConductor._params(data, si)
        cos_i = Frame.cos_theta(si.wi)
        m_dir, pdf_m = mf.sample(dist, si.wi, au, av, u2)
        wo = fr.reflect_m(si.wi, m_dir)
        cos_o = Frame.cos_theta(wo)
        dot_wim = vdot(si.wi, m_dir)
        pdf = pdf_m / jnp.maximum(4.0 * jnp.abs(dot_wim), 1e-20)
        active = (cos_i > 0) & (cos_o > 0) & (pdf_m > 0)
        # weight = f cos_o / pdf, via explicit eval for generality
        f_cos = RoughConductor.eval(data, si, wo, config)
        weight = f_cos / jnp.maximum(pdf, 1e-20)
        bs = BSDFSample(wo=wo, pdf=jnp.where(active, pdf, 0.0),
                        eta=jnp.ones_like(pdf),
                        sampled_flags=jnp.where(active, F_GLOSSY_R, 0).astype(jnp.int32))
        return bs, weight.masked(active)

    @staticmethod
    def eval(data, si, wo, config):
        au, av, dist = RoughConductor._params(data, si)
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        h = vnormalize(si.wi + wo)
        D = mf.eval_d(dist, h, au, av)
        G = mf.g_smith(dist, si.wi, wo, h, au, av)
        F = Conductor._fresnel(data, si, vdot(si.wi, h), config)
        spec = _spec(data, 2, si, config)
        f_cos = spec * F * (D * G / jnp.maximum(4.0 * cos_i, 1e-20))
        active = (cos_i > 0) & (cos_o > 0)
        return f_cos.masked(active)

    @staticmethod
    def pdf(data, si, wo, config):
        au, av, dist = RoughConductor._params(data, si)
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        h = vnormalize(si.wi + wo)
        pdf_m = mf.pdf(dist, si.wi, h, au, av)
        pdf = pdf_m / jnp.maximum(4.0 * jnp.abs(vdot(si.wi, h)), 1e-20)
        return jnp.where((cos_i > 0) & (cos_o > 0), pdf, 0.0)


# ===========================================================================
# dielectric (src/bsdfs/dielectric.cpp) — smooth delta reflect/refract
# ===========================================================================

class Dielectric:
    id = DIELECTRIC
    flags = F_DELTA_R | F_DELTA_T

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[0:SLOT_W] = _rgb_slot(props.get("specular_reflectance", [1, 1, 1]))
        data[SLOT_W:2 * SLOT_W] = _rgb_slot(props.get("specular_transmittance", [1, 1, 1]))
        int_ior = ior_mod.lookup_dielectric(props.get("int_ior"), 1.5046)
        ext_ior = ior_mod.lookup_dielectric(props.get("ext_ior"), 1.000277)
        data[24] = int_ior / ext_ior
        return data

    @staticmethod
    def sample(data, si, u1, u2, config):
        eta = data.col(24)
        cos_i = Frame.cos_theta(si.wi)
        F, cos_t, eta_it, eta_ti = fr.fresnel(cos_i, eta)
        pick_reflect = u1 < F
        wo_r = fr.reflect(si.wi)
        wo_t = fr.refract(si.wi, cos_t, eta_ti)
        wo = vwhere(pick_reflect, wo_r, wo_t)
        spec_r = _spec(data, 0, si, config)
        # radiance transport: eta^-2 compression on refraction (dielectric.cpp)
        spec_t = _spec(data, 1, si, config) * (eta_ti * eta_ti)
        value = swhere(pick_reflect, spec_r, spec_t)
        pdf = jnp.where(pick_reflect, F, 1.0 - F)
        active = cos_i != 0
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.where(pick_reflect, 1.0, eta_it),
            sampled_flags=jnp.where(
                active, jnp.where(pick_reflect, F_DELTA_R, F_DELTA_T), 0
            ).astype(jnp.int32))
        return bs, value.masked(active)

    @staticmethod
    def eval(data, si, wo, config):
        return Spec.zeros((_lanes(si),), config.n_channels)

    @staticmethod
    def pdf(data, si, wo, config):
        return jnp.zeros(_lanes(si), jnp.float32)


# ===========================================================================
# thindielectric (src/bsdfs/thindielectric.cpp)
# ===========================================================================

class ThinDielectric:
    id = THINDIELECTRIC
    flags = F_DELTA_R | F_DELTA_T

    pack = Dielectric.pack

    @staticmethod
    def sample(data, si, u1, u2, config):
        eta = data.col(24)
        cos_i = Frame.cos_theta(si.wi)
        F, _, _, _ = fr.fresnel(jnp.abs(cos_i), eta)
        # account for internal bounces: R' = 2R / (1 + R)
        R = jnp.where(F < 1.0, F + (1.0 - F) * (1.0 - F) * F / (1.0 - F * F), 1.0)
        pick_reflect = u1 < R
        wo = vwhere(pick_reflect, fr.reflect(si.wi), -si.wi)
        spec_r = _spec(data, 0, si, config)
        spec_t = _spec(data, 1, si, config)
        value = swhere(pick_reflect, spec_r, spec_t)
        pdf = jnp.where(pick_reflect, R, 1.0 - R)
        active = cos_i != 0
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            sampled_flags=jnp.where(
                active, jnp.where(pick_reflect, F_DELTA_R, F_DELTA_T), 0
            ).astype(jnp.int32))
        return bs, value.masked(active)

    eval = Dielectric.eval
    pdf = Dielectric.pdf


# ===========================================================================
# roughdielectric (src/bsdfs/roughdielectric.cpp; Walter et al. 2007)
# ===========================================================================

class RoughDielectric:
    id = ROUGHDIELECTRIC
    flags = F_GLOSSY_R | F_GLOSSY_T

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = Dielectric.pack(props, build_child)
        a = _pack_alpha(data, props)
        data[25] = _pack_alpha(data, props, "alpha_u", a)
        data[26] = _pack_alpha(data, props, "alpha_v", a)
        data[27] = _DIST_NAME[props.get("distribution", "ggx")]
        return data

    @staticmethod
    def _params(data, si):
        return (data.col(24),
                *_alpha_tex(data, si,
                            jnp.maximum(data.col(25), 1e-4),
                            jnp.maximum(data.col(26), 1e-4)),
                data.col(27).astype(jnp.int32))

    @staticmethod
    def sample(data, si, u1, u2, config):
        eta, au, av, dist = RoughDielectric._params(data, si)
        cos_i = Frame.cos_theta(si.wi)
        # m stays in the upper hemisphere; the SIGNED dot(wi, m) tells
        # fresnel which side we approach from (roughdielectric.cpp)
        m_dir, pdf_m = mf.sample(dist, si.wi, au, av, u2)
        dot_wim = vdot(si.wi, m_dir)
        F, cos_t, eta_it, eta_ti = fr.fresnel(dot_wim, eta)
        pick_reflect = u1 < F

        wo_r = fr.reflect_m(si.wi, m_dir)
        wo_t = fr.refract_m(si.wi, m_dir, cos_t, eta_ti)
        wo = vwhere(pick_reflect, wo_r, wo_t)
        cos_o = Frame.cos_theta(wo)

        # validity: reflection stays in wi hemisphere, refraction crosses
        valid_r = pick_reflect & (cos_i * cos_o > 0)
        valid_t = ~pick_reflect & (cos_i * cos_o < 0)
        active = (valid_r | valid_t) & (pdf_m > 0)

        pdf = RoughDielectric.pdf(data, si, wo, config)
        f_cos = RoughDielectric.eval(data, si, wo, config)
        weight = f_cos / jnp.maximum(pdf, 1e-20)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.where(pick_reflect, 1.0, eta_it),
            sampled_flags=jnp.where(
                active, jnp.where(pick_reflect, F_GLOSSY_R, F_GLOSSY_T), 0
            ).astype(jnp.int32))
        return bs, weight.masked(active)

    @staticmethod
    def _half_vectors(si_wi, wo, eta):
        """Reflection + transmission half vectors, oriented toward +z side
        of the macrosurface crossed with wi."""
        cos_i = Frame.cos_theta(si_wi)
        # reflection half vector, oriented +z (the NDF side); fresnel gets
        # the SIGNED dot(wi, hr) so inside rays use the reciprocal IOR
        hr = si_wi + wo
        hr = vwhere(Frame.cos_theta(hr) < 0, -hr, hr)
        hr = vnormalize(hr)
        # transmission half vector: -(wi + eta_it wo), oriented +z
        eta_it = jnp.where(cos_i >= 0, eta, 1.0 / eta)
        ht = -(si_wi + wo * eta_it)
        ht = vwhere(Frame.cos_theta(ht) < 0, -ht, ht)
        ht = vnormalize(ht)
        return hr, ht, eta_it

    @staticmethod
    def eval(data, si, wo, config):
        eta, au, av, dist = RoughDielectric._params(data, si)
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        is_reflect = cos_i * cos_o > 0
        hr, ht, eta_it = RoughDielectric._half_vectors(si.wi, wo, eta)

        # reflection lobe (hr is +z-oriented; fresnel sees the signed dot)
        D_r = mf.eval_d(dist, hr, au, av)
        G_r = mf.g_smith(dist, si.wi, wo, hr, au, av)
        F_r, _, _, _ = fr.fresnel(vdot(si.wi, hr), eta)
        f_r = F_r * D_r * G_r / jnp.maximum(4.0 * jnp.abs(cos_i), 1e-20)

        # transmission lobe (Walter 2007 eq. 21, radiance transport)
        wi_ht = vdot(si.wi, ht)
        wo_ht = vdot(wo, ht)
        F_t, _, _, _ = fr.fresnel(wi_ht, eta)
        D_t = mf.eval_d(dist, ht, au, av)
        G_t = mf.g_smith(dist, si.wi, wo, ht, au, av)
        denom = wi_ht + eta_it * wo_ht
        # radiance-mode eta^-2 compression (roughdielectric.cpp applies
        # 1/eta_it^2 in radiance mode): net factor = eta_it^2 / eta_it^2 = 1
        # on the D G (1-F) product scaled by the Jacobian-made term; mitsuba:
        # value = (1-F) D G * factor with factor including eta^2, then
        # *= rcp(eta_it)^2 -> cancels. Keep the cancelled form:
        f_t = (1.0 - F_t) * D_t * G_t * (jnp.abs(wi_ht * wo_ht) /
                                         jnp.maximum(jnp.abs(cos_i) * denom * denom, 1e-20))
        # Walter 2007 sidedness (chi+ terms): a physical refraction crosses
        # the microfacet — wi and wo must lie on opposite sides of ht
        f_t = jnp.where(wi_ht * wo_ht < 0, f_t, 0.0)

        spec_r = _spec(data, 0, si, config)
        spec_t = _spec(data, 1, si, config)
        f_cos = swhere(is_reflect, spec_r * f_r, spec_t * f_t)
        return f_cos.masked((cos_i != 0) & (cos_o != 0))

    @staticmethod
    def pdf(data, si, wo, config):
        eta, au, av, dist = RoughDielectric._params(data, si)
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        is_reflect = cos_i * cos_o > 0
        hr, ht, eta_it = RoughDielectric._half_vectors(si.wi, wo, eta)

        F_r, _, _, _ = fr.fresnel(vdot(si.wi, hr), eta)
        pdf_m_r = mf.pdf(dist, si.wi, hr, au, av)
        jac_r = 1.0 / jnp.maximum(4.0 * jnp.abs(vdot(si.wi, hr)), 1e-20)
        pdf_r = F_r * pdf_m_r * jac_r

        wi_ht = vdot(si.wi, ht)
        wo_ht = vdot(wo, ht)
        F_t, _, _, _ = fr.fresnel(wi_ht, eta)
        pdf_m_t = mf.pdf(dist, si.wi, ht, au, av)
        denom = wi_ht + eta_it * wo_ht
        jac_t = (eta_it * eta_it * jnp.abs(wo_ht)) / jnp.maximum(denom * denom, 1e-20)
        pdf_t = (1.0 - F_t) * pdf_m_t * jac_t
        pdf_t = jnp.where(wi_ht * wo_ht < 0, pdf_t, 0.0)  # chi+ sidedness

        pdf = jnp.where(is_reflect, pdf_r, pdf_t)
        return jnp.where((cos_i != 0) & (cos_o != 0), pdf, 0.0)


# ===========================================================================
# plastic (src/bsdfs/plastic.cpp) — smooth specular coat over diffuse
# ===========================================================================

class Plastic:
    id = PLASTIC
    flags = F_DIFFUSE_R | F_DELTA_R

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[0:SLOT_W] = _rgb_slot(props.get("diffuse_reflectance", [0.5, 0.5, 0.5]))
        data[SLOT_W:2 * SLOT_W] = _rgb_slot(props.get("specular_reflectance", [1, 1, 1]))
        int_ior = ior_mod.lookup_dielectric(props.get("int_ior"), 1.49)
        ext_ior = ior_mod.lookup_dielectric(props.get("ext_ior"), 1.000277)
        eta = int_ior / ext_ior
        data[24] = eta
        data[25] = 1.0 if props.get("nonlinear", False) else 0.0
        # host-side fresnel_diffuse_reflectance(1/eta)
        e = 1.0 / eta
        if e >= 1.0:
            fdr = -1.4399 / (e * e) + 0.7099 / e + 0.6681 + 0.0636 * e
        else:
            e2, e3 = e * e, e * e * e
            fdr = (0.919317 - 3.4793 * e + 6.75335 * e2 - 7.80989 * e3 +
                   4.98554 * e3 * e - 1.36881 * e3 * e2)
        data[26] = fdr
        d_mean = float(np.mean(data[0:3]))
        s_mean = float(np.mean(data[SLOT_W:SLOT_W + 3]))
        data[27] = s_mean / max(d_mean + s_mean, 1e-8)  # specular sampling wt
        data[28] = 1.0 / (eta * eta)
        return data

    @staticmethod
    def _probs(data, cos_i):
        eta = data.col(24)
        ssw = data.col(27)
        F_i, _, _, _ = fr.fresnel(cos_i, eta)
        prob_spec = (F_i * ssw) / jnp.maximum(F_i * ssw + (1.0 - F_i) * (1.0 - ssw), 1e-20)
        return F_i, prob_spec

    @staticmethod
    def sample(data, si, u1, u2, config):
        cos_i = Frame.cos_theta(si.wi)
        active = cos_i > 0
        F_i, prob_spec = Plastic._probs(data, cos_i)
        pick_spec = u1 < prob_spec

        wo_s = fr.reflect(si.wi)
        wo_d = warp.square_to_cosine_hemisphere(u2)
        wo = vwhere(pick_spec, wo_s, wo_d)

        spec_refl = _spec(data, 1, si, config)
        w_spec = spec_refl * (F_i / jnp.maximum(prob_spec, 1e-20))

        pdf_d = (1.0 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo_d)
        f_d = Plastic.eval(data, si, wo_d, config)
        w_diff = f_d / jnp.maximum(pdf_d, 1e-20)

        value = swhere(pick_spec, w_spec, w_diff)
        pdf = jnp.where(pick_spec, prob_spec, pdf_d)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            sampled_flags=jnp.where(
                active, jnp.where(pick_spec, F_DELTA_R, F_DIFFUSE_R), 0
            ).astype(jnp.int32))
        return bs, value.masked(active)

    @staticmethod
    def eval(data, si, wo, config):
        eta = data.col(24)
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        active = (cos_i > 0) & (cos_o > 0)
        F_i, _, _, _ = fr.fresnel(cos_i, eta)
        F_o, _, _, _ = fr.fresnel(cos_o, eta)
        diff = _spec(data, 0, si, config)
        fdr = data.col(26)
        nonlinear = data.col(25)
        denom = 1.0 - swhere(nonlinear > 0, diff, Spec.ones((), diff.n)) * fdr
        denom = denom.map(lambda c: jnp.maximum(c, 1e-8))
        value = (diff / denom *
                 (warp.INV_PI * cos_o * data.col(28) *
                  (1.0 - F_i) * (1.0 - F_o)))
        return value.masked(active)

    @staticmethod
    def pdf(data, si, wo, config):
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        _, prob_spec = Plastic._probs(data, cos_i)
        pdf = (1.0 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo)
        return jnp.where((cos_i > 0) & (cos_o > 0), pdf, 0.0)


# ===========================================================================
# roughplastic (src/bsdfs/roughplastic.cpp) — microfacet coat over diffuse
# ===========================================================================

class RoughPlastic:
    id = ROUGHPLASTIC
    flags = F_DIFFUSE_R | F_GLOSSY_R

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = Plastic.pack(props, build_child)
        data[29] = _pack_alpha(data, props)
        data[30] = _DIST_NAME[props.get("distribution", "ggx")]
        return data

    @staticmethod
    def _params(data, si):
        au, _ = _alpha_tex(data, si, jnp.maximum(data.col(29), 1e-4), 0.0)
        return au, data.col(30).astype(jnp.int32)

    @staticmethod
    def sample(data, si, u1, u2, config):
        cos_i = Frame.cos_theta(si.wi)
        active = cos_i > 0
        _, prob_spec = Plastic._probs(data, cos_i)
        pick_spec = u1 < prob_spec
        au, dist = RoughPlastic._params(data, si)

        m_dir, _ = mf.sample(dist, si.wi, au, au, u2)
        wo_s = fr.reflect_m(si.wi, m_dir)
        wo_d = warp.square_to_cosine_hemisphere(u2)
        wo = vwhere(pick_spec, wo_s, wo_d)

        pdf = RoughPlastic.pdf(data, si, wo, config)
        f_cos = RoughPlastic.eval(data, si, wo, config)
        value = f_cos / jnp.maximum(pdf, 1e-20)
        active = active & (pdf > 0) & (Frame.cos_theta(wo) > 0)
        bs = BSDFSample(
            wo=wo, pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            sampled_flags=jnp.where(
                active, jnp.where(pick_spec, F_GLOSSY_R, F_DIFFUSE_R), 0
            ).astype(jnp.int32))
        return bs, value.masked(active)

    @staticmethod
    def eval(data, si, wo, config):
        eta = data.col(24)
        au, dist = RoughPlastic._params(data, si)
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        active = (cos_i > 0) & (cos_o > 0)
        h = vnormalize(si.wi + wo)
        D = mf.eval_d(dist, h, au, au)
        G = mf.g_smith(dist, si.wi, wo, h, au, au)
        F_h, _, _, _ = fr.fresnel(vdot(si.wi, h), eta)
        spec_refl = _spec(data, 1, si, config)
        f_spec = spec_refl * (F_h * D * G / jnp.maximum(4.0 * cos_i, 1e-20))
        # diffuse substrate with internal-scattering compensation
        F_i, _, _, _ = fr.fresnel(cos_i, eta)
        F_o, _, _, _ = fr.fresnel(cos_o, eta)
        diff = _spec(data, 0, si, config)
        fdr = data.col(26)
        nonlinear = data.col(25)
        denom = 1.0 - swhere(nonlinear > 0, diff, Spec.ones((), diff.n)) * fdr
        denom = denom.map(lambda c: jnp.maximum(c, 1e-8))
        f_diff = (diff / denom *
                  (warp.INV_PI * cos_o * data.col(28) *
                   (1.0 - F_i) * (1.0 - F_o)))
        return (f_spec + f_diff).masked(active)

    @staticmethod
    def pdf(data, si, wo, config):
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        _, prob_spec = Plastic._probs(data, cos_i)
        au, dist = RoughPlastic._params(data, si)
        h = vnormalize(si.wi + wo)
        pdf_m = mf.pdf(dist, si.wi, h, au, au)
        pdf_spec = pdf_m / jnp.maximum(4.0 * jnp.abs(vdot(si.wi, h)), 1e-20)
        pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo)
        pdf = prob_spec * pdf_spec + (1.0 - prob_spec) * pdf_diff
        return jnp.where((cos_i > 0) & (cos_o > 0), pdf, 0.0)


# ===========================================================================
# null (src/bsdfs/null.cpp) — pass-through (for media boundaries)
# ===========================================================================

class Null:
    id = NULL_BSDF
    flags = F_NULL

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        return np.zeros(MAT_W, np.float32)

    @staticmethod
    def sample(data, si, u1, u2, config):
        N = _lanes(si)
        bs = BSDFSample(wo=-si.wi, pdf=jnp.ones(N, jnp.float32),
                        eta=jnp.ones(N, jnp.float32),
                        sampled_flags=jnp.full(N, F_NULL, jnp.int32))
        return bs, Spec.ones((N,), config.n_channels)

    @staticmethod
    def eval(data, si, wo, config):
        return Spec.zeros((_lanes(si),), config.n_channels)

    @staticmethod
    def pdf(data, si, wo, config):
        return jnp.zeros(_lanes(si), jnp.float32)


# ===========================================================================
# mask (src/bsdfs/mask.cpp) — opacity blend of child with null transmission
# ===========================================================================

class Mask:
    id = MASK
    flags = F_NULL  # | child flags at pack time

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[2 * SLOT_W:3 * SLOT_W] = _rgb_slot(props.get("opacity", [0.5, 0.5, 0.5]))
        child = props.get("bsdf", {"type": "diffuse"})
        data[30] = build_child(child)
        return data

    @staticmethod
    def sample(scene, data, si, u1, u2, config):
        opacity = _spec(data, 2, si, config)
        q = jnp.clip(opacity.hmean(), 1e-6, 1.0 - 1e-6)
        pick_child = u1 < q
        u1r = jnp.where(pick_child, u1 / q, (u1 - q) / (1.0 - q))
        child_idx = data.col(30).astype(jnp.int32)
        ct = gth.scalar(scene.mat_type, child_idx)
        cd = LaneRows(scene.mat_data, child_idx)
        bs_c, w_c = _sample_leaf(scene, ct, cd, si, u1r, u2, config)
        w_c = w_c * opacity / q
        bs = BSDFSample(
            wo=vwhere(pick_child, bs_c.wo, -si.wi),
            pdf=jnp.where(pick_child, bs_c.pdf * q, 1.0 - q),
            eta=jnp.where(pick_child, bs_c.eta, 1.0),
            sampled_flags=jnp.where(pick_child, bs_c.sampled_flags,
                                    F_NULL).astype(jnp.int32))
        w_null = (1.0 - opacity) / (1.0 - q)
        return bs, swhere(pick_child, w_c, w_null)

    @staticmethod
    def eval(scene, data, si, wo, config):
        opacity = _spec(data, 2, si, config)
        child_idx = data.col(30).astype(jnp.int32)
        ct = gth.scalar(scene.mat_type, child_idx)
        cd = LaneRows(scene.mat_data, child_idx)
        return opacity * _eval_leaf(scene, ct, cd, si, wo, config)

    @staticmethod
    def pdf(scene, data, si, wo, config):
        opacity = _spec(data, 2, si, config)
        q = jnp.clip(opacity.hmean(), 1e-6, 1.0 - 1e-6)
        child_idx = data.col(30).astype(jnp.int32)
        ct = gth.scalar(scene.mat_type, child_idx)
        cd = LaneRows(scene.mat_data, child_idx)
        return q * _pdf_leaf(scene, ct, cd, si, wo, config)


# ===========================================================================
# blendbsdf (src/bsdfs/blendbsdf.cpp)
# ===========================================================================

class Blend:
    id = BLEND
    flags = 0  # ORed with children at pack time

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[29] = float(props.get("weight", 0.5))
        children = props.get("bsdfs")
        if children is None:
            children = [props.get("bsdf_0", {"type": "diffuse"}),
                        props.get("bsdf_1", {"type": "diffuse"})]
        data[30] = build_child(children[0])
        data[31] = build_child(children[1])
        return data

    @staticmethod
    def sample(scene, data, si, u1, u2, config):
        w = data.col(29)
        pick_b = u1 < w
        u1r = jnp.where(pick_b, u1 / jnp.maximum(w, 1e-8),
                        (u1 - w) / jnp.maximum(1.0 - w, 1e-8))
        ia = data.col(30).astype(jnp.int32)
        ib = data.col(31).astype(jnp.int32)
        bs_a, w_a = _sample_leaf(scene, gth.scalar(scene.mat_type, ia),
                                 LaneRows(scene.mat_data, ia), si, u1r, u2, config)
        bs_b, w_b = _sample_leaf(scene, gth.scalar(scene.mat_type, ib),
                                 LaneRows(scene.mat_data, ib), si, u1r, u2, config)
        bs = BSDFSample(
            wo=vwhere(pick_b, bs_b.wo, bs_a.wo),
            pdf=jnp.where(pick_b, w * bs_b.pdf, (1 - w) * bs_a.pdf),
            eta=jnp.where(pick_b, bs_b.eta, bs_a.eta),
            sampled_flags=jnp.where(pick_b, bs_b.sampled_flags,
                                    bs_a.sampled_flags).astype(jnp.int32))
        value = swhere(pick_b, w_b, w_a)
        return bs, value

    @staticmethod
    def eval(scene, data, si, wo, config):
        w = data.col(29)
        ia = data.col(30).astype(jnp.int32)
        ib = data.col(31).astype(jnp.int32)
        ea = _eval_leaf(scene, gth.scalar(scene.mat_type, ia),
                        LaneRows(scene.mat_data, ia), si, wo, config)
        eb = _eval_leaf(scene, gth.scalar(scene.mat_type, ib),
                        LaneRows(scene.mat_data, ib), si, wo, config)
        return ea * (1.0 - w) + eb * w

    @staticmethod
    def pdf(scene, data, si, wo, config):
        w = data.col(29)
        ia = data.col(30).astype(jnp.int32)
        ib = data.col(31).astype(jnp.int32)
        pa = _pdf_leaf(scene, gth.scalar(scene.mat_type, ia),
                       LaneRows(scene.mat_data, ia), si, wo, config)
        pb = _pdf_leaf(scene, gth.scalar(scene.mat_type, ib),
                       LaneRows(scene.mat_data, ib), si, wo, config)
        return (1.0 - w) * pa + w * pb


# Differentiable-parameter layout per family (name -> location in the row),
# consumed by diff/params.py's traverse(). ("slot", k): RGB at cols
# [8k, 8k+3) of spectrum slot k; ("scalar", c): one float at col c.
Diffuse.param_spec = {"reflectance": ("slot", 0)}
Conductor.param_spec = {"eta": ("slot", 0), "k": ("slot", 1),
                        "specular_reflectance": ("slot", 2)}
RoughConductor.param_spec = {**Conductor.param_spec,
                             "alpha_u": ("scalar", 24),
                             "alpha_v": ("scalar", 25)}
Dielectric.param_spec = {"specular_reflectance": ("slot", 0),
                         "specular_transmittance": ("slot", 1),
                         "eta": ("scalar", 24)}
ThinDielectric.param_spec = dict(Dielectric.param_spec)
RoughDielectric.param_spec = {**Dielectric.param_spec,
                              "alpha_u": ("scalar", 25),
                              "alpha_v": ("scalar", 26)}
Plastic.param_spec = {"diffuse_reflectance": ("slot", 0),
                      "specular_reflectance": ("slot", 1)}
RoughPlastic.param_spec = {**Plastic.param_spec, "alpha": ("scalar", 29)}
Null.param_spec = {}
Mask.param_spec = {"opacity": ("slot", 2)}
Blend.param_spec = {"weight": ("scalar", 29)}

# ===========================================================================
# normalmap / bumpmap (src/bsdfs/{normalmap,bumpmap}.cpp) — wrappers that
# perturb the shading frame from a texture, then delegate to the child.
# The perturbed frame lives INSIDE the original local frame (frame-within-
# frame, exactly the reference's construction).
# ===========================================================================

def _perturbed_frame_normalmap(scene, data, si):
    """Tangent-space normal from the RGB texture in slot 2 -> local Frame."""
    rgb = eval_spectrum_slot(data.slot(2), si.wavelengths, "rgb",
                             tex=si.tex, uv=si.uv)
    n_local = vnormalize(Vec3(2.0 * rgb.ch[0] - 1.0,
                              2.0 * rgb.ch[1] - 1.0,
                              2.0 * rgb.ch[2] - 1.0))
    return Frame.from_n(n_local)


def _perturbed_frame_bumpmap(scene, data, si):
    """Height texture in slot 2 -> gradient-perturbed local normal
    (finite differences of the texture, bumpmap.cpp's approach)."""

    def h(uv):
        v = eval_spectrum_slot(data.slot(2), si.wavelengths, "rgb",
                               tex=si.tex, uv=uv)
        return v.hmean()

    eps = 5e-4
    scale = data.col(29)
    dh_du = (h(si.uv + (eps, 0.0)) - h(si.uv + (-eps, 0.0))) / (2 * eps)
    dh_dv = (h(si.uv + (0.0, eps)) - h(si.uv + (0.0, -eps))) / (2 * eps)
    n_local = vnormalize(Vec3(-scale * dh_du, -scale * dh_dv,
                              jnp.ones_like(dh_du)))
    return Frame.from_n(n_local)


class _FramePerturb:
    """Shared sample/eval/pdf plumbing for normalmap/bumpmap."""

    @classmethod
    def _child(cls, scene, data):
        idx = data.col(30).astype(jnp.int32)
        return gth.scalar(scene.mat_type, idx), LaneRows(scene.mat_data, idx)

    @classmethod
    def sample(cls, scene, data, si, u1, u2, config):
        fp = cls._frame(scene, data, si)
        wi_p = fp.to_local(si.wi)
        si_p = si.replace(wi=wi_p)
        ct, cd = cls._child(scene, data)
        bs, w = _sample_leaf(scene, ct, cd, si_p, u1, u2, config)
        wo = fp.to_world(bs.wo)
        # reject samples the perturbation pushed below the true surface
        ok = (Frame.cos_theta(wo) * Frame.cos_theta(bs.wo) > 0)
        bs = bs.replace(wo=wo, pdf=jnp.where(ok, bs.pdf, 0.0))
        return bs, w.masked(ok)

    @classmethod
    def eval(cls, scene, data, si, wo, config):
        fp = cls._frame(scene, data, si)
        si_p = si.replace(wi=fp.to_local(si.wi))
        ct, cd = cls._child(scene, data)
        return _eval_leaf(scene, ct, cd, si_p, fp.to_local(wo), config)

    @classmethod
    def pdf(cls, scene, data, si, wo, config):
        fp = cls._frame(scene, data, si)
        si_p = si.replace(wi=fp.to_local(si.wi))
        ct, cd = cls._child(scene, data)
        return _pdf_leaf(scene, ct, cd, si_p, fp.to_local(wo), config)


class NormalMap(_FramePerturb):
    id = NORMALMAP
    flags = 0  # inherits child lobes at pack time

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[2 * SLOT_W:3 * SLOT_W] = _rgb_slot(
            props.get("normalmap", [0.5, 0.5, 1.0]))
        data[30] = build_child(props.get("bsdf", {"type": "diffuse"}))
        return data

    _frame = classmethod(
        lambda cls, scene, data, si: _perturbed_frame_normalmap(scene, data, si))


class BumpMap(_FramePerturb):
    id = BUMPMAP
    flags = 0

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[2 * SLOT_W:3 * SLOT_W] = _rgb_slot(props.get("bumpmap", 0.0))
        data[29] = float(props.get("scale", 1.0))
        data[30] = build_child(props.get("bsdf", {"type": "diffuse"}))
        return data

    _frame = classmethod(
        lambda cls, scene, data, si: _perturbed_frame_bumpmap(scene, data, si))


# ===========================================================================
# measured (src/bsdfs/measured.cpp) — data-driven tabulated BRDF sampled by
# per-incident-angle Marginal2D CDF inversion (render/measured.py)
# ===========================================================================

class Measured:
    id = MEASURED
    flags = F_GLOSSY_R
    param_spec = {}

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        from . import measured as measured_mod
        data = np.zeros(MAT_W, np.float32)
        if "values" in props:
            table = np.asarray(props["values"], np.float32)
        elif "filename" in props:
            # RGL .bsdf capture (measured.cpp's input format): parse the
            # tensor_file container + reconstruct onto the native grid
            from . import rgl as rgl_mod
            table = rgl_mod.load_rgl(
                props["filename"], n_ti=int(props.get("n_ti", 32)),
                n_to=int(props.get("n_to", 64)),
                n_phi=int(props.get("n_phi", 64)))
        elif "bake" in props:
            table = measured_mod.bake_from_desc(
                props["bake"], n_ti=int(props.get("n_ti", 32)),
                n_to=int(props.get("n_to", 64)),
                n_phi=int(props.get("n_phi", 64)))
        else:
            raise ValueError(
                "measured bsdf needs 'filename' (.bsdf), 'values' or 'bake'")
        data[28] = measured_mod.stage_table(table)
        return data

    @staticmethod
    def sample(scene, data, si, u1, u2, config):
        from . import measured as measured_mod
        tid = data.col(28).astype(jnp.int32)
        wo, pdf = measured_mod.sample_measured(scene.measured, tid, si.wi, u2)
        val = measured_mod.eval_measured(scene.measured, tid, si.wi, wo)
        weight = val / jnp.maximum(pdf, 1e-20)
        C = config.n_channels
        if C != 3:
            weight = Spec.splat(weight.hmean(), C)
        bs = BSDFSample(wo=wo, pdf=pdf, eta=jnp.ones_like(pdf),
                        sampled_flags=jnp.where(pdf > 0, F_GLOSSY_R,
                                                0).astype(jnp.int32))
        return bs, weight.masked(pdf > 0)

    @staticmethod
    def eval(scene, data, si, wo, config):
        from . import measured as measured_mod
        tid = data.col(28).astype(jnp.int32)
        val = measured_mod.eval_measured(scene.measured, tid, si.wi, wo)
        C = config.n_channels
        if C != 3:
            val = Spec.splat(val.hmean(), C)
        return val

    @staticmethod
    def pdf(scene, data, si, wo, config):
        from . import measured as measured_mod
        tid = data.col(28).astype(jnp.int32)
        return measured_mod.pdf_measured(scene.measured, tid, si.wi, wo)


# ===========================================================================
# polarizer / retarder (src/bsdfs/{polarizer,retarder}.cpp) — ideal optical
# elements: delta straight-through transmission. Their POLARIZING action
# (Mueller transform) lives in the polarized integrator (render/stokes.py);
# in scalar transport a polarizer passes half the unpolarized energy times
# its transmittance, a retarder passes everything.
# Row layout: [24] element angle theta (rad), [25] transmittance | phase.
# ===========================================================================

class _OpticalElement:
    @staticmethod
    def eval(data, si, wo, config):
        return Spec.zeros((_lanes(si),), config.n_channels)

    @staticmethod
    def pdf(data, si, wo, config):
        return jnp.zeros(_lanes(si), jnp.float32)


class Polarizer(_OpticalElement):
    id = POLARIZER
    flags = F_DELTA_T
    param_spec = {"theta": ("scalar", 24), "transmittance": ("scalar", 25)}

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[24] = np.deg2rad(float(props.get("theta", 0.0)))
        data[25] = float(props.get("transmittance", 1.0))
        return data

    @staticmethod
    def sample(data, si, u1, u2, config):
        N = _lanes(si)
        t = data.col(25)
        bs = BSDFSample(wo=-si.wi, pdf=jnp.ones(N, jnp.float32),
                        eta=jnp.ones(N, jnp.float32),
                        sampled_flags=jnp.full(N, F_DELTA_T, jnp.int32))
        # unpolarized scalar transport: an ideal polarizer passes t/2
        return bs, Spec.splat(0.5 * t, config.n_channels)


class Retarder(_OpticalElement):
    id = RETARDER
    flags = F_DELTA_T
    param_spec = {"theta": ("scalar", 24), "delta": ("scalar", 25)}

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        data = np.zeros(MAT_W, np.float32)
        data[24] = np.deg2rad(float(props.get("theta", 0.0)))
        data[25] = np.deg2rad(float(props.get("delta", 90.0)))  # retardance
        return data

    @staticmethod
    def sample(data, si, u1, u2, config):
        N = _lanes(si)
        bs = BSDFSample(wo=-si.wi, pdf=jnp.ones(N, jnp.float32),
                        eta=jnp.ones(N, jnp.float32),
                        sampled_flags=jnp.full(N, F_DELTA_T, jnp.int32))
        return bs, Spec.ones((N,), config.n_channels)


NormalMap.param_spec = {"normalmap": ("slot", 2)}
class MeasuredPolarized(Measured):
    """measured_polarized (src/bsdfs/measured_polarized.cpp): a measured
    intensity table + a per-cell Mueller polarization structure consumed
    by the polarized transport integrator (render/stokes.py). The
    radiometric path (eval/sample/pdf) is the plain measured machinery;
    the Mueller table rides MeasuredData.mueller."""
    id = MEASURED_POLARIZED

    @staticmethod
    def pack(props, build_child) -> np.ndarray:
        from . import measured as measured_mod
        data = np.zeros(MAT_W, np.float32)
        n_ti = int(props.get("n_ti", 32))
        n_to = int(props.get("n_to", 64))
        n_phi = int(props.get("n_phi", 64))
        if "values" in props:
            table = np.asarray(props["values"], np.float32)
        elif "filename" in props:
            from . import rgl as rgl_mod
            table = rgl_mod.load_rgl(props["filename"], n_ti, n_to, n_phi)
        elif "bake" in props:
            table = measured_mod.bake_from_desc(props["bake"], n_ti, n_to,
                                                n_phi)
        else:
            raise ValueError("measured_polarized needs 'filename', "
                             "'values' or 'bake'")
        n_ti, n_to, n_phi = table.shape[:3]
        if "mueller" in props:
            mm = np.asarray(props["mueller"], np.float32)
        elif "pbake_eta" in props:
            eta = props["pbake_eta"]
            mm = measured_mod.bake_mueller_conductor(
                float(np.real(eta)), float(np.imag(eta)),
                n_ti, n_to, n_phi)
        else:
            raise ValueError("measured_polarized needs 'mueller' "
                             "(n_ti,n_to,n_phi,4,4) or 'pbake_eta'")
        data[28] = measured_mod.stage_table(table, mueller=mm)
        return data


BumpMap.param_spec = {"bumpmap": ("slot", 2), "scale": ("scalar", 29)}

LEAF_FAMILIES = {c.id: c for c in
                 (Diffuse, Conductor, RoughConductor, Dielectric,
                  ThinDielectric, RoughDielectric, Plastic, RoughPlastic,
                  Null, Polarizer, Retarder)}
WRAPPER_FAMILIES = {Mask.id: Mask, Blend.id: Blend,
                    NormalMap.id: NormalMap, BumpMap.id: BumpMap,
                    Measured.id: Measured,
                    MeasuredPolarized.id: MeasuredPolarized}
FAMILIES = {**LEAF_FAMILIES, **WRAPPER_FAMILIES}

_BY_NAME = {"diffuse": Diffuse, "conductor": Conductor,
            "roughconductor": RoughConductor, "dielectric": Dielectric,
            "thindielectric": ThinDielectric,
            "roughdielectric": RoughDielectric, "plastic": Plastic,
            "roughplastic": RoughPlastic, "null": Null, "mask": Mask,
            "blendbsdf": Blend, "blend": Blend,
            "normalmap": NormalMap, "bumpmap": BumpMap,
            "measured": Measured,
            "measured_polarized": MeasuredPolarized,
            "polarizer": Polarizer, "retarder": Retarder}


def register_bsdf(name: str, cls) -> None:
    """Register a user-defined BSDF plugin (the reference's Python-plugin
    path: pybind trampoline classes let users subclass BSDF in Python,
    src/python/render bindings — SURVEY.md §2.5). Here a plugin is a
    class of four pure static methods over the packed material row:

        class MyBSDF:
            id = None            # auto-assigned on registration
            flags = F_DIFFUSE_R  # lobe flags (BSDFFlags)
            @staticmethod
            def pack(props, build_child) -> np.ndarray   # (MAT_W,) f32
            @staticmethod
            def sample(data, si, u1, u2, config) -> (BSDFSample, Spec)
            @staticmethod
            def eval(data, si, wo, config) -> Spec
            @staticmethod
            def pdf(data, si, wo, config) -> jnp.ndarray

    After `register_bsdf("my_bsdf", MyBSDF)`, the name works everywhere
    a built-in does: XML `<bsdf type="my_bsdf">`, `load_dict`, presets.
    Dispatch is the same static masked evaluate-all used for built-ins
    (scenes that don't use the plugin pay nothing). Leaf plugins only —
    wrapper semantics (mask/blend-style child re-dispatch) are coupled
    to the transport loop's lobe bookkeeping."""
    global _USER_ID_NEXT
    if name in _BY_NAME:
        raise ValueError(f"bsdf name {name!r} already registered")
    for attr in ("flags", "pack", "sample", "eval", "pdf"):
        if not hasattr(cls, attr):
            raise TypeError(f"plugin {name!r} lacks required attribute "
                            f"{attr!r}")
    if getattr(cls, "id", None) is None:
        cls.id = _USER_ID_NEXT
        _USER_ID_NEXT += 1
    if cls.id in FAMILIES or any(c.id == cls.id for c in _BY_NAME.values()):
        raise ValueError(f"bsdf id {cls.id} already taken")
    _BY_NAME[name] = cls
    LEAF_FAMILIES[cls.id] = cls
    FAMILIES[cls.id] = cls


_USER_ID_NEXT = 1000  # user-plugin ids; built-ins stay below


def build_material(desc: dict, mats: List) -> int:
    """Host: append material rows for `desc` to `mats` (list of
    [type, flags, row]); returns the row index. Handles the `twosided`
    wrapper (flag on the child) and nested children (mask/blend)."""
    desc = dict(desc or {"type": "diffuse"})
    t = desc.get("type")
    extra_flags = 0
    while t == "twosided":
        desc = dict(desc.get("bsdf", {"type": "diffuse"}))
        extra_flags |= F_TWOSIDED_FLAG
        t = desc.get("type")
    cls = _BY_NAME.get(t)
    if cls is None:
        raise ValueError(f"unknown bsdf type {t!r}")

    idx = len(mats)
    mats.append([cls.id, cls.flags | extra_flags, None])  # reserve slot

    child_flags = []

    def build_child(child_desc) -> int:
        ci = build_material(child_desc, mats)
        child_flags.append(mats[ci][1])
        return ci

    row = cls.pack(desc, build_child)
    flags = cls.flags | extra_flags
    for cf in child_flags:  # wrappers inherit child lobes
        flags |= cf & ~F_TWOSIDED_FLAG
    mats[idx][1] = flags
    mats[idx][2] = row
    return idx


# ---------------------------------------------------------------------------
# Wavefront dispatch
# ---------------------------------------------------------------------------

def _leaf_ids(scene):
    return tuple(f for f in scene.mat_families if f in LEAF_FAMILIES)


def _wrapper_ids(scene):
    return tuple(f for f in scene.mat_families if f in WRAPPER_FAMILIES)


def _eval_leaf(scene, mtype, mdata, si, wo, config) -> Spec:
    out = Spec.zeros((mtype.shape[0],), config.n_channels)
    for fid in _leaf_ids(scene):
        val = LEAF_FAMILIES[fid].eval(mdata, si, wo, config)
        out = swhere(mtype == fid, val, out)
    return out


def _pdf_leaf(scene, mtype, mdata, si, wo, config):
    out = jnp.zeros(mtype.shape[0], jnp.float32)
    for fid in _leaf_ids(scene):
        val = LEAF_FAMILIES[fid].pdf(mdata, si, wo, config)
        out = jnp.where(mtype == fid, val, out)
    return out


def _sample_leaf(scene, mtype, mdata, si, u1, u2, config):
    N = mtype.shape[0]
    bs = _zero_sample(N)
    weight = Spec.zeros((N,), config.n_channels)
    for fid in _leaf_ids(scene):
        fam_bs, fam_w = LEAF_FAMILIES[fid].sample(mdata, si, u1, u2, config)
        sel = mtype == fid
        bs = BSDFSample(
            wo=vwhere(sel, fam_bs.wo, bs.wo),
            pdf=jnp.where(sel, fam_bs.pdf, bs.pdf),
            eta=jnp.where(sel, fam_bs.eta, bs.eta),
            sampled_flags=jnp.where(sel, fam_bs.sampled_flags, bs.sampled_flags))
        weight = swhere(sel, fam_w, weight)
    return bs, weight


def _lane_materials(scene, si):
    mat_idx = jnp.maximum(
        gth.scalar(scene.shape_mat, jnp.maximum(si.shape, 0)), 0)
    return (gth.scalar(scene.mat_type, mat_idx),
            LaneRows(scene.mat_data, mat_idx),
            gth.scalar(scene.mat_flags, mat_idx))


def lane_flags(scene, si):
    """Per-lane BSDFFlags."""
    _, _, flags = _lane_materials(scene, si)
    return flags


def _maybe_flip(scene, si, flags):
    """twosided: flip the local frame when hit from behind (twosided.cpp)."""
    two = (flags & F_TWOSIDED_FLAG) != 0
    flip = two & (Frame.cos_theta(si.wi) < 0)
    wi = vwhere(flip, Vec3(si.wi.x, si.wi.y, -si.wi.z), si.wi)
    return si.replace(wi=wi), flip


def _flip_wo(wo, flip):
    return vwhere(flip, Vec3(wo.x, wo.y, -wo.z), wo)


def null_transmission(scene, si, config) -> Spec:
    """Per-lane straight-through transmission of the hit surface's null
    lobe (BSDF::eval_null_transmission, used by the volumetric
    Scene::eval_transmittance analog): 1 for `null` boundaries,
    (1 - opacity) for `mask` surfaces. Callers gate on F_NULL; the
    value for non-null materials is irrelevant (returned as 1)."""
    mtype, mdata, _ = _lane_materials(scene, si)
    one = Spec.ones((jnp.shape(si.t)[0],), config.n_channels)
    opacity = _spec(mdata, 2, si, config)
    return swhere(mtype == MASK, one - opacity, one)


def sample(scene, si, u1, u2, config) -> Tuple[BSDFSample, Spec]:
    """BSDF::sample over the wavefront."""
    mtype, mdata, flags = _lane_materials(scene, si)
    si_f, flip = _maybe_flip(scene, si, flags)
    bs, weight = _sample_leaf(scene, mtype, mdata, si_f, u1, u2, config)
    for fid in _wrapper_ids(scene):
        fam_bs, fam_w = WRAPPER_FAMILIES[fid].sample(scene, mdata, si_f, u1, u2, config)
        sel = mtype == fid
        bs = BSDFSample(
            wo=vwhere(sel, fam_bs.wo, bs.wo),
            pdf=jnp.where(sel, fam_bs.pdf, bs.pdf),
            eta=jnp.where(sel, fam_bs.eta, bs.eta),
            sampled_flags=jnp.where(sel, fam_bs.sampled_flags, bs.sampled_flags))
        weight = swhere(sel, fam_w, weight)
    bs = bs.replace(wo=_flip_wo(bs.wo, flip))
    return bs, weight


def eval_(scene, si, wo, config) -> Spec:
    """BSDF::eval (f * cos) over the wavefront."""
    mtype, mdata, flags = _lane_materials(scene, si)
    si_f, flip = _maybe_flip(scene, si, flags)
    wo_f = _flip_wo(wo, flip)
    out = _eval_leaf(scene, mtype, mdata, si_f, wo_f, config)
    for fid in _wrapper_ids(scene):
        val = WRAPPER_FAMILIES[fid].eval(scene, mdata, si_f, wo_f, config)
        out = swhere(mtype == fid, val, out)
    return out


def pdf(scene, si, wo, config) -> jnp.ndarray:
    """BSDF::pdf over the wavefront."""
    mtype, mdata, flags = _lane_materials(scene, si)
    si_f, flip = _maybe_flip(scene, si, flags)
    wo_f = _flip_wo(wo, flip)
    out = _pdf_leaf(scene, mtype, mdata, si_f, wo_f, config)
    for fid in _wrapper_ids(scene):
        val = WRAPPER_FAMILIES[fid].pdf(scene, mdata, si_f, wo_f, config)
        out = jnp.where(mtype == fid, val, out)
    return out


# Backwards-compatible packing entry used by scene.build_scene
def pack_bsdf(desc: dict) -> Tuple[int, int, np.ndarray]:
    """Single-material pack (no children). Prefer build_material."""
    mats: List = []
    idx = build_material(desc, mats)
    assert len(mats) == 1, "pack_bsdf cannot handle nested bsdfs"
    return mats[idx][0], mats[idx][1], mats[idx][2]

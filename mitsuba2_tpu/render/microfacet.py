"""Microfacet distributions: GGX + Beckmann with anisotropy.

TPU-native rebuild of mitsuba2's MicrofacetDistribution
(include/mitsuba/render/microfacet.h): `eval` (the NDF D), `smith_g1`, `G`,
`sample` + `pdf`. GGX uses visible-normal sampling (Heitz 2018's projected
hemisphere construction, the same technique the reference uses); Beckmann
uses classic full-NDF sampling (sample_visible=False in reference terms) —
eval/pdf/sample stay mutually consistent either way, which is what the chi^2
suite checks. All directions are PLANAR Vec3 in the LOCAL shading frame
(core/vec.py layout note).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec3, vdot, vnormalize, vwhere

GGX = 0
BECKMANN = 1


def _v3(v) -> Vec3:
    return v if isinstance(v, Vec3) else Vec3.from_array(v)


def eval_d(dist, m_dir, alpha_u, alpha_v):
    """NDF D(m). dist is per-lane int32 (0=GGX, 1=Beckmann)."""
    m_dir = _v3(m_dir)
    cos2 = m_dir.z * m_dir.z
    xa = m_dir.x / alpha_u
    ya = m_dir.y / alpha_v
    inv_norm = 1.0 / (jnp.pi * alpha_u * alpha_v)
    denom_g = xa * xa + ya * ya + cos2
    d_ggx = inv_norm / jnp.maximum(denom_g * denom_g, 1e-20)
    t2 = (xa * xa + ya * ya) / jnp.maximum(cos2, 1e-20)
    d_bk = inv_norm * jnp.exp(-t2) / jnp.maximum(cos2 * cos2, 1e-20)
    d = jnp.where(dist == GGX, d_ggx, d_bk)
    return jnp.where(m_dir.z > 0, d, 0.0)


def smith_g1(dist, v, m_dir, alpha_u, alpha_v):
    """Monodirectional Smith shadowing-masking G1(v, m)."""
    v, m_dir = _v3(v), _v3(m_dir)
    xy_alpha_2 = (alpha_u * v.x) ** 2 + (alpha_v * v.y) ** 2
    cos2 = v.z * v.z
    tan_theta_alpha_2 = xy_alpha_2 / jnp.maximum(cos2, 1e-20)
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
    # NaN-safe under AD (the adjoint leaks NaN through zero-cotangent
    # products of UNSELECTED where branches): (a) the eps goes INSIDE the
    # sqrt — sqrt(0) has an infinite derivative and 0 * inf = NaN in the
    # backward; (b) `a` is clamped to the rational's selected range —
    # unclamped, a^2 overflows f32 to inf at tan->0 and the inf/inf = NaN
    # poisons d(alpha) even though the branch value is discarded.
    # (eps 1e-30, not smaller: f32 denormals may flush to zero, which
    # would put the infinite sqrt-derivative right back)
    a = 1.0 / jnp.sqrt(jnp.maximum(tan_theta_alpha_2, 1e-30))
    a_s = jnp.minimum(a, 1.6)
    a2 = a_s * a_s
    g_bk = jnp.where(a >= 1.6, 1.0,
                     (3.535 * a_s + 2.181 * a2) /
                     (1.0 + 2.276 * a_s + 2.577 * a2))
    g = jnp.where(dist == GGX, g_ggx, g_bk)
    same_side = (vdot(v, m_dir) * v.z) > 0
    g = jnp.where(same_side, g, 0.0)
    return jnp.where(xy_alpha_2 == 0.0, 1.0, g)


def g_smith(dist, wi, wo, m_dir, alpha_u, alpha_v):
    """Separable Smith G = G1(wi) G1(wo)."""
    return (smith_g1(dist, wi, m_dir, alpha_u, alpha_v) *
            smith_g1(dist, wo, m_dir, alpha_u, alpha_v))


def _sample_vndf_ggx(wi: Vec3, alpha_u, alpha_v, ua, ub) -> Vec3:
    """Heitz 2018 visible-normal sampling for GGX (sign-handled by caller)."""
    vh = vnormalize(Vec3(alpha_u * wi.x, alpha_v * wi.y, wi.z))
    lensq = vh.x * vh.x + vh.y * vh.y
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = vwhere(lensq > 1e-12,
                Vec3(-vh.y * inv_len, vh.x * inv_len, jnp.zeros_like(inv_len)),
                Vec3(jnp.ones_like(inv_len), jnp.zeros_like(inv_len),
                     jnp.zeros_like(inv_len)))
    t2 = Vec3(vh.y * t1.z - vh.z * t1.y,
              vh.z * t1.x - vh.x * t1.z,
              vh.x * t1.y - vh.y * t1.x)
    r = jnp.sqrt(ua)
    phi = 2.0 * jnp.pi * ub
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = t1 * p1 + t2 * p2 + vh * pz
    return vnormalize(Vec3(alpha_u * nh.x, alpha_v * nh.y,
                           jnp.maximum(nh.z, 1e-6)))


def sample(dist, wi, alpha_u, alpha_v, u) -> Tuple[Vec3, jnp.ndarray]:
    """Sample a microfacet normal m given incident wi; returns (m, pdf).

    GGX: visible-normal distribution (pdf = G1 |wi.m| D / |cos wi|).
    Beckmann: classic NDF sampling (pdf = D cos_m).
    `u` is a (ua, ub) tuple or (..., 2) array."""
    wi = _v3(wi)
    if isinstance(u, (tuple, list)):
        ua, ub = u
    else:
        ua, ub = u[..., 0], u[..., 1]
    wi_f = vwhere(wi.z < 0, -wi, wi)
    m_ggx = _sample_vndf_ggx(wi_f, alpha_u, alpha_v, ua, ub)
    # Beckmann classic (anisotropy via the phi-scaling trick, Heitz)
    phi = 2.0 * jnp.pi * ub
    cp = jnp.cos(phi) * alpha_u
    sp = jnp.sin(phi) * alpha_v
    norm = jnp.sqrt(jnp.maximum(cp * cp + sp * sp, 1e-30))
    cp, sp = cp / norm, sp / norm
    alpha2 = 1.0 / jnp.maximum((cp / alpha_u) ** 2 + (sp / alpha_v) ** 2, 1e-20)
    tan2 = -alpha2 * jnp.log(jnp.maximum(1.0 - ua, 1e-38))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    m_bk = Vec3(sin_t * cp, sin_t * sp, cos_t)

    is_ggx = dist == GGX
    m_out = vwhere(is_ggx, m_ggx, m_bk)
    return m_out, pdf(dist, wi, m_out, alpha_u, alpha_v)


def pdf(dist, wi, m_dir, alpha_u, alpha_v):
    """pdf of `sample` w.r.t. solid angle of m."""
    wi, m_dir = _v3(wi), _v3(m_dir)
    d = eval_d(dist, m_dir, alpha_u, alpha_v)
    wi_f = vwhere(wi.z < 0, -wi, wi)
    pdf_ggx = (smith_g1(dist, wi_f, m_dir, alpha_u, alpha_v) *
               jnp.abs(vdot(wi_f, m_dir)) * d /
               jnp.maximum(jnp.abs(wi_f.z), 1e-20))
    pdf_bk = d * m_dir.z
    return jnp.where(dist == GGX, pdf_ggx, jnp.maximum(pdf_bk, 0.0))

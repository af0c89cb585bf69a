"""Microfacet distributions: GGX + Beckmann with anisotropy.

TPU-native rebuild of mitsuba2's MicrofacetDistribution
(include/mitsuba/render/microfacet.h): `eval` (the NDF D), `smith_g1`, `G`,
`sample` + `pdf`. GGX uses visible-normal sampling (Heitz 2018's projected
hemisphere construction, the same technique the reference uses); Beckmann
uses classic full-NDF sampling (sample_visible=False in reference terms) —
eval/pdf/sample stay mutually consistent either way, which is what the chi^2
suite checks. All directions are in the LOCAL shading frame.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core import math as m
from ..core.geometry import Frame, normalize

GGX = 0
BECKMANN = 1


def eval_d(dist, m_dir, alpha_u, alpha_v):
    """NDF D(m). dist is per-lane int32 (0=GGX, 1=Beckmann)."""
    cos2 = m_dir[..., 2] * m_dir[..., 2]
    xa = m_dir[..., 0] / alpha_u
    ya = m_dir[..., 1] / alpha_v
    inv_norm = 1.0 / (jnp.pi * alpha_u * alpha_v)
    # GGX: 1 / (pi au av (x^2/au^2 + y^2/av^2 + z^2)^2)
    denom_g = xa * xa + ya * ya + cos2
    d_ggx = inv_norm / jnp.maximum(denom_g * denom_g, 1e-20)
    # Beckmann: exp(-(x^2/au^2 + y^2/av^2)/z^2) / (pi au av z^4)
    t2 = (xa * xa + ya * ya) / jnp.maximum(cos2, 1e-20)
    d_bk = inv_norm * jnp.exp(-t2) / jnp.maximum(cos2 * cos2, 1e-20)
    d = jnp.where(dist == GGX, d_ggx, d_bk)
    return jnp.where(m_dir[..., 2] > 0, d, 0.0)


def smith_g1(dist, v, m_dir, alpha_u, alpha_v):
    """Monodirectional Smith shadowing-masking G1(v, m)."""
    xy_alpha_2 = (alpha_u * v[..., 0]) ** 2 + (alpha_v * v[..., 1]) ** 2
    cos2 = v[..., 2] * v[..., 2]
    tan_theta_alpha_2 = xy_alpha_2 / jnp.maximum(cos2, 1e-20)
    # GGX
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
    # Beckmann rational approximation
    a = 1.0 / jnp.maximum(jnp.sqrt(tan_theta_alpha_2), 1e-20)
    a2 = a * a
    g_bk = jnp.where(a >= 1.6, 1.0,
                     (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2))
    g = jnp.where(dist == GGX, g_ggx, g_bk)
    # sidedness: v and m must lie on the same side
    same_side = (jnp.sum(v * m_dir, axis=-1) * v[..., 2]) > 0
    g = jnp.where(same_side, g, 0.0)
    return jnp.where(xy_alpha_2 == 0.0, 1.0, g)


def g_smith(dist, wi, wo, m_dir, alpha_u, alpha_v):
    """Separable Smith G = G1(wi) G1(wo)."""
    return (smith_g1(dist, wi, m_dir, alpha_u, alpha_v) *
            smith_g1(dist, wo, m_dir, alpha_u, alpha_v))


def _sample_vndf_ggx(wi, alpha_u, alpha_v, u):
    """Heitz 2018 visible-normal sampling for GGX (sign-handled by caller)."""
    # stretch
    vh = normalize(jnp.stack([alpha_u * wi[..., 0], alpha_v * wi[..., 1],
                              wi[..., 2]], axis=-1))
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(lensq[..., None] > 1e-12,
                   jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len,
                              jnp.zeros_like(inv_len)], axis=-1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    # sample projected disk
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (p1[..., None] * t1 + p2[..., None] * t2 +
          jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None] * vh)
    # unstretch
    ne = normalize(jnp.stack([alpha_u * nh[..., 0], alpha_v * nh[..., 1],
                              jnp.maximum(nh[..., 2], 1e-6)], axis=-1))
    return ne


def sample(dist, wi, alpha_u, alpha_v, u) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample a microfacet normal m given incident wi; returns (m, pdf).

    GGX: visible-normal distribution (pdf = G1 |wi.m| D / |cos wi|).
    Beckmann: classic NDF sampling (pdf = D cos_m).
    `dist` is per-lane; both are computed and selected (2 kinds max)."""
    # GGX VNDF — m always lives in the upper hemisphere; for wi.z < 0 sample
    # with the mirrored direction (microfacet.h: sign(cos_theta_i) * wi)
    wi_f = jnp.where(wi[..., 2:3] < 0, -wi, wi)
    m_ggx = _sample_vndf_ggx(wi_f, alpha_u, alpha_v, u)
    # Beckmann classic (isotropic-ish: anisotropy via scaling trick)
    phi = 2.0 * jnp.pi * u[..., 1]
    # anisotropic beckmann sampling (Heitz): sample with alpha_u/alpha_v scaling
    cp = jnp.cos(phi) * alpha_u
    sp = jnp.sin(phi) * alpha_v
    norm = jnp.sqrt(jnp.maximum(cp * cp + sp * sp, 1e-30))
    cp, sp = cp / norm, sp / norm
    alpha2 = 1.0 / jnp.maximum((cp / alpha_u) ** 2 + (sp / alpha_v) ** 2, 1e-20)
    tan2 = -alpha2 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-38))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    m_bk = jnp.stack([sin_t * cp, sin_t * sp, cos_t], axis=-1)

    is_ggx = (dist == GGX)[..., None]
    m_out = jnp.where(is_ggx, m_ggx, m_bk)
    return m_out, pdf(dist, wi, m_out, alpha_u, alpha_v)


def pdf(dist, wi, m_dir, alpha_u, alpha_v):
    """pdf of `sample` w.r.t. solid angle of m."""
    d = eval_d(dist, m_dir, alpha_u, alpha_v)
    # GGX visible-normal pdf (with the same mirrored-wi convention as sample)
    wi_f = jnp.where(wi[..., 2:3] < 0, -wi, wi)
    pdf_ggx = (smith_g1(dist, wi_f, m_dir, alpha_u, alpha_v) *
               jnp.abs(jnp.sum(wi_f * m_dir, axis=-1)) * d /
               jnp.maximum(jnp.abs(wi_f[..., 2]), 1e-20))
    # Beckmann classic pdf
    pdf_bk = d * m_dir[..., 2]
    return jnp.where(dist == GGX, pdf_ggx, jnp.maximum(pdf_bk, 0.0))

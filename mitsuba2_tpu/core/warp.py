"""Sampling warps: measure-preserving maps from [0,1)^2 to common domains.

TPU-native rebuild of mitsuba2's warp library (include/mitsuba/core/warp.h,
src/libcore/warp.cpp). Same function names and conventions: every
`square_to_X` has a matching `square_to_X_pdf` (density w.r.t. the solid
angle / area measure of the target domain) and, where the reference provides
one, an inverse `X_to_square`. All pure jnp, elementwise over (..., 2) /
(..., 3) arrays; chi^2-tested in tests/test_warp.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m
from .geometry import vec3

INV_PI = 1.0 / jnp.pi
INV_TWO_PI = 1.0 / (2.0 * jnp.pi)
INV_FOUR_PI = 1.0 / (4.0 * jnp.pi)


# ---------------------------------------------------------------------------
# Disk
# ---------------------------------------------------------------------------

def square_to_uniform_disk(u):
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def square_to_uniform_disk_pdf(p):
    inside = jnp.sum(p * p, axis=-1) <= 1.0
    return jnp.where(inside, INV_PI, 0.0)


def square_to_uniform_disk_concentric(u):
    """Shirley–Chiu concentric disk mapping (warp::square_to_uniform_disk_concentric)."""
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * jnp.pi * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * jnp.pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def uniform_disk_to_square_concentric(p):
    """Inverse of the Shirley–Chiu concentric mapping.

    Forward cases: |x|>|y| -> (r=x, phi=(pi/4)(y/x));
    else (r=y, phi=pi/2-(pi/4)(x/y)). The point angle equals phi for r>0
    and phi+pi for r<0; invert per angular octant-pair.
    """
    rr = jnp.sqrt(jnp.sum(p * p, axis=-1))
    ang = jnp.arctan2(p[..., 1], p[..., 0])  # [-pi, pi]
    quarter_pi = 0.25 * jnp.pi
    case_px = jnp.abs(ang) <= quarter_pi                      # r = x = +rr
    case_py = (ang >= quarter_pi) & (ang <= 3 * quarter_pi)   # r = y = +rr
    case_nx = jnp.abs(ang) >= 3 * quarter_pi                  # r = x = -rr
    # remaining: r = y = -rr
    # r = x branches: y = x * phi / (pi/4), phi = wrap(ang) into [-pi/4, pi/4]
    phi_nx = jnp.where(ang > 0, ang - jnp.pi, ang + jnp.pi)
    x1 = jnp.where(case_px, rr, -rr)
    y1 = x1 * jnp.where(case_px, ang, phi_nx) / quarter_pi
    # r = y branches: x = y * (pi/2 - phi) / (pi/4)
    phi_ny = ang + jnp.pi  # maps [-3pi/4, -pi/4] -> [pi/4, 3pi/4]
    y2 = jnp.where(case_py, rr, -rr)
    x2 = y2 * (0.5 * jnp.pi - jnp.where(case_py, ang, phi_ny)) / quarter_pi
    x_branch = case_px | case_nx
    x = jnp.where(x_branch, x1, x2)
    y = jnp.where(x_branch, y1, y2)
    return jnp.stack([(x + 1.0) * 0.5, (y + 1.0) * 0.5], axis=-1)


# ---------------------------------------------------------------------------
# Sphere / hemisphere
# ---------------------------------------------------------------------------

def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(v):
    return jnp.full(v.shape[:-1], INV_FOUR_PI, jnp.float32)


def uniform_sphere_to_square(v):
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
    return jnp.stack([(1.0 - v[..., 2]) * 0.5, phi * INV_TWO_PI], axis=-1)


def square_to_uniform_hemisphere(u):
    """Uniform hemisphere (+z), via concentric disk lift (as upstream)."""
    p = square_to_uniform_disk_concentric(u)
    z = 1.0 - jnp.sum(p * p, axis=-1)
    p = p * jnp.sqrt(jnp.maximum(2.0 - jnp.sum(p * p, axis=-1), 0.0))[..., None]
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_uniform_hemisphere_pdf(v):
    return jnp.where(v[..., 2] >= 0, INV_TWO_PI, 0.0)


def square_to_cosine_hemisphere(u):
    """Cosine-weighted hemisphere via Malley (concentric disk + lift)."""
    p = square_to_uniform_disk_concentric(u)
    z = m.safe_sqrt(1.0 - jnp.sum(p * p, axis=-1))
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.where(v[..., 2] >= 0, v[..., 2] * INV_PI, 0.0)


def cosine_hemisphere_to_square(v):
    return uniform_disk_to_square_concentric(v[..., :2])


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction in a cone around +z with cos(angle) >= cos_cutoff."""
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_cutoff
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def square_to_uniform_cone_pdf(v, cos_cutoff):
    pdf = INV_TWO_PI / (1.0 - cos_cutoff)
    return jnp.where(v[..., 2] >= cos_cutoff, pdf, 0.0)


# ---------------------------------------------------------------------------
# Triangle
# ---------------------------------------------------------------------------

def square_to_uniform_triangle(u):
    """Uniform barycentrics on the standard triangle (b1 + b2 <= 1).

    Upstream uses the sqrt parameterization (warp.cpp)."""
    t = m.safe_sqrt(1.0 - u[..., 0])
    return jnp.stack([1.0 - t, t * u[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(p):
    inside = (p[..., 0] >= 0) & (p[..., 1] >= 0) & (p[..., 0] + p[..., 1] <= 1.0)
    return jnp.where(inside, 2.0, 0.0)


# ---------------------------------------------------------------------------
# Gaussian / Beckmann / von Mises–Fisher
# ---------------------------------------------------------------------------

def square_to_std_normal(u):
    """Box–Muller (warp::square_to_std_normal)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-38)))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_std_normal_pdf(p):
    return INV_TWO_PI * jnp.exp(-0.5 * jnp.sum(p * p, axis=-1))


def square_to_beckmann(u, alpha):
    """Sample the (isotropic) Beckmann distribution of normals."""
    phi = 2.0 * jnp.pi * u[..., 1]
    tan_theta_2 = -alpha * alpha * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-38))
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta_2)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def square_to_beckmann_pdf(v, alpha):
    cos_theta = v[..., 2]
    tan_theta_2 = jnp.maximum(1.0 - cos_theta * cos_theta, 0.0) / jnp.maximum(cos_theta * cos_theta, 1e-20)
    a2 = alpha * alpha
    pdf = jnp.exp(-tan_theta_2 / a2) / (jnp.pi * a2 * jnp.maximum(cos_theta, 1e-20) ** 3)
    return jnp.where(cos_theta > 0, pdf, 0.0)


def square_to_von_mises_fisher(u, kappa):
    """vMF distribution around +z with concentration kappa (warp.cpp).

    Stable formulation: cos_theta = 1 + log(u + (1-u) exp(-2 kappa)) / kappa.
    """
    kappa = jnp.asarray(kappa, jnp.float32)
    e2k = jnp.exp(-2.0 * kappa)
    cos_theta = 1.0 + jnp.log(u[..., 0] + (1.0 - u[..., 0]) * e2k) / jnp.maximum(kappa, 1e-20)
    # kappa == 0 -> uniform sphere
    cos_theta = jnp.where(kappa <= 0.0, 1.0 - 2.0 * u[..., 0], cos_theta)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def square_to_von_mises_fisher_pdf(v, kappa):
    kappa = jnp.asarray(kappa, jnp.float32)
    pdf = jnp.exp(kappa * (v[..., 2] - 1.0)) * kappa / (2.0 * jnp.pi * (1.0 - jnp.exp(-2.0 * kappa)))
    return jnp.where(kappa <= 0.0, jnp.full(v.shape[:-1], INV_FOUR_PI, jnp.float32), pdf)


# ---------------------------------------------------------------------------
# Tent (reconstruction-filter importance sampling)
# ---------------------------------------------------------------------------

def interval_to_tent(u):
    """[0,1) -> [-1, 1] with tent density 1 - |x|."""
    u2 = 2.0 * u - 1.0
    return jnp.where(u2 >= 0, 1.0 - jnp.sqrt(jnp.maximum(1.0 - u2, 0.0)),
                     jnp.sqrt(jnp.maximum(u2 + 1.0, 0.0)) - 1.0)


def square_to_tent(u):
    return jnp.stack([interval_to_tent(u[..., 0]), interval_to_tent(u[..., 1])], axis=-1)


def square_to_tent_pdf(p):
    inside = (jnp.abs(p[..., 0]) <= 1) & (jnp.abs(p[..., 1]) <= 1)
    return jnp.where(inside, (1.0 - jnp.abs(p[..., 0])) * (1.0 - jnp.abs(p[..., 1])), 0.0)


def interval_to_nonuniform_tent(u, a, b, c):
    """[0,1) -> [a, c] tent with peak at b (warp::interval_to_nonuniform_tent)."""
    u_pivot = (b - a) / (c - a)
    lo = u < u_pivot
    factor = jnp.where(lo, a - b, c - b)
    u2 = jnp.where(lo, u * ((a - c) / (a - b)), ((a - c) / (b - c)) * (u - u_pivot))
    return b + factor * (1.0 - m.safe_sqrt(jnp.clip(u2, 0.0, 1.0)))

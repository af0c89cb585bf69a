"""Sampling warps: measure-preserving maps from [0,1)^2 to common domains.

TPU-native rebuild of mitsuba2's warp library (include/mitsuba/core/warp.h,
src/libcore/warp.cpp). Same function names and conventions: every
`square_to_X` has a matching `square_to_X_pdf` (density w.r.t. the solid
angle / area measure of the target domain) and, where the reference provides
one, an inverse `X_to_square`. chi^2-tested in tests/test_warp.py.

PLANAR LAYOUT: directional outputs are Vec3 (struct-of-arrays; see
core/vec.py for the measured TPU rationale); 2D samples are accepted as
either an (..., 2) array or a (u, v) tuple of (...,) arrays and 2D outputs
are returned as tuples.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m
from .vec import Vec3

INV_PI = 1.0 / jnp.pi
INV_TWO_PI = 1.0 / (2.0 * jnp.pi)
INV_FOUR_PI = 1.0 / (4.0 * jnp.pi)


def _u2(u):
    """Accept (..., 2) array or (ua, ub) tuple."""
    if isinstance(u, (tuple, list)):
        return u[0], u[1]
    return u[..., 0], u[..., 1]


def _v3(v) -> Vec3:
    if isinstance(v, Vec3):
        return v
    return Vec3.from_array(v)


# ---------------------------------------------------------------------------
# Disk
# ---------------------------------------------------------------------------

def square_to_uniform_disk(u):
    ua, ub = _u2(u)
    r = jnp.sqrt(ua)
    theta = 2.0 * jnp.pi * ub
    return r * jnp.cos(theta), r * jnp.sin(theta)


def square_to_uniform_disk_pdf(p):
    px, py = _u2(p)
    inside = px * px + py * py <= 1.0
    return jnp.where(inside, INV_PI, 0.0)


def square_to_uniform_disk_concentric(u):
    """Shirley–Chiu concentric disk mapping."""
    ua, ub = _u2(u)
    x = 2.0 * ua - 1.0
    y = 2.0 * ub - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * jnp.pi * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * jnp.pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def uniform_disk_to_square_concentric(p):
    """Inverse of the Shirley–Chiu concentric mapping."""
    px, py = _u2(p)
    rr = jnp.sqrt(px * px + py * py)
    ang = jnp.arctan2(py, px)  # [-pi, pi]
    quarter_pi = 0.25 * jnp.pi
    case_px = jnp.abs(ang) <= quarter_pi
    case_py = (ang >= quarter_pi) & (ang <= 3 * quarter_pi)
    case_nx = jnp.abs(ang) >= 3 * quarter_pi
    phi_nx = jnp.where(ang > 0, ang - jnp.pi, ang + jnp.pi)
    x1 = jnp.where(case_px, rr, -rr)
    y1 = x1 * jnp.where(case_px, ang, phi_nx) / quarter_pi
    phi_ny = ang + jnp.pi
    y2 = jnp.where(case_py, rr, -rr)
    x2 = y2 * (0.5 * jnp.pi - jnp.where(case_py, ang, phi_ny)) / quarter_pi
    x_branch = case_px | case_nx
    x = jnp.where(x_branch, x1, x2)
    y = jnp.where(x_branch, y1, y2)
    return (x + 1.0) * 0.5, (y + 1.0) * 0.5


# ---------------------------------------------------------------------------
# Sphere / hemisphere
# ---------------------------------------------------------------------------

def square_to_uniform_sphere(u) -> Vec3:
    ua, ub = _u2(u)
    z = 1.0 - 2.0 * ua
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * ub
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_sphere_pdf(v):
    v = _v3(v)
    return jnp.full(jnp.shape(v.z), INV_FOUR_PI, jnp.float32)


def uniform_sphere_to_square(v):
    v = _v3(v)
    phi = jnp.arctan2(v.y, v.x)
    phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
    return (1.0 - v.z) * 0.5, phi * INV_TWO_PI


def square_to_uniform_hemisphere(u) -> Vec3:
    """Uniform hemisphere (+z), via concentric disk lift (as upstream)."""
    px, py = square_to_uniform_disk_concentric(u)
    r2 = px * px + py * py
    z = 1.0 - r2
    s = jnp.sqrt(jnp.maximum(2.0 - r2, 0.0))
    return Vec3(px * s, py * s, z)


def square_to_uniform_hemisphere_pdf(v):
    v = _v3(v)
    return jnp.where(v.z >= 0, INV_TWO_PI, 0.0)


def square_to_cosine_hemisphere(u) -> Vec3:
    """Cosine-weighted hemisphere via Malley (concentric disk + lift)."""
    px, py = square_to_uniform_disk_concentric(u)
    z = m.safe_sqrt(1.0 - (px * px + py * py))
    return Vec3(px, py, z)


def square_to_cosine_hemisphere_pdf(v):
    v = _v3(v)
    return jnp.where(v.z >= 0, v.z * INV_PI, 0.0)


def cosine_hemisphere_to_square(v):
    v = _v3(v)
    return uniform_disk_to_square_concentric((v.x, v.y))


def square_to_uniform_cone(u, cos_cutoff) -> Vec3:
    """Uniform direction in a cone around +z with cos(angle) >= cos_cutoff."""
    ua, ub = _u2(u)
    cos_theta = (1.0 - ua) + ua * cos_cutoff
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * ub
    return Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def square_to_uniform_cone_pdf(v, cos_cutoff):
    v = _v3(v)
    pdf = INV_TWO_PI / (1.0 - cos_cutoff)
    return jnp.where(v.z >= cos_cutoff, pdf, 0.0)


# ---------------------------------------------------------------------------
# Triangle
# ---------------------------------------------------------------------------

def square_to_uniform_triangle(u):
    """Uniform barycentrics (b0, b1) on the standard triangle (b0+b1 <= 1)."""
    ua, ub = _u2(u)
    t = m.safe_sqrt(1.0 - ua)
    return 1.0 - t, t * ub


def square_to_uniform_triangle_pdf(p):
    b0, b1 = _u2(p)
    inside = (b0 >= 0) & (b1 >= 0) & (b0 + b1 <= 1.0)
    return jnp.where(inside, 2.0, 0.0)


# ---------------------------------------------------------------------------
# Gaussian / Beckmann / von Mises–Fisher
# ---------------------------------------------------------------------------

def square_to_std_normal(u):
    """Box–Muller (warp::square_to_std_normal)."""
    ua, ub = _u2(u)
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - ua, 1e-38)))
    phi = 2.0 * jnp.pi * ub
    return r * jnp.cos(phi), r * jnp.sin(phi)


def square_to_std_normal_pdf(p):
    px, py = _u2(p)
    return INV_TWO_PI * jnp.exp(-0.5 * (px * px + py * py))


def square_to_beckmann(u, alpha) -> Vec3:
    """Sample the (isotropic) Beckmann distribution of normals."""
    ua, ub = _u2(u)
    phi = 2.0 * jnp.pi * ub
    tan_theta_2 = -alpha * alpha * jnp.log(jnp.maximum(1.0 - ua, 1e-38))
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta_2)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    return Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def square_to_beckmann_pdf(v, alpha):
    v = _v3(v)
    cos_theta = v.z
    tan_theta_2 = jnp.maximum(1.0 - cos_theta * cos_theta, 0.0) / \
        jnp.maximum(cos_theta * cos_theta, 1e-20)
    a2 = alpha * alpha
    pdf = jnp.exp(-tan_theta_2 / a2) / \
        (jnp.pi * a2 * jnp.maximum(cos_theta, 1e-20) ** 3)
    return jnp.where(cos_theta > 0, pdf, 0.0)


def square_to_von_mises_fisher(u, kappa) -> Vec3:
    """vMF distribution around +z with concentration kappa (warp.cpp)."""
    ua, ub = _u2(u)
    kappa = jnp.asarray(kappa, jnp.float32)
    e2k = jnp.exp(-2.0 * kappa)
    cos_theta = 1.0 + jnp.log(ua + (1.0 - ua) * e2k) / jnp.maximum(kappa, 1e-20)
    cos_theta = jnp.where(kappa <= 0.0, 1.0 - 2.0 * ua, cos_theta)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * ub
    return Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def square_to_von_mises_fisher_pdf(v, kappa):
    v = _v3(v)
    kappa = jnp.asarray(kappa, jnp.float32)
    pdf = jnp.exp(kappa * (v.z - 1.0)) * kappa / \
        (2.0 * jnp.pi * (1.0 - jnp.exp(-2.0 * kappa)))
    return jnp.where(kappa <= 0.0,
                     jnp.full(jnp.shape(v.z), INV_FOUR_PI, jnp.float32), pdf)


# ---------------------------------------------------------------------------
# Tent (reconstruction-filter importance sampling)
# ---------------------------------------------------------------------------

def interval_to_tent(u):
    """[0,1) -> [-1, 1] with tent density 1 - |x|."""
    u2 = 2.0 * u - 1.0
    return jnp.where(u2 >= 0, 1.0 - jnp.sqrt(jnp.maximum(1.0 - u2, 0.0)),
                     jnp.sqrt(jnp.maximum(u2 + 1.0, 0.0)) - 1.0)


def square_to_tent(u):
    ua, ub = _u2(u)
    return interval_to_tent(ua), interval_to_tent(ub)


def square_to_tent_pdf(p):
    px, py = _u2(p)
    inside = (jnp.abs(px) <= 1) & (jnp.abs(py) <= 1)
    return jnp.where(inside, (1.0 - jnp.abs(px)) * (1.0 - jnp.abs(py)), 0.0)


def interval_to_nonuniform_tent(u, a, b, c):
    """[0,1) -> [a, c] tent with peak at b (warp::interval_to_nonuniform_tent)."""
    u_pivot = (b - a) / (c - a)
    lo = u < u_pivot
    factor = jnp.where(lo, a - b, c - b)
    u2 = jnp.where(lo, u * ((a - c) / (a - b)), ((a - c) / (b - c)) * (u - u_pivot))
    return b + factor * (1.0 - m.safe_sqrt(jnp.clip(u2, 0.0, 1.0)))

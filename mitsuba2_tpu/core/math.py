"""Low-level math utilities (TPU-native rebuild of mitsuba2's libcore math layer).

Reference parity: `include/mitsuba/core/math.h` (find_interval, solve_quadratic,
linear_to_srgb, ulp-safe helpers). Everything here is pure jnp, shape-polymorphic,
and safe under jit/vmap/grad.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Float epsilons mirroring mitsuba's math::RayEpsilon / ShadowEpsilon discipline
# (include/mitsuba/core/math.h). We use float32 everywhere on TPU.
# Module-level constants MUST be host (numpy) values: a jnp op here would
# initialize the accelerator backend at import time (and hang the import
# when the TPU tunnel is down).
EPSILON = float(np.finfo(np.float32).eps) / 2  # machine epsilon / 2
RAY_EPSILON = EPSILON * 1500.0
SHADOW_EPSILON = RAY_EPSILON * 10.0
ONE_MINUS_EPSILON = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
INF = float("inf")


@jax.custom_jvp
def safe_sqrt(x):
    """sqrt clamped to zero with a FINITE derivative at x <= 0
    (dr::safe_sqrt). Plain sqrt(max(x, 0)) still has derivative +inf AT
    x == 0, and the adjoint's 0-cotangent times that inf poisons every
    upstream gradient with NaN (observed: roughconductor material grads
    through the VNDF sampler's sin_t = safe_sqrt(1 - cos^2))."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.sqrt(jnp.maximum(x, 0.0))
    dy = jnp.where(x > 1e-20, 0.5 / jnp.maximum(y, 1e-10), 0.0) * dx
    return y, dy


def safe_rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, jnp.finfo(jnp.float32).tiny))


@jax.custom_jvp
def safe_acos(x):
    """arccos clamped to [-1, 1] with a BOUNDED derivative at the
    endpoints (plain acos has derivative -inf at |x| = 1; see safe_sqrt
    for the 0 * inf = NaN adjoint mechanism)."""
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


@safe_acos.defjvp
def _safe_acos_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xc = jnp.clip(x, -1.0, 1.0)
    dy = -1.0 / safe_sqrt(1.0 - xc * xc + 1e-12) * dx
    return jnp.arccos(xc), dy


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def sqr(x):
    return x * x


def lerp(a, b, t):
    return a + (b - a) * t


def rcp(x):
    return 1.0 / x


def safe_rcp(x, eps=1e-20):
    """Reciprocal that never divides by exactly zero (sign-preserving)."""
    return 1.0 / jnp.where(jnp.abs(x) < eps, jnp.where(x >= 0, eps, -eps), x)


def sign(x):
    """Branchless sign returning +1 for +0 (mitsuba math::sign semantics)."""
    return jnp.where(x >= 0, 1.0, -1.0)


def mulsign(x, y):
    """x * sign(y) without a multiply (enoki::mulsign)."""
    return jnp.where(y >= 0, x, -x)


def fmadd(a, b, c):
    return a * b + c


def solve_quadratic(a, b, c):
    """Numerically stable quadratic solver.

    Returns (valid, x0, x1) with x0 <= x1. Mirrors mitsuba
    `math::solve_quadratic` (include/mitsuba/core/math.h): handles the
    linear case a ~= 0 and uses the stable +-sqrt formulation.
    """
    is_linear = jnp.abs(a) < 1e-20
    disc = b * b - 4.0 * a * c
    valid_quad = disc >= 0.0
    sqrt_disc = safe_sqrt(disc)
    # Numerically stable: q = -0.5 (b + sign(b) sqrt(disc))
    temp = -0.5 * (b + mulsign(sqrt_disc, b))
    x0q = temp / jnp.where(jnp.abs(a) < 1e-20, 1.0, a)
    x1q = c / jnp.where(jnp.abs(temp) < 1e-20, 1.0, temp)
    lo = jnp.minimum(x0q, x1q)
    hi = jnp.maximum(x0q, x1q)
    # Linear case: bx + c = 0
    x_lin = -c / jnp.where(jnp.abs(b) < 1e-20, 1.0, b)
    valid_lin = jnp.abs(b) >= 1e-20
    valid = jnp.where(is_linear, valid_lin, valid_quad)
    x0 = jnp.where(is_linear, x_lin, lo)
    x1 = jnp.where(is_linear, x_lin, hi)
    return valid, x0, x1


def find_interval(values, x):
    """Vectorized bisection: largest index i such that values[i] <= x,
    clamped to [0, len-2] (mirrors `math::find_interval`). `values` is a
    sorted 1-D array; `x` may be any shape. Uses searchsorted (XLA lowers
    this to a fused bisection loop on TPU)."""
    idx = jnp.searchsorted(values, x, side="right") - 1
    return jnp.clip(idx, 0, values.shape[0] - 2)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def hypot2(a, b):
    return jnp.sqrt(a * a + b * b)


def atanh(x):
    return jnp.arctanh(x)


def sinxx(x):
    """sin(x)/x with the limit at 0."""
    return jnp.where(jnp.abs(x) < 1e-6, 1.0, jnp.sin(x) / jnp.where(x == 0, 1.0, x))


def legendre_p(n: int, x):
    """Legendre polynomial P_n(x) via the recurrence (math::legendre_p)."""
    if n == 0:
        return jnp.ones_like(x)
    p0 = jnp.ones_like(x)
    p1 = x
    for k in range(1, n):
        p0, p1 = p1, ((2 * k + 1) * x * p1 - k * p0) / (k + 1)
    return p1


def morton2(x, y):
    """Interleave lower 16 bits of x and y into a 32-bit Morton code."""
    def part(v):
        v = v.astype(jnp.uint32) & jnp.uint32(0x0000FFFF)
        v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
        v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x33333333)
        v = (v | (v << 1)) & jnp.uint32(0x55555555)
        return v
    return part(x) | (part(y) << 1)


def morton3(x, y, z):
    """Interleave lower 10 bits of x, y, z into a 30-bit Morton code."""
    def part(v):
        v = v.astype(jnp.uint32) & jnp.uint32(0x000003FF)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v
    return part(x) | (part(y) << 1) | (part(z) << 2)


def rlgamma(a, x):
    """Regularized lower incomplete gamma P(a, x).

    Port of the pure-python `rlgamma` used by mitsuba's chi^2 harness
    (src/python/python/math_py.py): series expansion for x < a + 1,
    continued fraction otherwise. Host-side (numpy-compatible scalars),
    used only by the statistical test harness.
    """
    import math

    if x < 0 or a <= 0:
        raise ValueError("rlgamma: invalid arguments")
    if x == 0:
        return 0.0
    lg = math.lgamma(a)
    if x < a + 1.0:
        # Series expansion
        term = 1.0 / a
        s = term
        n = a
        for _ in range(1000):
            n += 1.0
            term *= x / n
            s += term
            if abs(term) < abs(s) * 1e-15:
                break
        return math.exp(-x + a * math.log(x) - lg) * s
    else:
        # Continued fraction (Lentz)
        tiny = 1e-300
        b = x + 1.0 - a
        c = 1.0 / tiny
        d = 1.0 / b
        h = d
        for i in range(1, 1000):
            an = -i * (i - a)
            b += 2.0
            d = an * d + b
            if abs(d) < tiny:
                d = tiny
            c = b + an / c
            if abs(c) < tiny:
                c = tiny
            d = 1.0 / d
            delta = d * c
            h *= delta
            if abs(delta - 1.0) < 1e-15:
                break
        return 1.0 - math.exp(-x + a * math.log(x) - lg) * h

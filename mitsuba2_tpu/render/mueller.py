"""Mueller calculus for polarized transport.

TPU-native rebuild of mitsuba2's mueller.h (include/mitsuba/render/
mueller.h). Stokes vectors are (..., 4) arrays (I, Q, U, V); Mueller
matrices are (..., 4, 4). In the `*_polarized` variants the reference's
Spectrum becomes a Mueller-matrix-valued spectrum — here the polarized
integrator (stokes AOV) carries (..., 4, C) Stokes radiance and applies
these operators per channel. Conventions follow the reference: Stokes
basis +Q = horizontal in the local frame, angles measured counter-
clockwise when looking INTO the propagating beam.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.geometry import normalize
from . import fresnel as fr


def depolarizer(value=1.0):
    """Depolarizing Mueller matrix scaling total intensity (mueller.h)."""
    value = jnp.asarray(value, jnp.float32)
    m = jnp.zeros(value.shape + (4, 4), jnp.float32)
    return m.at[..., 0, 0].set(value)


def absorber(value=1.0):
    """Ideal absorber: uniform attenuation of all Stokes components."""
    value = jnp.asarray(value, jnp.float32)
    return jnp.eye(4, dtype=jnp.float32) * value[..., None, None]


def linear_polarizer(value=1.0):
    """Ideal linear polarizer along +Q (horizontal), transmission `value`."""
    v = jnp.asarray(value, jnp.float32) * 0.5
    z = jnp.zeros_like(v)
    rows = [[v, v, z, z],
            [v, v, z, z],
            [z, z, z, z],
            [z, z, z, z]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def linear_retarder(phase):
    """Linear retarder with fast axis horizontal, retardance `phase` rad
    (quarter-wave plate: phase = pi/2; half-wave: pi)."""
    phase = jnp.asarray(phase, jnp.float32)
    c, s = jnp.cos(phase), jnp.sin(phase)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [[o, z, z, z],
            [z, o, z, z],
            [z, z, c, -s],
            [z, z, s, c]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def rotator(theta):
    """Rotation of the Stokes reference frame by theta (mueller.h::rotator):
    note the doubled angles on Q/U."""
    theta = jnp.asarray(theta, jnp.float32)
    c, s = jnp.cos(2 * theta), jnp.sin(2 * theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [[o, z, z, z],
            [z, c, s, z],
            [z, -s, c, z],
            [z, z, z, o]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def rotated_element(theta, m):
    """Apply element `m` with its axis rotated by theta:
    R(theta) @ m @ R(-theta) (mueller.h::rotated_element)."""
    return rotator(theta) @ m @ rotator(-theta)


def _fresnel_amplitudes_conductor(cos_theta_i, eta_re, eta_im):
    """Complex r_s, r_p for a conductor (complex relative IOR)."""
    eta = eta_re + 1j * eta_im
    ct = jnp.asarray(cos_theta_i, jnp.complex64)
    st2 = 1.0 - ct * ct
    ctt = jnp.sqrt(1.0 - st2 / (eta * eta))
    r_s = (ct - eta * ctt) / (ct + eta * ctt)
    r_p = (eta * ct - ctt) / (eta * ct + ctt)
    return r_s, r_p


def _fresnel_amplitudes_dielectric(cos_theta_i, eta):
    """Real r_s, r_p for a dielectric (handles TIR via clamping to +-1)."""
    ct = jnp.abs(jnp.asarray(cos_theta_i, jnp.float32))
    st2 = 1.0 - ct * ct
    inner = 1.0 - st2 / (eta * eta)
    tir = inner < 0
    ctt = jnp.sqrt(jnp.maximum(inner, 0.0))
    r_s = (ct - eta * ctt) / (ct + eta * ctt)
    r_p = (eta * ct - ctt) / (eta * ct + ctt)
    r_s = jnp.where(tir, 1.0, r_s)
    r_p = jnp.where(tir, -1.0, r_p)
    return r_s, r_p


def _amplitudes_to_mueller(r_s, r_p):
    """Jones reflection amplitudes -> Mueller matrix (mueller.h::
    specular_reflection's construction)."""
    a = (jnp.abs(r_s) ** 2).astype(jnp.float32)
    b = (jnp.abs(r_p) ** 2).astype(jnp.float32)
    cross = r_s * jnp.conjugate(r_p)
    c = jnp.real(cross).astype(jnp.float32)
    s = jnp.imag(cross).astype(jnp.float32)
    m00 = 0.5 * (a + b)
    m01 = 0.5 * (a - b)
    z = jnp.zeros_like(m00)
    rows = [[m00, m01, z, z],
            [m01, m00, z, z],
            [z, z, c, s],
            [z, z, -s, c]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def specular_reflection_conductor(cos_theta_i, eta_re, eta_im):
    """Mueller matrix of specular reflection off a conductor."""
    r_s, r_p = _fresnel_amplitudes_conductor(cos_theta_i, eta_re, eta_im)
    return _amplitudes_to_mueller(r_s, r_p)


def specular_reflection_dielectric(cos_theta_i, eta):
    """Mueller matrix of specular reflection off a dielectric."""
    r_s, r_p = _fresnel_amplitudes_dielectric(cos_theta_i, eta)
    return _amplitudes_to_mueller(r_s.astype(jnp.complex64),
                                  r_p.astype(jnp.complex64))


def specular_transmission_dielectric(cos_theta_i, eta):
    """Mueller matrix of specular refraction into a dielectric
    (mueller.h::specular_transmission), including the radiance-compression
    solid-angle factor."""
    ct = jnp.abs(jnp.asarray(cos_theta_i, jnp.float32))
    st2 = 1.0 - ct * ct
    inner = 1.0 - st2 / (eta * eta)
    valid = inner > 0
    ctt = jnp.sqrt(jnp.maximum(inner, 1e-20))
    # amplitude transmission coefficients
    t_s = 2.0 * ct / (ct + eta * ctt)
    t_p = 2.0 * ct / (eta * ct + ctt)
    # power normalization factor (eta ratio * angle ratio)
    factor = (ctt / ct) * eta
    a = t_s * t_s * factor
    b = t_p * t_p * factor
    m00 = 0.5 * (a + b)
    m01 = 0.5 * (a - b)
    c = t_s * t_p * factor
    z = jnp.zeros_like(m00)
    rows = [[m00, m01, z, z],
            [m01, m00, z, z],
            [z, z, c, z],
            [z, z, z, c]]
    m = jnp.stack([jnp.stack(r, -1) for r in rows], -2)
    return jnp.where(jnp.asarray(valid)[..., None, None], m,
                     jnp.zeros_like(m))


def stokes_basis(w):
    """A canonical perpendicular basis vector for propagation direction w
    (mueller.h::stokes_basis): the horizontal (+Q) axis."""
    w = jnp.asarray(w, jnp.float32)
    # coordinate_system's first tangent (frame.h)
    sign = jnp.where(w[..., 2] >= 0, 1.0, -1.0)
    a = -1.0 / (sign + w[..., 2])
    b = w[..., 0] * w[..., 1] * a
    return jnp.stack([1.0 + sign * w[..., 0] ** 2 * a,
                      sign * b,
                      -sign * w[..., 0]], -1)


def rotate_stokes_basis(w, basis_old, basis_new):
    """Mueller rotator aligning basis_old to basis_new around w
    (mueller.h::rotate_stokes_basis)."""
    # signed angle from old to new around w
    cos_t = jnp.sum(basis_old * basis_new, -1)
    sin_t = jnp.sum(jnp.cross(basis_old, basis_new) * w, -1)
    theta = jnp.arctan2(sin_t, cos_t)
    return rotator(theta)


def unpolarized_intensity(m00_scale):
    """Helper: Stokes vector of unpolarized light with intensity I."""
    i = jnp.asarray(m00_scale, jnp.float32)
    z = jnp.zeros_like(i)
    return jnp.stack([i, z, z, z], -1)

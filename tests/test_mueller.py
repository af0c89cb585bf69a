"""Mueller calculus tests (mueller.h identities): Malus's law, retarder
behavior, Fresnel-Mueller consistency with the scalar Fresnel code."""
import jax.numpy as jnp
import numpy as np

from mitsuba2_tpu.render import fresnel as fr
from mitsuba2_tpu.render import mueller as mu


def test_malus_law():
    """Unpolarized -> polarizer -> rotated polarizer: I = 0.5 cos^2."""
    s0 = mu.unpolarized_intensity(1.0)
    p0 = mu.linear_polarizer(1.0)
    for deg in (0, 30, 45, 60, 90):
        th = np.deg2rad(deg)
        p1 = mu.rotated_element(jnp.float32(th), mu.linear_polarizer(1.0))
        out = p1 @ (p0 @ s0[..., None])
        I = float(out[0, 0])
        np.testing.assert_allclose(I, 0.5 * np.cos(th) ** 2, atol=1e-6)


def test_quarter_wave_plate_circular():
    """Linear 45-deg light through a quarter-wave plate -> circular."""
    s45 = jnp.asarray([1.0, 0.0, 1.0, 0.0])  # +U polarized
    qwp = mu.linear_retarder(jnp.float32(np.pi / 2))
    out = np.asarray(qwp @ s45)
    np.testing.assert_allclose(out, [1, 0, 0, 1], atol=1e-6)


def test_rotator_roundtrip():
    th = jnp.float32(0.7)
    m = mu.rotator(th) @ mu.rotator(-th)
    np.testing.assert_allclose(np.asarray(m), np.eye(4), atol=1e-6)


def test_fresnel_mueller_unpolarized_matches_scalar():
    """M[0,0] (intensity reflectance of unpolarized light) must equal the
    scalar Fresnel reflectance for both dielectrics and conductors."""
    cos_i = jnp.asarray(np.linspace(0.05, 1.0, 32), jnp.float32)
    eta = 1.5
    m = mu.specular_reflection_dielectric(cos_i, jnp.float32(eta))
    F = np.asarray(fr.fresnel(cos_i, jnp.float32(eta))[0])
    np.testing.assert_allclose(np.asarray(m[..., 0, 0]), F, atol=1e-5)

    eta_c, k_c = jnp.float32(0.2), jnp.float32(3.0)
    mc = mu.specular_reflection_conductor(cos_i, eta_c, k_c)
    Fc = np.asarray(fr.fresnel_conductor(cos_i, eta_c, k_c))
    np.testing.assert_allclose(np.asarray(mc[..., 0, 0]), Fc, atol=1e-4)


def test_brewster_full_polarization():
    """At Brewster's angle a dielectric reflection is fully polarized:
    |Q| = I (r_p = 0)."""
    eta = 1.5
    brewster = np.arctan(eta)
    m = mu.specular_reflection_dielectric(jnp.float32(np.cos(brewster)),
                                          jnp.float32(eta))
    s = np.asarray(m @ jnp.asarray([1.0, 0, 0, 0]))
    np.testing.assert_allclose(abs(s[1]), s[0], rtol=1e-4)


def test_transmission_energy_plus_reflection():
    """Away from TIR: unpolarized R + T = 1 (energy conservation in the
    radiance-compression convention T includes the 1/eta^2 factor undone)."""
    cos_i = jnp.asarray([0.9, 0.7, 0.6], jnp.float32)
    eta = jnp.float32(1.5)
    R = np.asarray(mu.specular_reflection_dielectric(cos_i, eta)[..., 0, 0])
    T = np.asarray(mu.specular_transmission_dielectric(cos_i, eta)[..., 0, 0])
    np.testing.assert_allclose(R + T, 1.0, atol=1e-4)


def test_stokes_basis_orthogonal():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 3)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    b = np.asarray(mu.stokes_basis(jnp.asarray(w)))
    np.testing.assert_allclose((b * w).sum(-1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1, atol=1e-4)


def test_rotate_stokes_basis_identity():
    w = jnp.asarray([0.0, 0.0, 1.0])
    b = mu.stokes_basis(w)
    m = mu.rotate_stokes_basis(w, b, b)
    np.testing.assert_allclose(np.asarray(m), np.eye(4), atol=1e-6)

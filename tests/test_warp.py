"""Chi^2 tests over every sampling warp (mirrors src/libcore/tests/test_warp.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba2_tpu import chi2
from mitsuba2_tpu.core import warp


def run_spherical(sample, pdf, sample_count=300_000, res=17, ires=8):
    t = chi2.ChiSquareTest(chi2.SphericalDomain(), sample, pdf,
                           sample_count=sample_count, res=res, ires=ires)
    ok = t.run()
    assert ok, "\n".join(t.messages)


def run_planar(sample, pdf, bounds=None, sample_count=300_000, res=17):
    t = chi2.ChiSquareTest(chi2.PlanarDomain(bounds), sample, pdf,
                           sample_count=sample_count, res=res)
    ok = t.run()
    assert ok, "\n".join(t.messages)


def test_uniform_sphere():
    run_spherical(warp.square_to_uniform_sphere, warp.square_to_uniform_sphere_pdf)


def test_uniform_hemisphere():
    run_spherical(warp.square_to_uniform_hemisphere, warp.square_to_uniform_hemisphere_pdf)


def test_cosine_hemisphere():
    run_spherical(warp.square_to_cosine_hemisphere, warp.square_to_cosine_hemisphere_pdf)


@pytest.mark.parametrize("cutoff", [0.875, 0.5, -0.5])
def test_uniform_cone(cutoff):
    # Cutoffs chosen on histogram-bin edges (res=16 -> edges at multiples of
    # 1/8): the cone pdf is discontinuous at the cap boundary, and midpoint
    # quadrature of a straddling cell would bias the expected counts.
    t = chi2.ChiSquareTest(chi2.SphericalDomain(),
                           lambda u: warp.square_to_uniform_cone(u, cutoff),
                           lambda v: warp.square_to_uniform_cone_pdf(v, cutoff),
                           sample_count=300_000, res=16)
    ok = t.run()
    assert ok, "\n".join(t.messages)


@pytest.mark.parametrize("alpha", [0.1, 0.5, 1.0])
def test_beckmann(alpha):
    # Peaked pdfs need finer quadrature to resolve the lobe near the pole
    run_spherical(lambda u: warp.square_to_beckmann(u, alpha),
                  lambda v: warp.square_to_beckmann_pdf(v, alpha),
                  ires=64 if alpha < 0.3 else 8)


@pytest.mark.parametrize("kappa", [0.5, 10.0, 100.0])
def test_von_mises_fisher(kappa):
    run_spherical(lambda u: warp.square_to_von_mises_fisher(u, kappa),
                  lambda v: warp.square_to_von_mises_fisher_pdf(v, kappa),
                  ires=64 if kappa > 50 else 8)


def test_uniform_disk():
    run_planar(warp.square_to_uniform_disk, warp.square_to_uniform_disk_pdf)


def test_uniform_disk_concentric():
    run_planar(warp.square_to_uniform_disk_concentric, warp.square_to_uniform_disk_pdf)


def test_tent():
    run_planar(warp.square_to_tent, warp.square_to_tent_pdf)


def test_uniform_triangle():
    run_planar(warp.square_to_uniform_triangle, warp.square_to_uniform_triangle_pdf,
               bounds=np.array([[0.0, 1.0], [0.0, 1.0]]))


def test_std_normal():
    run_planar(warp.square_to_std_normal, warp.square_to_std_normal_pdf,
               bounds=np.array([[-4.0, 4.0], [-4.0, 4.0]]))


def test_concentric_disk_inverse_roundtrip():
    rng = np.random.default_rng(0)
    u = rng.random((10_000, 2)).astype(np.float32)
    p = warp.square_to_uniform_disk_concentric(jnp.asarray(u))
    u2 = warp.uniform_disk_to_square_concentric(p)
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in u2], -1),
                               u, atol=2e-5)


def test_cosine_hemisphere_inverse_roundtrip():
    rng = np.random.default_rng(1)
    u = rng.random((10_000, 2)).astype(np.float32)
    d = warp.square_to_cosine_hemisphere(jnp.asarray(u))
    u2 = warp.cosine_hemisphere_to_square(d)
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in u2], -1),
                               u, atol=2e-5)


def test_interval_to_tent():
    u = jnp.linspace(0.001, 0.999, 1001)
    x = np.asarray(warp.interval_to_tent(u))
    assert (x >= -1).all() and (x <= 1).all()
    # CDF of tent at 0 is 0.5
    assert abs(np.interp(0.0, x, np.asarray(u)) - 0.5) < 1e-3

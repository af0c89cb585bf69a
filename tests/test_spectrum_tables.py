"""CIE 1931 + D65 data-table validation (VERDICT.md round-2 item 7).

The tables (core/cie_data.py) replace round-1's analytic stand-ins; these
tests pin them against independent colorimetric invariants so a transcription
error cannot hide: the D65 white point, the CIE luminous-efficiency
integral, the equal-energy white, and the device (one-hot-matmul) lookup
path against host numpy interpolation.
"""
import numpy as np
import jax.numpy as jnp

from mitsuba2_tpu.core import cie_data as C
from mitsuba2_tpu.core import spectrum as sp


def test_cie_y_integral():
    # canonical CIE luminous normalization constant (1 nm: 106.856895)
    assert abs(sp.CIE_Y_INTEGRAL - 106.857) < 0.05


def test_d65_white_point():
    X, Y, Z = (C.D65_TBL[:, None] * C.CIE_1931_TBL).sum(0)
    s = X + Y + Z
    assert abs(X / s - 0.31272) < 5e-4
    assert abs(Y / s - 0.32903) < 5e-4


def test_equal_energy_white_point():
    X, Y, Z = C.CIE_1931_TBL.sum(0)
    s = X + Y + Z
    assert abs(X / s - 1 / 3) < 1e-3
    assert abs(Y / s - 1 / 3) < 1e-3


def test_ybar_peak_at_555():
    assert C.CIE_1931_TBL[:, 1].max() == 1.0
    assert 360 + 5 * int(C.CIE_1931_TBL[:, 1].argmax()) == 555


def test_device_lookup_matches_host_interp():
    wl = np.linspace(340.0, 850.0, 257)  # includes out-of-range ends
    dev = np.asarray(sp.cie1931_xyz(jnp.asarray(wl, jnp.float32)))
    host = C.interp_table(C.CIE_1931_TBL, wl)
    np.testing.assert_allclose(dev, host, atol=2e-5)
    dev_d65 = np.asarray(sp.d65_approx(jnp.asarray(wl, jnp.float32)))
    host_d65 = C.interp_table(C.D65_TBL, wl) / sp._D65_LUM
    np.testing.assert_allclose(dev_d65, host_d65, atol=2e-5)


def test_d65_luminance_normalized():
    """Illuminant convention (src/spectra/d65.cpp): the device D65 table
    integrates to unit luminance, so radiance (1,1,1) develops to white."""
    lum = float((sp._D65_TBL * C.CIE_1931_TBL[:, 1]).sum()
                / C.CIE_1931_TBL[:, 1].sum())
    assert abs(lum - 1.0) < 1e-5


def test_d65_reflectance_white_maps_to_unit_rgb():
    """A perfect reflector under D65 must integrate to linear sRGB ~(1,1,1)
    through the spectral pipeline's host projection."""
    rgb = sp.spectrum_to_rgb_host(
        np.linspace(sp.WAVELENGTH_MIN, sp.WAVELENGTH_MAX, 95),
        np.ones(95))
    np.testing.assert_allclose(rgb, 1.0, atol=2e-3)


def test_hero_sampling_integrates_ybar():
    """MC integral of ybar with the importance-sampled hero wavelengths
    reproduces the table integral (exercises pdf + table consistency)."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random(200_000), jnp.float32)
    wl, pdf = sp.sample_hero_wavelengths_t(u[None, :])
    wl0 = np.asarray(wl.ch[0][0])
    pdf0 = np.asarray(pdf.ch[0][0])
    y = C.interp_table(C.CIE_1931_TBL[:, 1], wl0)
    est = float(np.mean(y / np.maximum(pdf0, 1e-12)))
    assert abs(est - sp.CIE_Y_INTEGRAL) / sp.CIE_Y_INTEGRAL < 0.01

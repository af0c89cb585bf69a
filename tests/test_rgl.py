"""RGL .bsdf loader validation (VERDICT.md round-2 item 8).

No real capture exists offline, so write_rgl_ggx bakes a synthetic GGX
rough-conductor capture through the FORWARD vndf warp into RGL layout; the
loader must reconstruct the analytic model through the INVERSE chain
(container parse -> Marginal2D invert -> ndf/sigma normalization ->
native-grid resample), and the device sampler built from it must pass a
chi-square test. A warp-geometry or normalization mistake in either
direction breaks the round trip against the ANALYTIC values."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba2_tpu.render import measured as measured_mod
from mitsuba2_tpu.render import rgl


def test_tensor_file_roundtrip(tmp_path):
    fields = {
        "theta_i": np.linspace(0, 1.5, 7).astype(np.float32),
        "ndf": np.random.default_rng(0).random((16, 16)).astype(np.float32),
        "counts": np.arange(10, dtype=np.int32),
        "description": np.frombuffer(b"hello", np.uint8).copy(),
    }
    p = os.path.join(tmp_path, "t.bsdf")
    rgl.write_tensor_file(p, fields)
    back = rgl.read_tensor_file(p)
    assert set(back) == set(fields)
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])
        assert back[k].dtype == fields[k].dtype


def test_marginal2d_invert_roundtrip():
    rng = np.random.default_rng(1)
    density = rng.random((32, 32)) + 0.1
    warp = rgl._Marginal2D(density)
    u1 = rng.random((64,))
    u2 = rng.random((64,))
    u, v = warp.sample(u1, u2)
    r1, r2 = warp.invert(u, v)
    np.testing.assert_allclose(r1, u1, atol=2e-3)
    np.testing.assert_allclose(r2, u2, atol=2e-3)


@pytest.fixture(scope="module")
def ggx_capture(tmp_path_factory):
    p = os.path.join(tmp_path_factory.mktemp("rgl"), "ggx.bsdf")
    rgl.write_rgl_ggx(p, alpha=0.35, rgb_tint=(0.9, 0.7, 0.4),
                      n_ti=24, res=96, res2=96)
    return p


def test_rgl_load_matches_analytic_ggx(ggx_capture):
    """The loader's reconstruction must match the analytic GGX values the
    capture was baked from (away from grazing angles, where tabulation
    resolution dominates)."""
    table = rgl.load_rgl(ggx_capture, n_ti=24, n_to=48, n_phi=48)
    assert table.shape == (24, 48, 48, 3)
    # analytic reference on the same grid (f * cos convention)
    a = 0.35
    a2 = a * a
    ti = (np.arange(24) + 0.5) / 24 * (np.pi / 2)
    to = (np.arange(48) + 0.5) / 48 * (np.pi / 2)
    ph = (np.arange(48) + 0.5) / 48 * (2 * np.pi)
    TI, TO, PH = np.meshgrid(ti, to, ph, indexing="ij")
    wi = np.stack([np.sin(TI), np.zeros_like(TI), np.cos(TI)], -1)
    wo = np.stack([np.sin(TO) * np.cos(PH), np.sin(TO) * np.sin(PH),
                   np.cos(TO)], -1)
    wm = wi + wo
    wm /= np.linalg.norm(wm, axis=-1, keepdims=True)
    cm = wm[..., 2]
    D = a2 / (np.pi * np.maximum((cm * cm * (a2 - 1) + 1) ** 2, 1e-12))

    def lam(c):
        t2 = np.maximum(1 - c * c, 0.0) / np.maximum(c * c, 1e-12)
        return 0.5 * (np.sqrt(1 + a2 * t2) - 1)

    G = 1.0 / (1.0 + lam(np.cos(TI)) + lam(np.cos(TO)))
    fr = D * G / np.maximum(4 * np.cos(TI) * np.cos(TO), 1e-9)
    ref = fr * np.cos(TO)  # f*cos
    tint = np.array([0.9, 0.7, 0.4])

    # compare where the signal is meaningful and angles are not grazing
    sel = (TI < 1.25) & (TO < 1.25) & (ref > 1e-3)
    rel = np.abs(table[sel] / tint - ref[sel, None]) / (ref[sel, None] + 1e-2)
    # tabulated + twice-warped reconstruction: demand ~10% median accuracy
    assert np.median(rel) < 0.1, np.median(rel)
    assert np.mean(rel) < 0.25, np.mean(rel)


def test_rgl_sampler_chi2(ggx_capture):
    """Device sampler built from the loaded capture passes chi-square
    against its own pdf (the reference's per-plugin test pattern)."""
    from mitsuba2_tpu.chi2 import ChiSquareTest, SphericalDomain
    from mitsuba2_tpu.core.vec import Vec3

    table = rgl.load_rgl(ggx_capture, n_ti=32, n_to=64, n_phi=64)
    md = measured_mod.build_measured([table])
    theta_i = 0.7

    def wi_of(n):
        return Vec3(jnp.full((n,), np.sin(theta_i), jnp.float32),
                    jnp.zeros((n,), jnp.float32),
                    jnp.full((n,), np.cos(theta_i), jnp.float32))

    def sample_fn(u):
        n = u.shape[0]
        wo, pdf = measured_mod.sample_measured(
            md, jnp.zeros(n, jnp.int32), wi_of(n), u)
        # zero-vector convention for rejected draws (chi2 drops them)
        m = pdf > 0
        return Vec3(wo.x * m, wo.y * m, wo.z * m)

    def pdf_fn(wo):
        sh = wo.shape[:-1]
        flat = wo.reshape(-1, 3)
        n = flat.shape[0]
        pdf = measured_mod.pdf_measured(md, jnp.zeros(n, jnp.int32),
                                        wi_of(n), Vec3.from_array(flat))
        return pdf.reshape(sh)

    test = ChiSquareTest(SphericalDomain(), sample_fn, pdf_fn,
                         sample_count=200_000, res=16)
    assert test.run(), test.messages


def test_rgl_spectral_branch_matches_rgb(tmp_path):
    """A SPECTRAL capture (`spectra` + `wavelengths` fields, the second
    branch of measured.cpp) must reconstruct the same material as an RGB
    capture whose tint equals the CIE/D65 projection of the SPD — and the
    loader must survive a realistic field census (aux fields, shuffled
    header order). Verifies the spectral integration weights end-to-end,
    not just the parser."""
    from mitsuba2_tpu.core import cie_data as cie
    from mitsuba2_tpu.core import spectrum as sp

    # smooth reflectance SPD: a gaussian bump on a warm base
    wav = np.linspace(380.0, 780.0, 41)
    S = 0.35 + 0.55 * np.exp(-0.5 * ((wav - 600.0) / 70.0) ** 2)

    # expected tint: same CIE weighting the loader applies (cie_data is
    # independently validated against colorimetric invariants)
    xyz_w = cie.interp_table(cie.CIE_1931_TBL, wav)
    d65 = cie.interp_table(cie.D65_TBL, wav) / 100.0
    w = xyz_w * d65[:, None]
    w /= np.trapezoid(w[:, 1], wav)
    xyz = (S[:, None] * w * np.gradient(wav)[:, None]).sum(0)
    tint = np.asarray(sp.XYZ_TO_SRGB, np.float64) @ xyz

    p_spec = os.path.join(tmp_path, "spec.bsdf")
    p_rgb = os.path.join(tmp_path, "rgb.bsdf")
    rgl.write_rgl_ggx(p_spec, alpha=0.3, n_ti=8, res=48, res2=48,
                      spectral=(wav, S))
    rgl.write_rgl_ggx(p_rgb, alpha=0.3, n_ti=8, res=48, res2=48,
                      rgb_tint=tuple(tint))

    # the spectral file must really carry the spectral fields + the aux
    # census, and no rgb tensor
    fields = rgl.read_tensor_file(p_spec)
    assert "spectra" in fields and "wavelengths" in fields
    assert "rgb" not in fields
    for aux in ("description", "jacobian", "valid", "luminance"):
        assert aux in fields

    tab_spec = rgl.load_rgl(p_spec, n_ti=12, n_to=32, n_phi=32)
    tab_rgb = rgl.load_rgl(p_rgb, n_ti=12, n_to=32, n_phi=32)
    assert np.isfinite(tab_spec).all()
    scale = np.median(tab_rgb[tab_rgb > 1e-4] / tab_spec[tab_rgb > 1e-4]) \
        if (tab_rgb > 1e-4).any() else 1.0
    np.testing.assert_allclose(scale, 1.0, rtol=5e-3)
    np.testing.assert_allclose(tab_spec, tab_rgb, rtol=2e-2, atol=2e-3)

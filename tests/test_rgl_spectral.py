"""RGL `.bsdf` SPECTRAL-branch ingestion (VERDICT.md round-2 missing #5).

No real RGL-database capture is obtainable in this offline environment,
so this file retires the byte-level format risk the other way around:

- `_write_powitacq_bytes` is an INDEPENDENT from-spec serializer of the
  powitacq `tensor_file` container (struct-packed field records, 8-byte
  aligned payloads) — written against the format description in
  rgl.py's module docstring, sharing no code with
  `rgl.write_tensor_file`, exactly like tests/test_exr_spec.py does for
  the EXR codec.
- The capture it writes carries the FULL field set of a real database
  entry — `theta_i, phi_i, ndf, sigma, vndf, luminance, spectra,
  wavelengths, jacobian, description, valid` — with `spectra` +
  irregular `wavelengths` instead of `rgb`, i.e. the spectral branch of
  `src/bsdfs/measured.cpp`'s loader that the synthetic GGX fixture
  (write_rgl_ggx) never exercised.
- Equivalence oracle: the spectrum is SEPARABLE (residual(u1,u2) x
  s(lambda)), so CIE-integrating the spectral capture must reproduce
  the rgb capture whose tint is the independently trapezoid-integrated
  (s . CIE x D65) projection. The rgb branch itself is validated
  against analytic GGX in tests/test_rgl.py.
"""
import os
import struct

import numpy as np
import pytest

from mitsuba2_tpu.core import cie_data as cie
from mitsuba2_tpu.core import spectrum as sp
from mitsuba2_tpu.render import rgl

# --- independent from-spec tensor_file serializer ---------------------------

_DTYPE_IDS = {np.dtype(np.uint8): 1, np.dtype(np.int8): 2,
              np.dtype(np.uint16): 3, np.dtype(np.int16): 4,
              np.dtype(np.uint32): 5, np.dtype(np.int32): 6,
              np.dtype(np.uint64): 7, np.dtype(np.int64): 8,
              np.dtype(np.float16): 9, np.dtype(np.float32): 10,
              np.dtype(np.float64): 11}


def _write_powitacq_bytes(path, fields):
    """Serialize {name: array} into a powitacq tensor_file, built here
    byte-by-byte from the format spec (NOT via rgl.write_tensor_file):

        char magic[12] = "tensor_file\\0"; uint8 ver[2] = {1, 0};
        uint32 n_fields;
        per field: uint16 name_len; char name[]; uint16 ndim;
                   uint8 dtype_id; uint64 offset; uint64 shape[ndim];
        payload bytes at each field's recorded offset.

    Payloads are 8-byte aligned (real writers align; the reader must
    honor recorded offsets either way, so this also probes that the
    parser never assumes densely-packed payloads)."""
    items = [(k.encode("ascii"), np.ascontiguousarray(v))
             for k, v in fields.items()]
    head = b"tensor_file\x00" + bytes([1, 0]) + struct.pack("<I", len(items))
    reclen = sum(2 + len(n) + 2 + 1 + 8 + 8 * a.ndim for n, a in items)
    pos = len(head) + reclen
    offs = []
    for _, a in items:
        pos = (pos + 7) & ~7          # 8-byte align each payload
        offs.append(pos)
        pos += a.nbytes
    out = bytearray(head)
    for (name, arr), off in zip(items, offs):
        out += struct.pack("<H", len(name)) + name
        out += struct.pack("<H", arr.ndim)
        out += bytes([_DTYPE_IDS[arr.dtype]])
        out += struct.pack("<Q", off)
        out += struct.pack(f"<{arr.ndim}Q", *arr.shape)
    for (_, arr), off in zip(items, offs):
        out += b"\x00" * (off - len(out))
        out += arr.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


# --- spectral capture fixture ------------------------------------------------

N_TI, RES, RES2 = 12, 48, 48


def _spectral_curve(wav):
    """A smooth reflectance spectrum (gold-ish ramp), s(lambda) in [0,1]."""
    return 0.15 + 0.75 / (1.0 + np.exp(-(wav - 560.0) / 40.0))


@pytest.fixture(scope="module")
def capture_pair(tmp_path_factory):
    """(spectral_path, rgb_path, expected_tint): the same GGX capture
    written through the spectral branch and through the rgb branch with
    the independently integrated tint."""
    d = tmp_path_factory.mktemp("rgl_spec")
    base_p = os.path.join(d, "base.bsdf")
    # unit-tint bake -> channel 0 IS the scalar residual tensor
    rgl.write_rgl_ggx(base_p, alpha=0.3, rgb_tint=(1.0, 1.0, 1.0),
                      n_ti=N_TI, res=RES, res2=RES2)
    base = rgl.read_tensor_file(base_p)
    resid = base["rgb"][:, :, 0]                       # (n_ti, 1, r2, r2)

    # irregularly spaced wavelengths (real spectrometer grids are), and
    # a separable spectrum: spectra[..., w, :, :] = resid * s(w)
    wav = np.array([400., 435., 465., 500., 530., 565., 600., 640.,
                    675., 705., 730.], np.float32)
    s = _spectral_curve(wav.astype(np.float64))
    spectra = (resid[:, :, None] * s[None, None, :, None, None])

    # expected rgb tint: independent trapezoid integration of
    # s . (CIE_xyz x D65), Y-normalized, through XYZ->sRGB — mirrors the
    # powitacq->rgb projection contract, implemented separately here
    xyz_w = cie.interp_table(cie.CIE_1931_TBL, wav)
    d65 = cie.interp_table(cie.D65_TBL, wav) / 100.0
    w = xyz_w * d65[:, None]
    w = w / np.trapezoid(w[:, 1], wav)
    xyz = np.stack([np.trapezoid(s * w[:, c], wav) for c in range(3)])
    tint = np.asarray(sp.XYZ_TO_SRGB, np.float64) @ xyz

    spec_p = os.path.join(d, "spectral.bsdf")
    _write_powitacq_bytes(spec_p, {
        "description": np.frombuffer(b"synthetic spectral ggx",
                                     np.uint8).copy(),
        "theta_i": base["theta_i"],
        "phi_i": np.zeros(1, np.float32),
        "ndf": base["ndf"],
        "sigma": base["sigma"],
        "vndf": base["vndf"],
        "luminance": resid.astype(np.float32),
        "spectra": spectra.astype(np.float32),
        "wavelengths": wav,
        "jacobian": np.ones(1, np.uint8),
        "valid": np.ones((RES, RES), np.uint8),
    })

    rgb_p = os.path.join(d, "rgb.bsdf")
    rgl.write_rgl_ggx(rgb_p, alpha=0.3, rgb_tint=tuple(tint),
                      n_ti=N_TI, res=RES, res2=RES2)
    return spec_p, rgb_p, tint


def test_spectral_container_parses_with_full_field_set(capture_pair):
    spec_p, _, _ = capture_pair
    fields = rgl.read_tensor_file(spec_p)
    assert {"theta_i", "phi_i", "ndf", "sigma", "vndf", "luminance",
            "spectra", "wavelengths", "jacobian", "description",
            "valid"} <= set(fields)
    assert "rgb" not in fields
    assert fields["spectra"].shape == (N_TI, 1, 11, RES2, RES2)
    assert fields["description"].tobytes() == b"synthetic spectral ggx"
    # aligned payloads must round-trip exactly
    np.testing.assert_array_equal(fields["wavelengths"].ravel()[:2],
                                  np.float32([400., 435.]))


def test_spectral_branch_matches_rgb_branch(capture_pair):
    """CIE-integrating the spectral capture == the rgb capture baked with
    the independently integrated tint (same geometry tensors)."""
    spec_p, rgb_p, _ = capture_pair
    t_spec = rgl.load_rgl(spec_p, n_ti=10, n_to=24, n_phi=24)
    t_rgb = rgl.load_rgl(rgb_p, n_ti=10, n_to=24, n_phi=24)
    assert np.isfinite(t_spec).all() and (t_spec >= 0).all()
    # identical warp/ndf/sigma chain; only the spectral->rgb projection
    # differs (gradient-sum in the loader vs trapezoid here: same rule on
    # interior points, half-weight ends -> percent-level agreement)
    denom = np.maximum(t_rgb, 1e-4)
    rel = np.abs(t_spec - t_rgb) / denom
    assert np.quantile(rel[t_rgb > 1e-3], 0.99) < 0.02


def test_measured_bsdf_consumes_spectral_capture(capture_pair):
    """End-to-end: the `measured` device path evaluates a spectral
    capture loaded through the filename branch, finite non-negative."""
    import jax.numpy as jnp

    from mitsuba2_tpu.render import measured as ms

    spec_p, rgb_p, _ = capture_pair
    t_spec = rgl.load_rgl(spec_p, n_ti=12, n_to=32, n_phi=32)
    t_rgb = rgl.load_rgl(rgb_p, n_ti=12, n_to=32, n_phi=32)
    md = ms.build_measured([t_spec, t_rgb])
    rng = np.random.default_rng(3)
    n = 256
    wi = rng.normal(size=(n, 3)); wi[:, 2] = np.abs(wi[:, 2]) + 0.2
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = rng.normal(size=(n, 3)); wo[:, 2] = np.abs(wo[:, 2]) + 0.2
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi, wo = jnp.asarray(wi, jnp.float32), jnp.asarray(wo, jnp.float32)
    v_s = np.asarray(ms.eval_measured(
        md, jnp.zeros(n, jnp.int32), wi, wo).to_array())
    v_r = np.asarray(ms.eval_measured(
        md, jnp.ones(n, jnp.int32), wi, wo).to_array())
    assert np.isfinite(v_s).all() and (v_s >= 0).all() and v_s.max() > 0
    # device-side equivalence of the two branches, same tolerance class
    sel = v_r > 1e-3
    rel = np.abs(v_s - v_r)[sel] / v_r[sel]
    assert np.quantile(rel, 0.99) < 0.03

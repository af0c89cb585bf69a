"""Spectrum slots: uniform color storage across mono/RGB/spectral modes.

TPU-native rebuild of mitsuba2's spectra plugins (src/spectra/{uniform,
srgb,d65,blackbody}.cpp). The reference compiles a different Texture class
per variant; here every color parameter is stored as ONE fixed-width
"spectrum slot" so the same scene pytree serves all color modes:

    slot = [r, g, b, c2, c1, c0, scale, kind]

- rgb: linear-sRGB value (reflectance in [0,1] or radiance * any scale)
- c2,c1,c0: sigmoid-polynomial upsampling coefficients (Jakob-Hanika fit of
  rgb/scale), used in spectral mode
- scale: brightness factor the fit normalized away
- kind: SLOT_REFLECTANCE | SLOT_ILLUMINANT (illuminants multiply d65)

Slots are packed on the host at scene build (fit once per color) and
evaluated on device at hero wavelengths.

Textured slots (src/textures/bitmap.cpp): `kind = 2 + 2*tex_id + illum_bit`
marks the slot as spatially varying; evaluation gathers linear RGB from the
scene's texture atlas at `uv` (texture.py) and — in spectral mode —
upsamples per lane through the fitted coefficient lattice.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import spectrum as sp

SLOT_W = 8
SLOT_REFLECTANCE = 0.0
SLOT_ILLUMINANT = 1.0
SLOT_TEX_BASE = 2.0  # kind >= 2: textured; kind = 2 + 2*tex_id + illum


def pack_spectrum_slot(rgb, illuminant: bool = False) -> np.ndarray:
    """Host: fit upsampling coefficients and pack a slot (8 floats)."""
    rgb = np.asarray(rgb, np.float64).reshape(3)
    coeffs, scale = sp.fit_srgb_model(rgb)
    return np.array([rgb[0], rgb[1], rgb[2], coeffs[0], coeffs[1], coeffs[2],
                     scale, SLOT_ILLUMINANT if illuminant else SLOT_REFLECTANCE],
                    np.float32)


def pack_texture_slot(tex_id: int, illuminant: bool = False,
                      mean_rgb=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Host: pack a slot referencing texture `tex_id`. The constant part
    stores the texture's mean RGB (used by importance heuristics)."""
    m = np.asarray(mean_rgb, np.float32).reshape(3)
    kind = SLOT_TEX_BASE + 2 * tex_id + (1 if illuminant else 0)
    return np.array([m[0], m[1], m[2], 0, 0, 0, 1.0, kind], np.float32)


# --- host build staging for textures (set up by scene.build_scene) ----------
_TEX_STAGING = None


def begin_texture_staging() -> list:
    global _TEX_STAGING
    _TEX_STAGING = []
    return _TEX_STAGING


def end_texture_staging() -> list:
    global _TEX_STAGING
    staged, _TEX_STAGING = _TEX_STAGING, None
    return staged


def pack_color(value, illuminant: bool = False) -> np.ndarray:
    """Host: pack any color property — scalar, RGB triple, or a texture
    descriptor dict ({"type": "bitmap"|"checkerboard", ...}) — into a slot.
    Texture descriptors require an active build (scene.build_scene)."""
    if isinstance(value, dict):
        t = value.get("type")
        if t in ("bitmap", "checkerboard"):
            if _TEX_STAGING is None:
                raise RuntimeError(
                    "textured color outside scene build (no staging active)")
            from . import texture as texture_mod
            tb = texture_mod.build_texture(value, name=value.get("id", ""))
            tid = len(_TEX_STAGING)
            _TEX_STAGING.append(tb)
            mean = tb.data.reshape(-1, 3).mean(0)
            return pack_texture_slot(tid, illuminant, mean)
        # spectrum plugin dicts: {"type": "uniform"|"d65"|"srgb", "value": v}
        if t in ("uniform", "d65", "srgb", "rgb"):
            v = value.get("value", 1.0)
            return pack_color(v, illuminant or t == "d65")
        raise ValueError(f"unknown spectrum/texture type {t!r}")
    v = value
    if isinstance(v, (int, float)):
        v = [v, v, v]
    return pack_spectrum_slot(v, illuminant=illuminant)


def _const_value(slot, wavelengths, color_mode):
    rgb = slot[..., 0:3]
    if color_mode == "rgb":
        return rgb
    if color_mode == "mono":
        return sp.luminance_rgb(rgb)[..., None]
    # spectral: sigmoid polynomial x scale (x d65 for illuminants)
    coeffs = slot[..., 3:6]
    refl = sp.srgb_model_eval(coeffs[..., None, :], wavelengths)  # (..., C)
    return refl * slot[..., 6:7]


def _tex_value(rgb, wavelengths, color_mode):
    """Per-lane RGB -> slot value in the active color mode. Spectral mode
    upsamples through the coefficient lattice; RGB > 1 (emissive textures)
    is folded into a scale factor like rgb2spec does."""
    if color_mode == "rgb":
        return rgb
    if color_mode == "mono":
        return sp.luminance_rgb(rgb)[..., None]
    scale = jnp.maximum(jnp.max(rgb, axis=-1, keepdims=True) / 0.999, 1.0)
    lattice = sp.srgb_model_fetch_lattice()
    coeffs = sp.srgb_model_fetch_interp(lattice, rgb / scale)
    refl = sp.srgb_model_eval(coeffs[..., None, :], wavelengths)
    return refl * scale


def eval_spectrum_slot(slot, wavelengths, color_mode: str, tex=None, uv=None):
    """Device: evaluate a batch of slots.

    slot: (..., 8); wavelengths: (..., C) (ignored outside spectral mode);
    tex: optional TextureAtlas; uv: (..., 2) surface uv (needed iff any slot
    may be textured). Returns (..., C_out): 1 (mono), 3 (rgb), 4 (spectral).
    """
    kind = slot[..., 7]
    is_illum = (kind == SLOT_ILLUMINANT)[..., None]
    val = _const_value(slot, wavelengths, color_mode)

    if tex is not None and uv is not None:
        from . import texture as texture_mod
        kind_i = kind.astype(jnp.int32)
        is_tex = kind_i >= 2
        tid = jnp.maximum((kind_i - 2) // 2, 0)
        rgb_t = texture_mod.eval_rgb(tex, tid, uv)
        val_t = _tex_value(rgb_t, wavelengths, color_mode)
        val = jnp.where(is_tex[..., None], val_t, val)
        is_illum = is_illum | (is_tex & ((kind_i - 2) % 2 == 1))[..., None]

    if color_mode == "spectral":
        return jnp.where(is_illum, val * sp.d65_approx(wavelengths), val)
    return val

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
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import spectrum as sp

SLOT_W = 8
SLOT_REFLECTANCE = 0.0
SLOT_ILLUMINANT = 1.0


def pack_spectrum_slot(rgb, illuminant: bool = False) -> np.ndarray:
    """Host: fit upsampling coefficients and pack a slot (8 floats)."""
    rgb = np.asarray(rgb, np.float64).reshape(3)
    coeffs, scale = sp.fit_srgb_model(rgb)
    return np.array([rgb[0], rgb[1], rgb[2], coeffs[0], coeffs[1], coeffs[2],
                     scale, SLOT_ILLUMINANT if illuminant else SLOT_REFLECTANCE],
                    np.float32)


def eval_spectrum_slot(slot, wavelengths, color_mode: str):
    """Device: evaluate a batch of slots.

    slot: (..., 8); wavelengths: (..., C) (ignored outside spectral mode).
    Returns (..., C_out) where C_out = 1 (mono), 3 (rgb), 4 (spectral).
    """
    rgb = slot[..., 0:3]
    if color_mode == "rgb":
        return rgb
    if color_mode == "mono":
        return sp.luminance_rgb(rgb)[..., None]
    # spectral: sigmoid polynomial x scale (x d65 for illuminants)
    coeffs = slot[..., 3:6]
    refl = sp.srgb_model_eval(coeffs[..., None, :], wavelengths)  # (..., C)
    val = refl * slot[..., 6:7]
    is_illum = slot[..., 7:8] == SLOT_ILLUMINANT
    return jnp.where(is_illum, val * sp.d65_approx(wavelengths), val)

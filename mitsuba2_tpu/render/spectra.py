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
from flax import struct

from ..core import spectrum as sp
from ..core.spec import Spec, swhere

SLOT_W = 8
SLOT_REFLECTANCE = 0.0
SLOT_ILLUMINANT = 1.0
SLOT_TEX_BASE = 2.0  # kind >= 2: textured; kind = 2 + 2*tex_id + illum


@struct.dataclass
class LaneRows:
    """Lazy per-lane rows of a packed (M, W) host table.

    Materializing `table[idx]` as an (N, W) array lane-pads W -> 128 on TPU
    (core/vec.py layout note); this view instead gathers single columns on
    demand — each a dense (N,) gather from the tiny table."""
    table: jnp.ndarray  # (M, W)
    idx: jnp.ndarray    # (N,) int32 per-lane row (or scalar)
    base: int = struct.field(pytree_node=False, default=0)

    def col(self, i: int):
        from ..kernels import gather as gth
        return gth.scalar(self.table[:, self.base + i], self.idx)

    def slot(self, k: int) -> "LaneRows":
        """View of spectrum slot k (slots are SLOT_W wide)."""
        return LaneRows(self.table, self.idx, self.base + k * SLOT_W)

    @staticmethod
    def broadcast(row, n: int) -> "LaneRows":
        """One (W,) row viewed by n lanes (tests / single-material paths)."""
        row = jnp.asarray(row)
        return LaneRows(row[None, :], jnp.zeros(n, jnp.int32))


def _colfn(slot):
    """Adapter: LaneRows or (..., W) array -> column accessor."""
    if hasattr(slot, "col"):
        return slot.col
    return lambda i: slot[..., i]


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


def tabulated_wls_vals(value: dict):
    """Host: regular/irregular spectrum dict -> (wavelengths, values)
    float64 arrays (shared by pack_color and the medium packer)."""
    if value.get("type") == "regular":
        vals = np.asarray(value["values"], np.float64)
        lo = float(value.get("lambda_min", sp.WAVELENGTH_MIN))
        hi = float(value.get("lambda_max", sp.WAVELENGTH_MAX))
        wls = np.linspace(lo, hi, len(vals))
    else:
        wls = np.asarray(value["wavelengths"], np.float64)
        vals = np.asarray(value["values"], np.float64)
    return wls, vals


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
        if t in ("regular", "irregular"):
            # tabulated spectra (src/spectra/{regular,irregular}.cpp):
            # exact CIE->sRGB projection for the rgb channels + a direct
            # sigmoid-polynomial fit for spectral-mode evaluation
            wls, vals = tabulated_wls_vals(value)
            rgb = np.clip(sp.spectrum_to_rgb_host(wls, vals), 0.0, None)
            coeffs, scale = sp.fit_srgb_model_to_spectrum(wls, vals)
            # kind is ALWAYS "reflectance" here: the tabulated data fully
            # specifies the spectrum (an extra D65 factor would be wrong
            # even for emission slots)
            return np.array([rgb[0], rgb[1], rgb[2],
                             coeffs[0], coeffs[1], coeffs[2], scale,
                             SLOT_REFLECTANCE], np.float32)
        if t == "blackbody":
            # src/spectra/blackbody.cpp: Planck radiator at `temperature`,
            # tabulated then handled like any spectrum
            wls = np.linspace(sp.WAVELENGTH_MIN, sp.WAVELENGTH_MAX, 64)
            temp = float(value.get("temperature", 6500.0))
            vals = np.asarray(sp.blackbody_radiance(wls, temp))
            vals = vals * float(value.get("scale", 1.0))
            return pack_color({"type": "irregular", "wavelengths": wls,
                               "values": vals}, illuminant=True)
        raise ValueError(f"unknown spectrum/texture type {t!r}")
    v = value
    if isinstance(v, (int, float)):
        v = [v, v, v]
    return pack_spectrum_slot(v, illuminant=illuminant)


def _const_value(col, wavelengths, color_mode) -> Spec:
    r, g, b = col(0), col(1), col(2)
    if color_mode == "rgb":
        return Spec((r, g, b))
    if color_mode == "mono":
        return Spec((sp.luminance_t(r, g, b),))
    # spectral: sigmoid polynomial x scale (x d65 for illuminants)
    c2, c1, c0 = col(3), col(4), col(5)
    scale = col(6)
    return Spec(tuple(sp.srgb_model_eval_t(c2, c1, c0, w) * scale
                      for w in wavelengths.ch))


def _tex_value(rgb: Spec, wavelengths, color_mode) -> Spec:
    """Per-lane RGB Spec3 -> slot value in the active color mode. Spectral
    mode upsamples through the coefficient lattice; RGB > 1 (emissive
    textures) is folded into a scale factor like rgb2spec does.

    DESIGN NOTE (round 4): the lattice path costs ~24 per-lane gathers +
    a z-node select chain per call. For the ENVMAP that traffic is
    removed by baking per-texel coefficients at build
    (render/emitters.py EnvMapData.coeffs, Veach spectral 2.69 -> 5.72
    Mrays/s). Textured BSDF inputs intentionally STAY on this path:
    texture data is an optimizable parameter (BASELINE config 4) and the
    lattice interp is the differentiable route for
    d(spectrum)/d(texel rgb) — a host-baked table would freeze texture
    gradients in spectral mode."""
    if color_mode == "rgb":
        return rgb
    if color_mode == "mono":
        return Spec((sp.luminance_t(*rgb.ch),))
    scale = jnp.maximum(rgb.hmax() / 0.999, 1.0)
    lattice = sp.srgb_model_fetch_lattice()
    inv = 1.0 / scale
    c2, c1, c0 = sp.srgb_model_fetch_interp_t(
        lattice, rgb.ch[0] * inv, rgb.ch[1] * inv, rgb.ch[2] * inv)
    return Spec(tuple(sp.srgb_model_eval_t(c2, c1, c0, w) * scale
                      for w in wavelengths.ch))


def eval_spectrum_slot(slot, wavelengths, color_mode: str, tex=None, uv=None,
                       duv=None) -> Spec:
    """Device: evaluate a batch of spectrum slots -> planar Spec.

    slot: LaneRows view or (..., 8) array; wavelengths: Spec4 (ignored
    outside spectral mode); tex: optional TextureAtlas; uv: planar Vec2
    surface uv (needed iff any slot may be textured); duv: optional
    (duv_dx, duv_dy) screen-space footprint for mip-filtered lookups.
    Channel count of the result: 1 (mono), 3 (rgb), 4 (spectral).
    """
    col = _colfn(slot)
    kind = col(7)
    is_illum = kind == SLOT_ILLUMINANT
    val = _const_value(col, wavelengths, color_mode)

    if tex is not None and uv is not None:
        from . import texture as texture_mod
        kind_i = kind.astype(jnp.int32)
        is_tex = kind_i >= 2
        tid = jnp.maximum((kind_i - 2) // 2, 0)
        rgb_t = texture_mod.eval_rgb(tex, tid, uv, duv=duv)
        val_t = _tex_value(rgb_t, wavelengths, color_mode)
        val = swhere(is_tex, val_t, val)
        is_illum = is_illum | (is_tex & ((kind_i - 2) % 2 == 1))

    if color_mode == "spectral":
        d65 = Spec(tuple(sp.d65_approx(w) for w in wavelengths.ch))
        return swhere(is_illum, val * d65, val)
    return val

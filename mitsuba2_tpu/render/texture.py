"""Textures: spatially-varying spectrum slots (bitmap + checkerboard).

TPU-native rebuild of mitsuba2's texture plugins
(src/textures/{bitmap,checkerboard}.cpp, src/librender/texture.cpp). The
reference wraps each bitmap in a Texture object evaluated through virtual
dispatch; here every texture in the scene lives in ONE padded device atlas
`(T, TH, TW, 3)` and a spectrum slot whose `kind` field encodes a texture id
triggers a bilinear gather at `si.uv` instead of a constant read
(spectra.py). This keeps material rows fixed-width and the gather batched —
the whole wavefront's texture fetches become one XLA gather.

Gradients flow to texels through the bilinear weights (the key path for
differentiable texture optimization — mitsuba's bitmap.eval ->
scatter_add adjoint, SURVEY.md §3.3).

- `checkerboard` is a 2x2 nearest-filtered texture with a repeat wrap —
  bit-identical to the reference's procedural checker over [0,1]^2.
- In spectral mode texel RGB is upsampled on the fly via the fitted
  coefficient lattice (spectrum.srgb_model_fetch_interp), mirroring
  bitmap.cpp's per-texel srgb_model_fetch at load time.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2
FILTER_BILINEAR = 0
FILTER_NEAREST = 1

_WRAP_NAME = {"repeat": WRAP_REPEAT, "clamp": WRAP_CLAMP, "mirror": WRAP_MIRROR}
_FILTER_NAME = {"bilinear": FILTER_BILINEAR, "nearest": FILTER_NEAREST}


@struct.dataclass
class TextureAtlas:
    """All scene textures in one padded atlas."""
    data: jnp.ndarray  # (T, TH, TW, 3) f32 linear RGB
    info: jnp.ndarray  # (T, 4) f32: [height, width, wrap, filter]
    uvt: jnp.ndarray   # (T, 6) f32 affine uv transform [a,b,tx, c,d,ty]


class TextureBuild:
    """Host-side staging of one texture before atlas packing."""

    def __init__(self, data: np.ndarray, wrap: int, filter_: int,
                 uvt: np.ndarray, name: str = ""):
        self.data = np.asarray(data, np.float32)
        self.wrap = wrap
        self.filter = filter_
        self.uvt = np.asarray(uvt, np.float32)
        self.name = name


def _uv_transform(desc: dict) -> np.ndarray:
    """`to_uv` descriptor -> packed affine row. Accepts a 3x3/4x4 matrix or
    {"scale": (su, sv), "translate": (tu, tv)} (xml.cpp's uv transforms)."""
    t = desc.get("to_uv")
    if t is None:
        return np.array([1, 0, 0, 0, 1, 0], np.float32)
    t = np.asarray(t, np.float32)
    if t.ndim == 2:  # matrix form
        return np.array([t[0, 0], t[0, 1], t[0, -1],
                         t[1, 0], t[1, 1], t[1, -1]], np.float32)
    raise ValueError("to_uv must be a 3x3/4x4 matrix")


def build_texture(desc: dict, name: str = "") -> TextureBuild:
    """Texture descriptor dict -> staged host texture.

    bitmap: {"type": "bitmap", "data": (H,W,3|1) array | "filename": path,
             "wrap_mode", "filter_type", "raw": bool, "to_uv"}
    checkerboard: {"type": "checkerboard", "color0", "color1", "to_uv"}
    """
    t = desc.get("type")
    if t == "checkerboard":
        c0 = np.asarray(desc.get("color0", [0.4] * 3), np.float32).reshape(-1)
        c1 = np.asarray(desc.get("color1", [0.2] * 3), np.float32).reshape(-1)
        if c0.size == 1:
            c0 = np.repeat(c0, 3)
        if c1.size == 1:
            c1 = np.repeat(c1, 3)
        # [0,1]^2 quadrant layout of checkerboard.cpp: color0 where the
        # uv-cell parities match, color1 elsewhere; row 0 = v in [0,.5)
        data = np.array([[c0, c1], [c1, c0]], np.float32)
        return TextureBuild(data, WRAP_REPEAT, FILTER_NEAREST,
                            _uv_transform(desc), name)
    if t == "bitmap":
        if "data" in desc:
            data = np.asarray(desc["data"], np.float32)
        else:
            from ..core import io_bitmap
            data = io_bitmap.read(desc["filename"])
            if not desc.get("raw", False):
                data = io_bitmap.srgb_to_linear(data)
        if data.ndim == 2:
            data = data[..., None]
        if data.shape[-1] == 1:
            data = np.repeat(data, 3, axis=-1)
        if data.shape[-1] == 4:
            data = data[..., :3]
        wrap = _WRAP_NAME[desc.get("wrap_mode", "repeat")]
        filt = _FILTER_NAME[desc.get("filter_type", "bilinear")]
        return TextureBuild(data, wrap, filt, _uv_transform(desc), name)
    raise ValueError(f"unknown texture type {t!r}")


def pack_atlas(textures: List[TextureBuild]) -> Optional[TextureAtlas]:
    """Pad all staged textures to a common (TH, TW) and stack the atlas."""
    if not textures:
        return None
    TH = max(t.data.shape[0] for t in textures)
    TW = max(t.data.shape[1] for t in textures)
    data = np.zeros((len(textures), TH, TW, 3), np.float32)
    info = np.zeros((len(textures), 4), np.float32)
    uvt = np.zeros((len(textures), 6), np.float32)
    for i, t in enumerate(textures):
        h, w = t.data.shape[:2]
        data[i, :h, :w] = t.data
        info[i] = [h, w, t.wrap, t.filter]
        uvt[i] = t.uvt
    return TextureAtlas(data=jnp.asarray(data), info=jnp.asarray(info),
                        uvt=jnp.asarray(uvt))


# ---------------------------------------------------------------------------
# Device evaluation
# ---------------------------------------------------------------------------

def _wrap_coord(i, n, wrap):
    """Integer texel index wrap. i: (...,) i32; n: (...,) i32 size."""
    n = jnp.maximum(n, 1)
    rep = jnp.remainder(i, n)
    clp = jnp.clip(i, 0, n - 1)
    # mirror with period 2n: fold [n, 2n) back to [n-1, 0]
    m = jnp.remainder(i, 2 * n)
    mir = jnp.where(m >= n, 2 * n - 1 - m, m)
    return jnp.where(wrap == WRAP_REPEAT, rep,
                     jnp.where(wrap == WRAP_CLAMP, clp, mir))


def eval_rgb(atlas: TextureAtlas, tid, uv):
    """Batched texture lookup: (N,) texture ids + planar Vec2 uv -> Spec RGB.

    Mirrors bitmap.cpp's eval: uv transform, wrap, bilinear/nearest. v runs
    top-down (row 0 = v just above 0), matching the reference's image
    orientation convention. Fully planar: per-channel (N,) gathers keep the
    TPU lanes dense (core/vec.py layout note).
    """
    from ..core.spec import Spec
    from ..core.vec import as_vec2
    from ..kernels import gather as gth
    uv = as_vec2(uv)
    T, TH, TW, _ = atlas.data.shape
    tid = jnp.clip(tid, 0, T - 1)
    # per-texture metadata: tiny tables -> select-chains (kernels/gather.py)
    h = gth.scalar(atlas.info[:, 0], tid).astype(jnp.int32)
    w = gth.scalar(atlas.info[:, 1], tid).astype(jnp.int32)
    wrap = gth.scalar(atlas.info[:, 2], tid).astype(jnp.int32)
    filt = gth.scalar(atlas.info[:, 3], tid).astype(jnp.int32)
    uvt = [gth.scalar(atlas.uvt[:, i], tid) for i in range(6)]
    u = uvt[0] * uv.x + uvt[1] * uv.y + uvt[2]
    v = uvt[3] * uv.x + uvt[4] * uv.y + uvt[5]

    flat = atlas.data.reshape(T * TH * TW, 3)

    def fetch(yi, xi):
        # ROW gather (fast vectorized path) + slices; a per-column
        # flat[idx, c] gather lowers to the scalar core (kernels/gather.py)
        yi = _wrap_coord(yi, h, wrap)
        xi = _wrap_coord(xi, w, wrap)
        r = flat[(tid * TH + yi) * TW + xi]
        return r[..., 0], r[..., 1], r[..., 2]

    # nearest
    xn = jnp.floor(u * w).astype(jnp.int32)
    yn = jnp.floor(v * h).astype(jnp.int32)
    near = fetch(yn, xn)

    # bilinear (texel centers at (i + 0.5) / n)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    c00 = fetch(y0, x0)
    c01 = fetch(y0, x0 + 1)
    c10 = fetch(y0 + 1, x0)
    c11 = fetch(y0 + 1, x0 + 1)
    is_near = filt == FILTER_NEAREST
    out = []
    for c in range(3):
        bil = ((c00[c] * (1 - fx) + c01[c] * fx) * (1 - fy) +
               (c10[c] * (1 - fx) + c11[c] * fx) * fy)
        out.append(jnp.where(is_near, near[c], bil))
    return Spec(tuple(out))

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
    # Mip pyramid for ray-differential texture filtering: all levels >= 1
    # flattened into one (S, 3) array (level k texel (t, y, x) lives at
    # level_offsets[k-1] + (t*TH_k + y)*TW_k + x). Built ON DEVICE from
    # `data` by build_mips, so texture gradients flow through every level
    # (diff/adjoint.with_tables rebuilds it after each update). None when
    # built without differentials support (legacy snapshots).
    mips: jnp.ndarray = None
    level_offsets: tuple = struct.field(pytree_node=False, default=())
    level_shapes: tuple = struct.field(pytree_node=False, default=())
    # static: does ANY material carry a roughness texture (bsdf.py
    # ALPHA_SLOT)? Lets the rough-BSDF hot path skip the per-lane alpha
    # texture fetch entirely when no material needs it.
    any_alpha_tex: bool = struct.field(pytree_node=False, default=False)


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


def mip_level_geometry(TH: int, TW: int):
    """Static pyramid geometry for a (TH, TW) atlas: shapes of levels >= 1
    and their offsets into the flat mip array (per texture-count unit)."""
    shapes = []
    h, w = TH, TW
    while h > 1 or w > 1:
        h, w = max((h + 1) // 2, 1), max((w + 1) // 2, 1)
        shapes.append((h, w))
    offsets = []
    acc = 0
    for (h, w) in shapes:
        offsets.append(acc)
        acc += h * w
    return tuple(shapes), tuple(offsets), acc


def build_mips(data: jnp.ndarray, info: jnp.ndarray) -> jnp.ndarray:
    """(T, TH, TW, 3) atlas -> flat (S, 3) pyramid of levels >= 1.

    Pure jnp (differentiable): 2x2 average pooling weighted by a validity
    mask so the zero padding beyond each texture's (h, w) content never
    bleeds into averages. Rebuilt by diff/adjoint.with_tables after every
    texture update, so gradients flow through all mip levels."""
    T, TH, TW, _ = data.shape
    shapes, offsets, _ = mip_level_geometry(TH, TW)
    ys = jnp.arange(TH)[None, :, None]
    xs = jnp.arange(TW)[None, None, :]
    mask = ((ys < info[:, 0, None, None]) &
            (xs < info[:, 1, None, None])).astype(jnp.float32)

    def pool(x, h, w):
        # pad to even, 2x2 mean via reshape (sum; normalization by mask)
        ph, pw = h % 2, w % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)) + ((0, 0),) * (x.ndim - 3))
        nh, nw = (h + ph) // 2, (w + pw) // 2
        if x.ndim == 4:
            x = x.reshape(T, nh, 2, nw, 2, x.shape[-1]).sum((2, 4))
        else:
            x = x.reshape(T, nh, 2, nw, 2).sum((2, 4))
        return x, nh, nw

    levels = []
    cur = data * mask[..., None]
    cm = mask
    h, w = TH, TW
    for (lh, lw) in shapes:
        cur, nh, nw = pool(cur, h, w)
        cm, _, _ = pool(cm, h, w)
        h, w = nh, nw
        assert (h, w) == (lh, lw), ((h, w), (lh, lw))
        avg = cur / jnp.maximum(cm, 1e-8)[..., None]
        levels.append((avg * (cm[..., None] > 0)).reshape(T * lh * lw, 3))
        # carry sums (not averages) downward so deeper levels stay exact
    return jnp.concatenate(levels, axis=0)


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
    shapes, offsets, _ = mip_level_geometry(TH, TW)
    data_j = jnp.asarray(data)
    info_j = jnp.asarray(info)
    return TextureAtlas(data=data_j, info=info_j, uvt=jnp.asarray(uvt),
                        mips=build_mips(data_j, info_j),
                        level_offsets=offsets, level_shapes=shapes)


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


def eval_rgb(atlas: TextureAtlas, tid, uv, duv=None):
    """Batched texture lookup: (N,) texture ids + planar Vec2 uv -> Spec RGB.

    Mirrors bitmap.cpp's eval: uv transform, wrap, bilinear/nearest. v runs
    top-down (row 0 = v just above 0), matching the reference's image
    orientation convention. Fully planar: per-channel (N,) gathers keep the
    TPU lanes dense (core/vec.py layout note).

    `duv`: optional (duv_dx, duv_dy) planar Vec2 pair from ray
    differentials (si.duv_dx/duv_dy). When present and the atlas carries a
    mip pyramid, lookups are trilinearly filtered over the screen-space
    footprint — the texture-LOD machinery the reference derives from
    Sensor::sample_ray_differential (sensors/perspective.cpp).
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

    def bilinear(fetch, hh, ww):
        """Bilinear sample at (u, v) from a level with content (hh, ww)."""
        x = u * ww - 0.5
        y = v * hh - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        c00 = fetch(y0, x0, hh, ww)
        c01 = fetch(y0, x0 + 1, hh, ww)
        c10 = fetch(y0 + 1, x0, hh, ww)
        c11 = fetch(y0 + 1, x0 + 1, hh, ww)
        return tuple(
            (c00[c] * (1 - fx) + c01[c] * fx) * (1 - fy) +
            (c10[c] * (1 - fx) + c11[c] * fx) * fy
            for c in range(3))

    def fetch0(yi, xi, hh, ww):
        # ROW gather (fast vectorized path) + slices; a per-column
        # flat[idx, c] gather lowers to the scalar core (kernels/gather.py)
        yi = _wrap_coord(yi, hh, wrap)
        xi = _wrap_coord(xi, ww, wrap)
        r = flat[(tid * TH + yi) * TW + xi]
        return r[..., 0], r[..., 1], r[..., 2]

    # nearest + base bilinear (level 0); nearest applies at level 0 only —
    # once the footprint spans multiple texels, filtering overrides it
    # (matters for `checkerboard`, a 2x2 nearest texture)
    is_near = filt == FILTER_NEAREST
    xn = jnp.floor(u * w).astype(jnp.int32)
    yn = jnp.floor(v * h).astype(jnp.int32)
    near = fetch0(yn, xn, h, w)
    bil0 = bilinear(fetch0, h, w)
    base = tuple(jnp.where(is_near, near[c], bil0[c]) for c in range(3))

    use_mips = (duv is not None and atlas.mips is not None
                and len(atlas.level_shapes) > 0)
    if use_mips:
        duv_dx, duv_dy = duv
        # footprint in texel units, through the linear part of the uv
        # transform (level-0 content resolution)
        hf = h.astype(jnp.float32)
        wf = w.astype(jnp.float32)

        def texel_len(dv):
            du_ = uvt[0] * dv.x + uvt[1] * dv.y
            dv_ = uvt[3] * dv.x + uvt[4] * dv.y
            return jnp.sqrt((du_ * wf) ** 2 + (dv_ * hf) ** 2)

        rho = jnp.maximum(jnp.maximum(texel_len(duv_dx), texel_len(duv_dy)),
                          1e-8)
        n_levels = len(atlas.level_shapes)  # levels >= 1
        lod = jnp.clip(jnp.log2(rho), 0.0, float(n_levels))
        l0 = jnp.floor(lod).astype(jnp.int32)      # 0 = base level
        lfrac = lod - l0

        mflat = atlas.mips
        offs = jnp.asarray(atlas.level_offsets, jnp.int32)
        lth = jnp.asarray([s[0] for s in atlas.level_shapes], jnp.int32)
        ltw = jnp.asarray([s[1] for s in atlas.level_shapes], jnp.int32)

        def sample_level(lvl):
            """Bilinear at mip level lvl (lvl >= 1; per-lane)."""
            li = jnp.clip(lvl - 1, 0, n_levels - 1)
            off = gth.scalar(offs, li)
            th_l = gth.scalar(lth, li)
            tw_l = gth.scalar(ltw, li)
            sh = jnp.minimum(li + 1, 30)
            hh = jnp.maximum((h + (1 << sh) - 1) >> sh, 1)
            ww = jnp.maximum((w + (1 << sh) - 1) >> sh, 1)

            def fetch_l(yi, xi, hh, ww):
                yi = _wrap_coord(yi, hh, wrap)
                xi = _wrap_coord(xi, ww, wrap)
                r = mflat[off + (tid * th_l + yi) * tw_l + xi]
                return r[..., 0], r[..., 1], r[..., 2]

            return bilinear(fetch_l, hh, ww)

        lo = sample_level(l0)       # l0 == 0 -> replaced by base below
        hi_ = sample_level(l0 + 1)
        use_base = l0 == 0
        tri = tuple(
            jnp.where(use_base, base[c], lo[c]) * (1 - lfrac) +
            hi_[c] * lfrac
            for c in range(3))
    else:
        tri = base

    return Spec(tri)

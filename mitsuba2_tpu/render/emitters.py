"""Emitters: packing, evaluation, NEE direction sampling, and pdfs.

TPU-native rebuild of mitsuba2's Endpoint/Emitter layer + plugins
(src/librender/endpoint.cpp, src/emitters/{area,point,constant,...}.cpp)
and of Scene::sample_emitter_direction / pdf_emitter_direction
(src/librender/scene.cpp). Emitters live in the scene pytree as a packed
table; sampling picks an emitter uniformly (matching the reference's
uniform emitter selection) and dispatches over the (small) set of types
with masked evaluate-all. All device math is planar (core/vec.py,
core/spec.py): colors are Specs, uv is Vec2, per-lane emitter parameters
come through LaneRows column gathers.

Emitter row layout (EMIT_W = 16):
    [0:8]   radiance / intensity spectrum slot (see spectra.py)
    [8:11]  position (point/spot)
    [11:14] direction (spot/directional)
    [14:16] scalars (spot cutoff/beam)
"""
from __future__ import annotations

from typing import Tuple

import os

import jax.numpy as jnp
import numpy as np

from flax import struct

from ..core import math as m
from ..core import warp
from ..kernels import gather as gth
from ..core.distr import Marginal2D
from ..core.spec import Spec, swhere
from ..core.vec import Vec2, Vec3, as_vec2, v2where, vdot, vnormalize, vwhere
from .interaction import DirectionSample
from .spectra import LaneRows, SLOT_W, eval_spectrum_slot, pack_color, _tex_value

EMIT_W = 16

AREA = 0
POINT = 1
CONSTANT = 2
ENVMAP = 3
SPOT = 4
DIRECTIONAL = 5
PROJECTOR = 6

_PRIM_SPHERE = 1  # mirror of scene.PRIM_SPHERE (avoid circular import)

# Far-away distance stand-in for infinite emitters (constant/envmap/
# directional); the reference uses 2 * scene bounding radius
_INF_DIST = 1e7


@struct.dataclass
class EnvMapData:
    """Lat-long environment map (src/emitters/envmap.cpp): the radiance
    image plus its luminance*sin(theta) importance table (Marginal2D) and
    the emitter-to-world rotation."""
    image: jnp.ndarray    # (H, W, 3) linear RGB radiance
    distr: Marginal2D     # importance over [0,1]^2 uv
    to_world: jnp.ndarray  # (3, 3) rotation
    scale: jnp.ndarray    # () overall multiplier
    # (H, W, 4) [c2, c1, c0, hdr_scale]: per-texel sigmoid-polynomial
    # coefficients DIRECT-FIT at build (host GN, core/spectrum.py) so the
    # spectral eval path bilinearly interpolates COEFFICIENTS (4 row
    # gathers, same count as the rgb fetch) instead of upsampling per
    # lane through the lattice (24 extra gathers + a 63-step z-node
    # select chain per env lookup — the measured spectral-envmap cost).
    # Per-texel direct fits are also more accurate than lattice interp.
    coeffs: jnp.ndarray = None


def build_envmap(desc: dict) -> EnvMapData:
    """Host: envmap descriptor -> EnvMapData (importance table precompute,
    mirroring Envmap's Hierarchical2D/Marginal2D construction)."""
    if "data" in desc:
        img = np.asarray(desc["data"], np.float32)
    else:
        from ..core import io_bitmap
        img = io_bitmap.read(desc["filename"])
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    img = img[..., :3].astype(np.float32)
    H, W = img.shape[:2]
    lum = img @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    theta = (np.arange(H) + 0.5) / H * np.pi
    weight = np.maximum(lum, 0) * np.sin(theta)[:, None]
    tw = desc.get("to_world")
    rot = (np.asarray(tw, np.float32).reshape(-1)[:12].reshape(3, 4)[:, :3]
           if tw is not None else np.eye(3, dtype=np.float32))
    # alias tables: 3-gather O(1) sampling on TPU instead of the ~22
    # gathered elements of CDF inversion (core/distr.py::Marginal2D);
    # same piecewise-constant distribution and pdf. MI_ENVMAP_ALIAS=0
    # restores CDF inversion (preserves low-discrepancy stratification).
    use_alias = os.environ.get("MI_ENVMAP_ALIAS", "1") == "1"
    # per-texel spectral coefficients (see EnvMapData.coeffs): direct
    # GN fit of the sigmoid-polynomial model, HDR texels normalized by
    # their max channel like _tex_value does per lane
    from ..core import spectrum as sp
    cf, scales = sp.fit_srgb_model_batch(img.reshape(-1, 3))
    coeffs = np.concatenate(
        [np.asarray(cf, np.float32),
         np.asarray(scales, np.float32)[:, None]], axis=1).reshape(H, W, 4)
    return EnvMapData(image=jnp.asarray(img),
                      distr=Marginal2D.build(weight, alias=use_alias),
                      to_world=jnp.asarray(rot, jnp.float32),
                      scale=jnp.float32(desc.get("scale", 1.0)),
                      coeffs=jnp.asarray(coeffs))


def pack_emitter(desc: dict):
    """Host: emitter descriptor dict -> (type id, packed row, aux).

    aux is an EnvMapData for envmap emitters, else None."""
    row = np.zeros(EMIT_W, np.float32)
    t = desc.get("type")
    if t == "area":
        row[0:SLOT_W] = pack_color(desc.get("radiance", [1, 1, 1]),
                                   illuminant=True)
        return AREA, row, None
    if t == "point":
        row[0:SLOT_W] = pack_color(desc.get("intensity", [1, 1, 1]),
                                   illuminant=True)
        row[8:11] = np.asarray(desc.get("position", [0, 0, 0]), np.float32)
        return POINT, row, None
    if t == "constant":
        row[0:SLOT_W] = pack_color(desc.get("radiance", [1, 1, 1]),
                                   illuminant=True)
        return CONSTANT, row, None
    if t == "envmap":
        return ENVMAP, row, build_envmap(desc)
    if t == "spot":
        row[0:SLOT_W] = pack_color(desc.get("intensity", [1, 1, 1]),
                                   illuminant=True)
        row[8:11] = np.asarray(desc.get("position", [0, 0, 0]), np.float32)
        d = np.asarray(desc.get("direction", [0, 0, 1]), np.float32)
        row[11:14] = d / max(np.linalg.norm(d), 1e-20)
        cutoff = float(desc.get("cutoff_angle", 20.0))
        beam = float(desc.get("beam_width", cutoff * 0.75))
        row[14] = np.cos(np.deg2rad(cutoff))
        row[15] = np.cos(np.deg2rad(beam))
        return SPOT, row, None
    if t == "directional":
        row[0:SLOT_W] = pack_color(desc.get("irradiance", [1, 1, 1]),
                                   illuminant=True)
        d = np.asarray(desc.get("direction", [0, 0, 1]), np.float32)
        row[11:14] = d / max(np.linalg.norm(d), 1e-20)
        return DIRECTIONAL, row, None
    if t == "projector":
        # perspective texture projector (emitters/projector.cpp): delta
        # position, image projected through a pinhole frustum. The texture
        # rides the ordinary textured-spectrum-slot machinery.
        row[0:SLOT_W] = pack_color(desc.get("irradiance", [1, 1, 1]),
                                   illuminant=True)
        row[8:11] = np.asarray(desc.get("position", [0, 0, 0]), np.float32)
        d = np.asarray(desc.get("direction", [0, 0, 1]), np.float32)
        row[11:14] = d / max(np.linalg.norm(d), 1e-20)
        tan_x = np.tan(np.deg2rad(float(desc.get("fov", 45.0))) * 0.5)
        row[14] = tan_x
        row[15] = float(desc.get("aspect", 1.0))  # tan_y = aspect * tan_x
        return PROJECTOR, row, None
    raise ValueError(f"unknown emitter type {t!r}")


# Differentiable-parameter name of each emitter family (diff/params.py)
PARAM_NAME = {AREA: "radiance", POINT: "intensity", CONSTANT: "radiance",
              SPOT: "intensity", DIRECTIONAL: "irradiance",
              PROJECTOR: "irradiance"}


# ---------------------------------------------------------------------------
# Envmap direction <-> uv (envmap.cpp conventions: y-up lat-long)
# ---------------------------------------------------------------------------

def _envmap_dir_to_uv(env: EnvMapData, d_world) -> Vec2:
    d_world = d_world if isinstance(d_world, Vec3) else Vec3.from_array(d_world)
    tw = env.to_world  # world -> local via transpose (pure rotation)
    dx = tw[0, 0] * d_world.x + tw[1, 0] * d_world.y + tw[2, 0] * d_world.z
    dy = tw[0, 1] * d_world.x + tw[1, 1] * d_world.y + tw[2, 1] * d_world.z
    dz = tw[0, 2] * d_world.x + tw[1, 2] * d_world.y + tw[2, 2] * d_world.z
    u = jnp.arctan2(dx, -dz) * (0.5 / jnp.pi)
    u = jnp.where(u < 0, u + 1.0, u)
    v = m.safe_acos(dy) / jnp.pi
    return Vec2(u, v)


def _envmap_uv_to_dir(env: EnvMapData, uv: Vec2) -> Vec3:
    phi = uv.x * (2 * jnp.pi)
    theta = uv.y * jnp.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    lx, ly, lz = st * jnp.sin(phi), ct, -st * jnp.cos(phi)
    tw = env.to_world
    return Vec3(tw[0, 0] * lx + tw[0, 1] * ly + tw[0, 2] * lz,
                tw[1, 0] * lx + tw[1, 1] * ly + tw[1, 2] * lz,
                tw[2, 0] * lx + tw[2, 1] * ly + tw[2, 2] * lz)


def _envmap_bilinear_rows(img, uv: Vec2, gain=1.0):
    """Bilinear fetch of an (H, W, C) lat-long image at per-lane uv.
    Returns a C-tuple of (N,) channels. ROW gathers + slices (per-column
    gathers hit the scalar core — kernels/gather.py)."""
    H, W, C = img.shape
    x = uv.x * W - 0.5
    y = jnp.clip(uv.y * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    x0w = jnp.remainder(x0, W)  # azimuth wraps
    x1w = jnp.remainder(x0 + 1, W)
    flat = img.reshape(H * W, C)
    r00 = flat[y0 * W + x0w]
    r01 = flat[y0 * W + x1w]
    r10 = flat[y1 * W + x0w]
    r11 = flat[y1 * W + x1w]
    out = []
    for c in range(C):
        v = ((r00[..., c] * (1 - fx) + r01[..., c] * fx) * (1 - fy) +
             (r10[..., c] * (1 - fx) + r11[..., c] * fx) * fy)
        out.append(v * gain)
    return tuple(out)


def _envmap_bilinear(env: EnvMapData, uv: Vec2) -> Spec:
    return Spec(_envmap_bilinear_rows(env.image, uv, env.scale))


def envmap_eval(env: EnvMapData, d_world, wavelengths, color_mode) -> Spec:
    uv = _envmap_dir_to_uv(env, d_world)
    if color_mode == "spectral" and getattr(env, "coeffs", None) is not None:
        # baked per-texel sigmoid coefficients: bilinear over
        # [c2, c1, c0, hdr_scale] (same 4 row gathers as the rgb fetch —
        # no per-lane lattice traffic; see EnvMapData.coeffs)
        from ..core import spectrum as sp
        c2, c1, c0, hs = _envmap_bilinear_rows(env.coeffs, uv)
        gain = hs * env.scale
        return Spec(tuple(sp.srgb_model_eval_t(c2, c1, c0, w) * gain
                          for w in wavelengths.ch))
    rgb = _envmap_bilinear(env, uv)
    return _tex_value(rgb, wavelengths, color_mode)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def eval_hit(scene, si, config) -> Spec:
    """Emitter::eval at a surface hit: area-emitter radiance toward the
    viewer; zero from the back side (emitters/area.cpp)."""
    from ..core.geometry import Frame
    e_idx = gth.scalar(scene.shape_emitter, jnp.maximum(si.shape, 0))
    has_e = si.valid & (si.shape >= 0) & (e_idx >= 0)
    row = LaneRows(scene.emitter_data, jnp.maximum(e_idx, 0))
    front = Frame.cos_theta(si.wi) > 0
    val = eval_spectrum_slot(row, si.wavelengths,
                             config.color_mode, tex=si.tex, uv=si.uv)
    return val.masked(has_e & front)


def eval_env(scene, d_world, wavelengths, config) -> Spec:
    """Environment radiance for escaped rays (constant / envmap)."""
    d_world = d_world if isinstance(d_world, Vec3) else Vec3.from_array(d_world)
    N = jnp.shape(d_world.z)[0]
    if scene.env_emitter < 0:
        return Spec.zeros((N,), config.n_channels)
    if scene.envmap is not None:
        return envmap_eval(scene.envmap, d_world, wavelengths,
                           config.color_mode)
    row = LaneRows(scene.emitter_data, scene.env_emitter)
    val = eval_spectrum_slot(row, wavelengths, config.color_mode)
    return val.map(lambda c: jnp.broadcast_to(c, (N,)))


# ---------------------------------------------------------------------------
# NEE sampling (Scene::sample_emitter_direction)
# ---------------------------------------------------------------------------

def sample_direction(scene, ref_p, wavelengths, u1, u2, config
                     ) -> Tuple[DirectionSample, Spec]:
    """Pick an emitter uniformly, sample a direction toward it, return the
    DirectionSample (solid-angle pdf already including the 1/E pick
    probability) and the emitter radiance (NOT divided by the pdf).
    Visibility is NOT tested here (integrator casts the shadow ray).
    """
    ref_p = ref_p if isinstance(ref_p, Vec3) else Vec3.from_array(ref_p)
    N = jnp.shape(ref_p.z)[0]
    E = scene.n_emitters
    C = config.n_channels
    zero_ds = DirectionSample(
        p=Vec3.zeros((N,)), n=Vec3.zeros((N,)), uv=Vec2.zeros((N,)),
        d=Vec3.zeros((N,)), dist=jnp.full((N,), jnp.inf),
        pdf=jnp.zeros((N,)), delta=jnp.zeros((N,), bool),
        emitter=jnp.full((N,), -1, jnp.int32))
    if E == 0:
        return zero_ds, Spec.zeros((N,), C)

    # Uniform emitter pick with sample reuse (scene.cpp)
    scaled = u1 * E
    e_idx = jnp.clip(scaled.astype(jnp.int32), 0, E - 1)
    pick_pdf = 1.0 / E

    etype = gth.scalar(scene.emitter_type, e_idx)
    row = LaneRows(scene.emitter_data, e_idx)

    ds, val = zero_ds, Spec.zeros((N,), C)

    # Static gating: only emit code for emitter kinds present in the scene
    if AREA in scene.emitter_kinds:
        ds, val = _sample_area(scene, ref_p, wavelengths, e_idx, etype, row,
                               scaled, u2, pick_pdf, ds, val, config)
    if POINT in scene.emitter_kinds:
        ds, val = _sample_point(scene, ref_p, wavelengths, e_idx, etype, row,
                                pick_pdf, ds, val, config)
    if CONSTANT in scene.emitter_kinds:
        ds, val = _sample_constant(scene, ref_p, wavelengths, e_idx, etype, row,
                                   u2, pick_pdf, ds, val, config)
    if ENVMAP in scene.emitter_kinds:
        ds, val = _sample_envmap(scene, ref_p, wavelengths, e_idx, etype,
                                 u2, pick_pdf, ds, val, config)
    if SPOT in scene.emitter_kinds:
        ds, val = _sample_spot(scene, ref_p, wavelengths, e_idx, etype, row,
                               pick_pdf, ds, val, config)
    if DIRECTIONAL in scene.emitter_kinds:
        ds, val = _sample_directional(scene, ref_p, wavelengths, e_idx, etype,
                                      row, pick_pdf, ds, val, config)
    if PROJECTOR in scene.emitter_kinds:
        ds, val = _sample_projector(scene, ref_p, wavelengths, e_idx, etype,
                                    row, pick_pdf, ds, val, config)
    return ds, val


def _sample_projector(scene, ref_p, wavelengths, e_idx, etype, row, pick_pdf,
                      ds, val, config):
    """Texture projector (emitters/projector.cpp): delta position; the
    (possibly textured) irradiance slot is sampled at the frustum uv of the
    shading point, scaled 1/dist^2, zero outside the frustum."""
    from ..core.geometry import coordinate_system
    is_proj = etype == PROJECTOR
    p_l = Vec3(row.col(8), row.col(9), row.col(10))
    fwd = Vec3(row.col(11), row.col(12), row.col(13))
    tan_x = row.col(14)
    tan_y = row.col(15) * tan_x
    s_ax, t_ax = coordinate_system(fwd)
    v = ref_p - p_l
    z = vdot(v, fwd)
    x = vdot(v, s_ax)
    y = vdot(v, t_ax)
    dist2 = vdot(v, v)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    d_unit = v * (-1.0 / dist)  # from ref toward the projector
    zc = jnp.maximum(z, 1e-20)
    u_f = 0.5 * (x / (zc * jnp.maximum(tan_x, 1e-8)) + 1.0)
    v_f = 0.5 * (y / (zc * jnp.maximum(tan_y, 1e-8)) + 1.0)
    inside = (z > 0) & (u_f >= 0) & (u_f <= 1) & (v_f >= 0) & (v_f <= 1)
    uv_f = Vec2(u_f, v_f)
    irr = eval_spectrum_slot(row, wavelengths, config.color_mode,
                             tex=scene.textures, uv=uv_f)
    v_val = irr / jnp.maximum(dist2, 1e-20)
    ok = is_proj & inside
    ds = DirectionSample(
        p=vwhere(is_proj, p_l, ds.p),
        n=vwhere(is_proj, fwd, ds.n),
        uv=v2where(is_proj, uv_f, ds.uv),
        d=vwhere(is_proj, d_unit, ds.d),
        dist=jnp.where(is_proj, dist, ds.dist),
        pdf=jnp.where(ok, pick_pdf, jnp.where(is_proj, 0.0, ds.pdf)),
        delta=jnp.where(is_proj, True, ds.delta),
        emitter=jnp.where(is_proj, e_idx, ds.emitter))
    val = swhere(ok, v_val, swhere(is_proj, Spec.zeros((), val.n), val))
    return ds, val


def _sample_area(scene, ref_p, wavelengths, e_idx, etype, row, scaled, u2,
                 pick_pdf, ds, val, config):
    """Component-planar internals (kernels/brute.py layout note)."""
    total = gth.scalar(scene.emitter_area, e_idx)  # (N,)
    # sample prim by area: CDF search unrolled over the (static, small)
    # Fmax axis with (N,) ops — an (N, Fmax) compare would pad Fmax -> 128
    # lanes on TPU (kernels/brute.py layout note)
    Fmax = scene.emitter_prims.shape[1]
    u_reuse = scaled - e_idx
    target = u_reuse * total
    flat_cdf = scene.emitter_prim_cdf.reshape(-1)
    if Fmax <= 16:  # unrolled linear scan in (N,) ops
        slot = jnp.zeros_like(e_idx)
        for k in range(Fmax):
            slot = slot + (flat_cdf[e_idx * Fmax + k] < target).astype(jnp.int32)
    else:  # big mesh lights: per-lane bisection over the padded CDF row
        lo = jnp.zeros_like(e_idx)
        hi = jnp.full_like(e_idx, Fmax)
        steps = int(np.ceil(np.log2(max(Fmax, 2)))) + 1
        base = e_idx * Fmax
        for _ in range(steps):
            mid = (lo + hi) // 2
            go_right = flat_cdf[base + mid] < target
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        slot = lo
    slot = jnp.clip(slot, 0, Fmax - 1)
    prim = gth.scalar(scene.emitter_prims.reshape(-1), e_idx * Fmax + slot)
    prim_c = jnp.maximum(prim, 0)

    def g3(table):
        return gth.rows3(table, prim_c)

    def norm3(x, y, z):
        inv = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
        return x * inv, y * inv, z * inv

    p0x, p0y, p0z = g3(scene.prim_p0)
    e1x, e1y, e1z = g3(scene.prim_e1)
    e2x, e2y, e2z = g3(scene.prim_e2)
    # triangle position
    b0, b1 = warp.square_to_uniform_triangle(u2)
    px = p0x + e1x * b0 + e2x * b1
    py = p0y + e1y * b0 + e2y * b1
    pz = p0z + e1z * b0 + e2z * b1
    nx, ny, nz = norm3(e1y * e2z - e1z * e2y,
                       e1z * e2x - e1x * e2z,
                       e1x * e2y - e1y * e2x)
    bw = 1.0 - b0 - b1
    uv0x, uv0y = gth.rows2(scene.prim_uv0, prim_c)
    uv1x, uv1y = gth.rows2(scene.prim_uv1, prim_c)
    uv2x, uv2y = gth.rows2(scene.prim_uv2, prim_c)
    uvx = uv0x * bw + uv1x * b0 + uv2x * b1
    uvy = uv0y * bw + uv1y * b0 + uv2y * b1
    if scene.has_spheres:
        is_sph = gth.scalar(scene.prim_type, prim_c) == _PRIM_SPHERE
        dir_s = warp.square_to_uniform_sphere(u2)
        sx, sy, sz = dir_s.x, dir_s.y, dir_s.z
        px = jnp.where(is_sph, p0x + sx * e1x, px)
        py = jnp.where(is_sph, p0y + sy * e1x, py)
        pz = jnp.where(is_sph, p0z + sz * e1x, pz)
        # e1.y < 0 marks flip_normals spheres (inward emission); keep the
        # emitter normal consistent with compute_surface_interaction
        sph_sgn = jnp.where(e1y < 0, -1.0, 1.0)
        nx = jnp.where(is_sph, sx * sph_sgn, nx)
        ny = jnp.where(is_sph, sy * sph_sgn, ny)
        nz = jnp.where(is_sph, sz * sph_sgn, nz)
        u2v = as_vec2(u2)
        uvx = jnp.where(is_sph, u2v.x, uvx)
        uvy = jnp.where(is_sph, u2v.y, uvy)
    dvx = px - ref_p.x
    dvy = py - ref_p.y
    dvz = pz - ref_p.z
    dist2 = dvx * dvx + dvy * dvy + dvz * dvz
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    inv_dist = 1.0 / dist
    dux, duy, duz = dvx * inv_dist, dvy * inv_dist, dvz * inv_dist
    cos_e = -(nx * dux + ny * duy + nz * duz)
    pdf_area = 1.0 / jnp.maximum(total, 1e-20)
    pdf_sa = pick_pdf * pdf_area * dist2 / jnp.maximum(cos_e, 1e-20)
    area_ok = (etype == AREA) & (cos_e > 0) & (prim >= 0)
    p_e = Vec3(px, py, pz)
    n_e = Vec3(nx, ny, nz)
    uv_e = Vec2(uvx, uvy)
    d_unit = Vec3(dux, duy, duz)
    radiance = eval_spectrum_slot(row, wavelengths, config.color_mode,
                                  tex=scene.textures, uv=uv_e)
    ds = DirectionSample(
        p=vwhere(area_ok, p_e, ds.p),
        n=vwhere(area_ok, n_e, ds.n),
        uv=v2where(area_ok, uv_e, ds.uv),
        d=vwhere(area_ok, d_unit, ds.d),
        dist=jnp.where(area_ok, dist, ds.dist),
        pdf=jnp.where(area_ok, pdf_sa, ds.pdf),
        delta=ds.delta,
        emitter=jnp.where(area_ok, e_idx, ds.emitter))
    val = swhere(area_ok, radiance, val)
    return ds, val


def _sample_point(scene, ref_p, wavelengths, e_idx, etype, row, pick_pdf,
                  ds, val, config):
    # point (delta position), emitters/point.cpp
    is_point = etype == POINT
    p_l = Vec3(row.col(8), row.col(9), row.col(10))
    d_vec_p = p_l - ref_p
    dist2_p = vdot(d_vec_p, d_vec_p)
    dist_p = jnp.sqrt(jnp.maximum(dist2_p, 1e-30))
    d_unit_p = d_vec_p * (1.0 / dist_p)
    intensity = eval_spectrum_slot(row, wavelengths, config.color_mode)
    val_p = intensity / jnp.maximum(dist2_p, 1e-20)
    ds = DirectionSample(
        p=vwhere(is_point, p_l, ds.p),
        n=ds.n, uv=ds.uv,
        d=vwhere(is_point, d_unit_p, ds.d),
        dist=jnp.where(is_point, dist_p, ds.dist),
        pdf=jnp.where(is_point, pick_pdf, ds.pdf),
        delta=jnp.where(is_point, True, ds.delta),
        emitter=jnp.where(is_point, e_idx, ds.emitter))
    val = swhere(is_point, val_p, val)
    return ds, val


def _sample_constant(scene, ref_p, wavelengths, e_idx, etype, row, u2,
                     pick_pdf, ds, val, config):
    # constant environment, emitters/constant.cpp
    is_const = etype == CONSTANT
    if scene.env_emitter >= 0:
        d_c = warp.square_to_uniform_sphere(u2)
        radiance_c = eval_spectrum_slot(row, wavelengths, config.color_mode)
        ds = DirectionSample(
            p=vwhere(is_const, ref_p + d_c * 1e7, ds.p),
            n=vwhere(is_const, -d_c, ds.n), uv=ds.uv,
            d=vwhere(is_const, d_c, ds.d),
            dist=jnp.where(is_const, jnp.float32(1e7), ds.dist),
            pdf=jnp.where(is_const, pick_pdf * warp.INV_FOUR_PI, ds.pdf),
            delta=ds.delta,
            emitter=jnp.where(is_const, e_idx, ds.emitter))
        val = swhere(is_const, radiance_c, val)
    return ds, val


def _sample_envmap(scene, ref_p, wavelengths, e_idx, etype, u2, pick_pdf,
                   ds, val, config):
    """Importance-sample the envmap's luminance table (envmap.cpp::
    sample_direction via Marginal2D)."""
    env = scene.envmap
    is_env = etype == ENVMAP
    uv, pdf_uv = env.distr.sample(u2)
    d_w = _envmap_uv_to_dir(env, uv)
    sin_theta = jnp.sin(uv.y * jnp.pi)
    pdf_sa = pick_pdf * pdf_uv / jnp.maximum(
        2.0 * jnp.pi * jnp.pi * sin_theta, 1e-20)
    rgb = _envmap_bilinear(env, uv)
    radiance = _tex_value(rgb, wavelengths, config.color_mode)
    ok = is_env & (pdf_sa > 0) & (sin_theta > 0)
    ds = DirectionSample(
        p=vwhere(ok, ref_p + d_w * _INF_DIST, ds.p),
        n=vwhere(ok, -d_w, ds.n),
        uv=v2where(ok, uv, ds.uv),
        d=vwhere(ok, d_w, ds.d),
        dist=jnp.where(ok, jnp.float32(_INF_DIST), ds.dist),
        pdf=jnp.where(ok, pdf_sa, ds.pdf),
        delta=ds.delta,
        emitter=jnp.where(ok, e_idx, ds.emitter))
    val = swhere(ok, radiance, val)
    return ds, val


def _sample_spot(scene, ref_p, wavelengths, e_idx, etype, row, pick_pdf,
                 ds, val, config):
    """Spot light (emitters/spot.cpp): delta position, linear angular
    falloff between beam_width and cutoff_angle."""
    is_spot = etype == SPOT
    p_l = Vec3(row.col(8), row.col(9), row.col(10))
    spot_d = Vec3(row.col(11), row.col(12), row.col(13))
    cos_cutoff = row.col(14)
    cos_beam = row.col(15)
    d_vec = p_l - ref_p
    dist2 = vdot(d_vec, d_vec)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    d_unit = d_vec * (1.0 / dist)
    cos_a = vdot(spot_d, -d_unit)  # angle between spot axis and ray to ref
    falloff = jnp.clip((cos_a - cos_cutoff) /
                       jnp.maximum(cos_beam - cos_cutoff, 1e-8), 0.0, 1.0)
    intensity = eval_spectrum_slot(row, wavelengths, config.color_mode)
    v = intensity * (falloff / jnp.maximum(dist2, 1e-20))
    ok = is_spot & (cos_a > cos_cutoff)
    ds = DirectionSample(
        p=vwhere(is_spot, p_l, ds.p),
        n=vwhere(is_spot, spot_d, ds.n), uv=ds.uv,
        d=vwhere(is_spot, d_unit, ds.d),
        dist=jnp.where(is_spot, dist, ds.dist),
        pdf=jnp.where(ok, pick_pdf, jnp.where(is_spot, 0.0, ds.pdf)),
        delta=jnp.where(is_spot, True, ds.delta),
        emitter=jnp.where(is_spot, e_idx, ds.emitter))
    val = swhere(ok, v, swhere(is_spot, Spec.zeros((), val.n), val))
    return ds, val


def _sample_directional(scene, ref_p, wavelengths, e_idx, etype, row,
                        pick_pdf, ds, val, config):
    """Directional sun-style emitter (emitters/directional.cpp): delta
    direction; `irradiance` is the power through a unit surface facing it."""
    is_dir = etype == DIRECTIONAL
    e_d = Vec3(row.col(11), row.col(12), row.col(13))  # direction light TRAVELS
    d_unit = -e_d
    irradiance = eval_spectrum_slot(row, wavelengths, config.color_mode)
    ds = DirectionSample(
        p=vwhere(is_dir, ref_p + d_unit * _INF_DIST, ds.p),
        n=vwhere(is_dir, e_d, ds.n), uv=ds.uv,
        d=vwhere(is_dir, d_unit, ds.d),
        dist=jnp.where(is_dir, jnp.float32(_INF_DIST), ds.dist),
        pdf=jnp.where(is_dir, pick_pdf, ds.pdf),
        delta=jnp.where(is_dir, True, ds.delta),
        emitter=jnp.where(is_dir, e_idx, ds.emitter))
    val = swhere(is_dir, irradiance, val)
    return ds, val


def pdf_direction_hit(scene, ref_p, si_hit, config) -> jnp.ndarray:
    """Scene::pdf_emitter_direction for a BSDF-sampled ray that HIT an
    emissive surface: solid-angle NEE pdf of that direction (for MIS)."""
    E = scene.n_emitters
    ref_p = ref_p if isinstance(ref_p, Vec3) else Vec3.from_array(ref_p)
    if E == 0:
        return jnp.zeros(jnp.shape(ref_p.z)[0], jnp.float32)
    e_idx = gth.scalar(scene.shape_emitter, jnp.maximum(si_hit.shape, 0))
    valid = si_hit.valid & (si_hit.shape >= 0) & (e_idx >= 0)
    area = gth.scalar(scene.emitter_area, jnp.maximum(e_idx, 0))
    d_vec = si_hit.p - ref_p
    dist2 = vdot(d_vec, d_vec)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    cos_e = vdot(si_hit.n, d_vec * (-1.0 / dist))
    good = valid & (cos_e > 0)
    # sanitize-then-divide: a where() AFTER an overflowing division leaks
    # nan into the backward pass (f32 (1e20)^2 = inf inside mis_weight's
    # vjp); masked lanes must never see the huge quotient at all
    denom = jnp.where(good, cos_e * area, 1.0)
    pdf = (1.0 / E) * jnp.where(good, dist2, 0.0) / jnp.maximum(denom, 1e-20)
    return pdf


def pdf_direction_env(scene, config, d_world) -> jnp.ndarray:
    """NEE pdf for a BSDF ray that escaped to the environment (for MIS)."""
    d_world = d_world if isinstance(d_world, Vec3) else Vec3.from_array(d_world)
    n_lanes = jnp.shape(d_world.z)[0]
    E = scene.n_emitters
    if E == 0 or scene.env_emitter < 0:
        return jnp.zeros(n_lanes, jnp.float32)
    if scene.envmap is not None:
        env = scene.envmap
        uv = _envmap_dir_to_uv(env, d_world)
        pdf_uv = env.distr.eval_pdf(uv)
        sin_theta = jnp.sin(uv.y * jnp.pi)
        return pdf_uv / jnp.maximum(
            2.0 * jnp.pi * jnp.pi * sin_theta, 1e-20) / E
    return jnp.full(n_lanes, warp.INV_FOUR_PI / E, jnp.float32)

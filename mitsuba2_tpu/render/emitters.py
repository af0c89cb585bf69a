"""Emitters: packing, evaluation, NEE direction sampling, and pdfs.

TPU-native rebuild of mitsuba2's Endpoint/Emitter layer + plugins
(src/librender/endpoint.cpp, src/emitters/{area,point,constant,...}.cpp)
and of Scene::sample_emitter_direction / pdf_emitter_direction
(src/librender/scene.cpp). Emitters live in the scene pytree as a packed
table; sampling picks an emitter uniformly (matching the reference's
uniform emitter selection) and dispatches over the (small) set of types
with masked evaluate-all.

Emitter row layout (EMIT_W = 16):
    [0:8]   radiance / intensity spectrum slot (see spectra.py)
    [8:11]  position (point/spot)
    [11:14] direction (spot/directional)
    [14:16] scalars (spot cutoff/beam)
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from flax import struct

from ..core import math as m
from ..core import warp
from ..core.distr import Marginal2D
from ..core.geometry import Frame, dot, normalize
from .interaction import DirectionSample
from .spectra import SLOT_W, eval_spectrum_slot, pack_color, _tex_value

EMIT_W = 16

AREA = 0
POINT = 1
CONSTANT = 2
ENVMAP = 3
SPOT = 4
DIRECTIONAL = 5

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
    return EnvMapData(image=jnp.asarray(img),
                      distr=Marginal2D.build(weight),
                      to_world=jnp.asarray(rot, jnp.float32),
                      scale=jnp.float32(desc.get("scale", 1.0)))


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
    raise ValueError(f"unknown emitter type {t!r}")


# Differentiable-parameter name of each emitter family (diff/params.py)
PARAM_NAME = {AREA: "radiance", POINT: "intensity", CONSTANT: "radiance",
              SPOT: "intensity", DIRECTIONAL: "irradiance"}


# ---------------------------------------------------------------------------
# Envmap direction <-> uv (envmap.cpp conventions: y-up lat-long)
# ---------------------------------------------------------------------------

def _envmap_dir_to_uv(env: EnvMapData, d_world):
    d = d_world @ env.to_world  # world -> local (rotation: inverse = transpose)
    u = jnp.arctan2(d[..., 0], -d[..., 2]) * (0.5 / jnp.pi)
    u = jnp.where(u < 0, u + 1.0, u)
    v = m.safe_acos(d[..., 1]) / jnp.pi
    return jnp.stack([u, v], axis=-1)


def _envmap_uv_to_dir(env: EnvMapData, uv):
    phi = uv[..., 0] * (2 * jnp.pi)
    theta = uv[..., 1] * jnp.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    d_local = jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], axis=-1)
    return d_local @ env.to_world.T  # local -> world


def _envmap_bilinear(env: EnvMapData, uv):
    img = env.image
    H, W = img.shape[:2]
    x = uv[..., 0] * W - 0.5
    y = jnp.clip(uv[..., 1] * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    x0w = jnp.remainder(x0, W)  # azimuth wraps
    x1w = jnp.remainder(x0 + 1, W)
    flat = img.reshape(H * W, 3)
    c00 = flat[y0 * W + x0w]
    c01 = flat[y0 * W + x1w]
    c10 = flat[y1 * W + x0w]
    c11 = flat[y1 * W + x1w]
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy) +
            (c10 * (1 - fx) + c11 * fx) * fy) * env.scale


def envmap_eval(env: EnvMapData, d_world, wavelengths, color_mode):
    uv = _envmap_dir_to_uv(env, d_world)
    rgb = _envmap_bilinear(env, uv)
    return _tex_value(rgb, wavelengths, color_mode)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def eval_hit(scene, si, config) -> jnp.ndarray:
    """Emitter::eval at a surface hit: area-emitter radiance toward the
    viewer; zero from the back side (emitters/area.cpp)."""
    e_idx = scene.shape_emitter[jnp.maximum(si.shape, 0)]
    has_e = si.valid & (si.shape >= 0) & (e_idx >= 0)
    row = scene.emitter_data[jnp.maximum(e_idx, 0)]
    front = Frame.cos_theta(si.wi) > 0
    val = eval_spectrum_slot(row[..., 0:SLOT_W], si.wavelengths,
                             config.color_mode, tex=si.tex, uv=si.uv)
    return jnp.where((has_e & front)[..., None], val, 0.0)


def eval_env(scene, d_world, wavelengths, config) -> jnp.ndarray:
    """Environment radiance for escaped rays (constant / envmap)."""
    N = d_world.shape[0]
    if scene.env_emitter < 0:
        return jnp.zeros((N, config.n_channels), jnp.float32)
    if scene.envmap is not None:
        return envmap_eval(scene.envmap, d_world, wavelengths,
                           config.color_mode)
    row = scene.emitter_data[scene.env_emitter]
    val = eval_spectrum_slot(row[0:SLOT_W], wavelengths, config.color_mode)
    return jnp.broadcast_to(val, (N, config.n_channels))


# ---------------------------------------------------------------------------
# NEE sampling (Scene::sample_emitter_direction)
# ---------------------------------------------------------------------------

def sample_direction(scene, ref_p, wavelengths, u1, u2, config
                     ) -> Tuple[DirectionSample, jnp.ndarray]:
    """Pick an emitter uniformly, sample a direction toward it, return the
    DirectionSample (solid-angle pdf already including the 1/E pick
    probability) and the emitter radiance (NOT divided by the pdf).
    Visibility is NOT tested here (integrator casts the shadow ray).
    """
    N = ref_p.shape[0]
    E = scene.n_emitters
    C = config.n_channels
    zero_ds = DirectionSample(
        p=jnp.zeros((N, 3)), n=jnp.zeros((N, 3)), uv=jnp.zeros((N, 2)),
        d=jnp.zeros((N, 3)), dist=jnp.full((N,), jnp.inf),
        pdf=jnp.zeros((N,)), delta=jnp.zeros((N,), bool),
        emitter=jnp.full((N,), -1, jnp.int32))
    if E == 0:
        return zero_ds, jnp.zeros((N, C), jnp.float32)

    # Uniform emitter pick with sample reuse (scene.cpp)
    scaled = u1 * E
    e_idx = jnp.clip(scaled.astype(jnp.int32), 0, E - 1)
    pick_pdf = 1.0 / E

    etype = scene.emitter_type[e_idx]
    row = scene.emitter_data[e_idx]

    ds, val = zero_ds, jnp.zeros((N, C), jnp.float32)

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
    return ds, val


def _sample_area(scene, ref_p, wavelengths, e_idx, etype, row, scaled, u2,
                 pick_pdf, ds, val, config):
    """Component-planar internals (kernels/brute.py layout note)."""
    total = scene.emitter_area[e_idx]              # (N,)
    # sample prim by area: CDF search unrolled over the (static, small)
    # Fmax axis with (N,) ops — an (N, Fmax) compare would pad Fmax -> 128
    # lanes on TPU (kernels/brute.py layout note)
    Fmax = scene.emitter_prims.shape[1]
    u_reuse = scaled - e_idx
    target = u_reuse * total
    if Fmax <= 16:  # unrolled linear scan in (N,) ops
        slot = jnp.zeros_like(e_idx)
        for k in range(Fmax):
            slot = slot + (scene.emitter_prim_cdf[e_idx, k] < target
                           ).astype(jnp.int32)
    else:  # big mesh lights: one batched row search
        cdf = scene.emitter_prim_cdf[e_idx]        # (N, Fmax)
        slot = jnp.sum((cdf < target[..., None]).astype(jnp.int32), axis=-1)
    slot = jnp.clip(slot, 0, Fmax - 1)
    prim = scene.emitter_prims.reshape(-1)[e_idx * Fmax + slot]
    prim_c = jnp.maximum(prim, 0)

    def g3(table):
        t = table[prim_c]
        return t[..., 0], t[..., 1], t[..., 2]

    def norm3(x, y, z):
        inv = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
        return x * inv, y * inv, z * inv

    p0x, p0y, p0z = g3(scene.prim_p0)
    e1x, e1y, e1z = g3(scene.prim_e1)
    e2x, e2y, e2z = g3(scene.prim_e2)
    # triangle position
    bc = warp.square_to_uniform_triangle(u2)
    b0, b1 = bc[..., 0], bc[..., 1]
    px = p0x + e1x * b0 + e2x * b1
    py = p0y + e1y * b0 + e2y * b1
    pz = p0z + e1z * b0 + e2z * b1
    nx, ny, nz = norm3(e1y * e2z - e1z * e2y,
                       e1z * e2x - e1x * e2z,
                       e1x * e2y - e1y * e2x)
    bw = 1.0 - b0 - b1
    uv0 = scene.prim_uv0[prim_c]
    uv1 = scene.prim_uv1[prim_c]
    uv2 = scene.prim_uv2[prim_c]
    uvx = uv0[..., 0] * bw + uv1[..., 0] * b0 + uv2[..., 0] * b1
    uvy = uv0[..., 1] * bw + uv1[..., 1] * b0 + uv2[..., 1] * b1
    if scene.has_spheres:
        is_sph = scene.prim_type[prim_c] == _PRIM_SPHERE
        dir_s = warp.square_to_uniform_sphere(u2)
        sx, sy, sz = dir_s[..., 0], dir_s[..., 1], dir_s[..., 2]
        px = jnp.where(is_sph, p0x + sx * e1x, px)
        py = jnp.where(is_sph, p0y + sy * e1x, py)
        pz = jnp.where(is_sph, p0z + sz * e1x, pz)
        nx = jnp.where(is_sph, sx, nx)
        ny = jnp.where(is_sph, sy, ny)
        nz = jnp.where(is_sph, sz, nz)
        uvx = jnp.where(is_sph, u2[..., 0], uvx)
        uvy = jnp.where(is_sph, u2[..., 1], uvy)
    dvx = px - ref_p[..., 0]
    dvy = py - ref_p[..., 1]
    dvz = pz - ref_p[..., 2]
    dist2 = dvx * dvx + dvy * dvy + dvz * dvz
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    inv_dist = 1.0 / dist
    dux, duy, duz = dvx * inv_dist, dvy * inv_dist, dvz * inv_dist
    cos_e = -(nx * dux + ny * duy + nz * duz)
    pdf_area = 1.0 / jnp.maximum(total, 1e-20)
    pdf_sa = pick_pdf * pdf_area * dist2 / jnp.maximum(cos_e, 1e-20)
    area_ok = (etype == AREA) & (cos_e > 0) & (prim >= 0)
    p_e = jnp.stack([px, py, pz], axis=-1)
    n_e = jnp.stack([nx, ny, nz], axis=-1)
    uv_e = jnp.stack([uvx, uvy], axis=-1)
    d_unit = jnp.stack([dux, duy, duz], axis=-1)
    radiance = eval_spectrum_slot(row[..., 0:SLOT_W], wavelengths,
                                  config.color_mode,
                                  tex=scene.textures, uv=uv_e)
    ds = DirectionSample(
        p=jnp.where(area_ok[..., None], p_e, ds.p),
        n=jnp.where(area_ok[..., None], n_e, ds.n),
        uv=jnp.where(area_ok[..., None], uv_e, ds.uv),
        d=jnp.where(area_ok[..., None], d_unit, ds.d),
        dist=jnp.where(area_ok, dist, ds.dist),
        pdf=jnp.where(area_ok, pdf_sa, ds.pdf),
        delta=ds.delta,
        emitter=jnp.where(area_ok, e_idx, ds.emitter))
    val = jnp.where(area_ok[..., None], radiance, val)
    return ds, val


def _sample_point(scene, ref_p, wavelengths, e_idx, etype, row, pick_pdf,
                  ds, val, config):
    # point (delta position), emitters/point.cpp
    is_point = etype == POINT
    p_l = row[..., 8:11]
    d_vec_p = p_l - ref_p
    dist2_p = jnp.sum(d_vec_p * d_vec_p, axis=-1)
    dist_p = jnp.sqrt(jnp.maximum(dist2_p, 1e-30))
    d_unit_p = d_vec_p / dist_p[..., None]
    intensity = eval_spectrum_slot(row[..., 0:SLOT_W], wavelengths,
                                   config.color_mode)
    val_p = intensity / jnp.maximum(dist2_p[..., None], 1e-20)
    ds = DirectionSample(
        p=jnp.where(is_point[..., None], p_l, ds.p),
        n=ds.n, uv=ds.uv,
        d=jnp.where(is_point[..., None], d_unit_p, ds.d),
        dist=jnp.where(is_point, dist_p, ds.dist),
        pdf=jnp.where(is_point, pick_pdf, ds.pdf),
        delta=jnp.where(is_point, True, ds.delta),
        emitter=jnp.where(is_point, e_idx, ds.emitter))
    val = jnp.where(is_point[..., None], val_p, val)
    return ds, val


def _sample_constant(scene, ref_p, wavelengths, e_idx, etype, row, u2,
                     pick_pdf, ds, val, config):
    # constant environment, emitters/constant.cpp
    is_const = etype == CONSTANT
    if scene.env_emitter >= 0:
        d_c = warp.square_to_uniform_sphere(u2)
        radiance_c = eval_spectrum_slot(row[..., 0:SLOT_W], wavelengths,
                                        config.color_mode)
        ds = DirectionSample(
            p=jnp.where(is_const[..., None], ref_p + d_c * 1e7, ds.p),
            n=jnp.where(is_const[..., None], -d_c, ds.n), uv=ds.uv,
            d=jnp.where(is_const[..., None], d_c, ds.d),
            dist=jnp.where(is_const, jnp.float32(1e7), ds.dist),
            pdf=jnp.where(is_const, pick_pdf * warp.INV_FOUR_PI, ds.pdf),
            delta=ds.delta,
            emitter=jnp.where(is_const, e_idx, ds.emitter))
        val = jnp.where(is_const[..., None], radiance_c, val)
    return ds, val


def _sample_envmap(scene, ref_p, wavelengths, e_idx, etype, u2, pick_pdf,
                   ds, val, config):
    """Importance-sample the envmap's luminance table (envmap.cpp::
    sample_direction via Marginal2D)."""
    env = scene.envmap
    is_env = etype == ENVMAP
    uv, pdf_uv = env.distr.sample(u2)
    d_w = _envmap_uv_to_dir(env, uv)
    sin_theta = jnp.sin(uv[..., 1] * jnp.pi)
    pdf_sa = pick_pdf * pdf_uv / jnp.maximum(
        2.0 * jnp.pi * jnp.pi * sin_theta, 1e-20)
    rgb = _envmap_bilinear(env, uv)
    radiance = _tex_value(rgb, wavelengths, config.color_mode)
    ok = is_env & (pdf_sa > 0) & (sin_theta > 0)
    ds = DirectionSample(
        p=jnp.where(ok[..., None], ref_p + d_w * _INF_DIST, ds.p),
        n=jnp.where(ok[..., None], -d_w, ds.n),
        uv=jnp.where(ok[..., None], uv, ds.uv),
        d=jnp.where(ok[..., None], d_w, ds.d),
        dist=jnp.where(ok, jnp.float32(_INF_DIST), ds.dist),
        pdf=jnp.where(ok, pdf_sa, ds.pdf),
        delta=ds.delta,
        emitter=jnp.where(ok, e_idx, ds.emitter))
    val = jnp.where(ok[..., None], radiance, val)
    return ds, val


def _sample_spot(scene, ref_p, wavelengths, e_idx, etype, row, pick_pdf,
                 ds, val, config):
    """Spot light (emitters/spot.cpp): delta position, linear angular
    falloff between beam_width and cutoff_angle."""
    is_spot = etype == SPOT
    p_l = row[..., 8:11]
    spot_d = row[..., 11:14]
    cos_cutoff = row[..., 14]
    cos_beam = row[..., 15]
    d_vec = p_l - ref_p
    dist2 = jnp.sum(d_vec * d_vec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    d_unit = d_vec / dist[..., None]
    cos_a = dot(spot_d, -d_unit)  # angle between spot axis and ray to ref
    falloff = jnp.clip((cos_a - cos_cutoff) /
                       jnp.maximum(cos_beam - cos_cutoff, 1e-8), 0.0, 1.0)
    intensity = eval_spectrum_slot(row[..., 0:SLOT_W], wavelengths,
                                   config.color_mode)
    v = intensity * (falloff / jnp.maximum(dist2, 1e-20))[..., None]
    ok = is_spot & (cos_a > cos_cutoff)
    ds = DirectionSample(
        p=jnp.where(is_spot[..., None], p_l, ds.p),
        n=jnp.where(is_spot[..., None], spot_d, ds.n), uv=ds.uv,
        d=jnp.where(is_spot[..., None], d_unit, ds.d),
        dist=jnp.where(is_spot, dist, ds.dist),
        pdf=jnp.where(ok, pick_pdf, jnp.where(is_spot, 0.0, ds.pdf)),
        delta=jnp.where(is_spot, True, ds.delta),
        emitter=jnp.where(is_spot, e_idx, ds.emitter))
    val = jnp.where(ok[..., None], v, jnp.where(is_spot[..., None], 0.0, val))
    return ds, val


def _sample_directional(scene, ref_p, wavelengths, e_idx, etype, row,
                        pick_pdf, ds, val, config):
    """Directional sun-style emitter (emitters/directional.cpp): delta
    direction; `irradiance` is the power through a unit surface facing it."""
    is_dir = etype == DIRECTIONAL
    e_d = row[..., 11:14]  # direction light TRAVELS
    d_unit = -e_d
    irradiance = eval_spectrum_slot(row[..., 0:SLOT_W], wavelengths,
                                    config.color_mode)
    ds = DirectionSample(
        p=jnp.where(is_dir[..., None], ref_p + d_unit * _INF_DIST, ds.p),
        n=jnp.where(is_dir[..., None], e_d, ds.n), uv=ds.uv,
        d=jnp.where(is_dir[..., None], d_unit, ds.d),
        dist=jnp.where(is_dir, jnp.float32(_INF_DIST), ds.dist),
        pdf=jnp.where(is_dir, pick_pdf, ds.pdf),
        delta=jnp.where(is_dir, True, ds.delta),
        emitter=jnp.where(is_dir, e_idx, ds.emitter))
    val = jnp.where(is_dir[..., None], irradiance, val)
    return ds, val


def pdf_direction_hit(scene, ref_p, si_hit, config) -> jnp.ndarray:
    """Scene::pdf_emitter_direction for a BSDF-sampled ray that HIT an
    emissive surface: solid-angle NEE pdf of that direction (for MIS)."""
    E = scene.n_emitters
    if E == 0:
        return jnp.zeros(ref_p.shape[0], jnp.float32)
    e_idx = scene.shape_emitter[jnp.maximum(si_hit.shape, 0)]
    valid = si_hit.valid & (si_hit.shape >= 0) & (e_idx >= 0)
    area = scene.emitter_area[jnp.maximum(e_idx, 0)]
    d_vec = si_hit.p - ref_p
    dist2 = jnp.sum(d_vec * d_vec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    cos_e = dot(si_hit.n, -d_vec / dist[..., None])
    pdf = (1.0 / E) * dist2 / jnp.maximum(cos_e * area, 1e-20)
    return jnp.where(valid & (cos_e > 0), pdf, 0.0)


def pdf_direction_env(scene, config, d_world) -> jnp.ndarray:
    """NEE pdf for a BSDF ray that escaped to the environment (for MIS)."""
    n_lanes = d_world.shape[0]
    E = scene.n_emitters
    if E == 0 or scene.env_emitter < 0:
        return jnp.zeros(n_lanes, jnp.float32)
    if scene.envmap is not None:
        env = scene.envmap
        uv = _envmap_dir_to_uv(env, d_world)
        pdf_uv = env.distr.eval_pdf(uv)
        sin_theta = jnp.sin(uv[..., 1] * jnp.pi)
        return pdf_uv / jnp.maximum(
            2.0 * jnp.pi * jnp.pi * sin_theta, 1e-20) / E
    return jnp.full(n_lanes, warp.INV_FOUR_PI / E, jnp.float32)

"""Measured (data-driven) BSDF.

TPU-native rebuild of mitsuba2's `measured` plugin (src/bsdfs/measured.cpp,
the Dupuy-Jakob 2018 adaptive BRDF parameterization backed by Marginal2D
warping). The reference streams .bsdf files produced by their capture
pipeline; this implementation keeps the same machinery — tabulated
f(theta_i; theta_o, phi_d) * cos(theta_o) slices importance-sampled by a
per-incident-angle 2D marginal CDF — over a plain array table, so it can
load ANY tabulated isotropic BRDF (including ones baked from our analytic
models via `tabulate_bsdf`, which is also how the tests verify it against
the ground-truth model).

Table layout (isotropic BRDF assumption, phi_d = phi_o - phi_i):
    values:   (n_ti, n_to, n_phi, 3)  f*cos over the outgoing hemisphere
    marg_cdf: (n_ti, n_to)            cumulative row (theta_o) luminance
    cond_cdf: (n_ti, n_to, n_phi)     within-row cumulative
grid axes: theta_i, theta_o uniform in [0, pi/2]; phi_d uniform in [0, 2pi).
The sin(theta_o) solid-angle factor is folded INTO the tabulated sampling
weights so CDF inversion samples (theta_o, phi_d) directly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.geometry import Frame
from ..core.vec import Vec3


@struct.dataclass
class MeasuredData:
    values: jnp.ndarray    # (T, n_ti, n_to, n_phi, 3) f*cos
    weights: jnp.ndarray   # (T, n_ti, n_to, n_phi) sampling density (lum*sin)
    marg_cdf: jnp.ndarray  # (T, n_ti, n_to)
    cond_cdf: jnp.ndarray  # (T, n_ti, n_to, n_phi)
    # measured_polarized (src/bsdfs/measured_polarized.cpp): per-cell
    # intensity-normalized Mueller matrices (m00 = 1); None when the scene
    # has no polarized captures. The intensity table above stays the
    # radiometric/sampling authority, matching the reference's split of
    # pBSDF data into a scalar spectrum and a polarization structure.
    mueller: jnp.ndarray = None  # (T, n_ti, n_to, n_phi, 4, 4)


# --- host build staging (scene.build_scene activates) -----------------------
_STAGING = None


def begin_staging() -> list:
    global _STAGING
    _STAGING = []
    return _STAGING


def end_staging() -> list:
    global _STAGING
    staged, _STAGING = _STAGING, None
    return staged


def stage_table(table: np.ndarray, mueller: np.ndarray = None) -> int:
    if _STAGING is None:
        raise RuntimeError("measured bsdf outside scene build")
    _STAGING.append((np.asarray(table, np.float32),
                     None if mueller is None
                     else np.asarray(mueller, np.float32)))
    return len(_STAGING) - 1


def bake_from_desc(desc: dict, n_ti=32, n_to=64, n_phi=64) -> np.ndarray:
    """Tabulate one of the analytic BSDF families into a measured table
    (capture-pipeline stand-in; also the test oracle path)."""
    from . import bsdf as bsdf_mod
    from .interaction import SurfaceInteraction
    from ..config import RenderConfig

    mats = []
    idx = bsdf_mod.build_material(desc, mats)
    mtype, _, row = mats[idx]
    cls = bsdf_mod.LEAF_FAMILIES[mtype]
    cfg = RenderConfig(color_mode="rgb")

    def eval_fn(wi, wo):
        from ..core.vec import Vec2
        from .spectra import LaneRows
        n = wi.shape[0]
        up = Vec3.full((n,), 0.0, 0.0, 1.0)
        si = SurfaceInteraction(
            valid=jnp.ones(n, bool), t=jnp.ones(n), p=Vec3.zeros((n,)),
            n=up, sh_frame=Frame.from_n(up),
            uv=Vec2.zeros((n,)), wi=Vec3.from_array(wi),
            shape=jnp.zeros(n, jnp.int32),
            prim_index=jnp.zeros(n, jnp.int32),
            wavelengths=None)
        data = LaneRows.broadcast(jnp.asarray(row), n)
        return cls.eval(data, si, Vec3.from_array(wo), cfg).to_array()

    return tabulate_bsdf(eval_fn, n_ti, n_to, n_phi)


def build_measured(tables) -> MeasuredData:
    """tables: list of (n_ti, n_to, n_phi, 3) f*cos arrays, or of
    (values, mueller-or-None) staging tuples."""
    entries = [(t, None) if not isinstance(t, tuple) else t for t in tables]
    vals = np.stack([np.asarray(t, np.float32) for t, _ in entries])
    T, n_ti, n_to, n_phi, _ = vals.shape
    lum = vals @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    theta_o = (np.arange(n_to) + 0.5) / n_to * (np.pi / 2)
    w = lum * np.sin(theta_o)[None, None, :, None]
    w = np.maximum(w, 1e-12)
    cond = np.cumsum(w, axis=-1)
    marg = np.cumsum(cond[..., -1], axis=-1)
    mueller = None
    if any(m is not None for _, m in entries):
        ident = np.zeros((n_ti, n_to, n_phi, 4, 4), np.float32)
        ident[..., 0, 0] = 1.0  # pure depolarizer for unpolarized entries
        mueller = jnp.asarray(np.stack(
            [ident if m is None else np.asarray(m, np.float32)
             for _, m in entries]))
    return MeasuredData(values=jnp.asarray(vals), weights=jnp.asarray(w),
                        marg_cdf=jnp.asarray(marg),
                        cond_cdf=jnp.asarray(cond), mueller=mueller)


def tabulate_bsdf(eval_fn, n_ti=32, n_to=64, n_phi=64) -> np.ndarray:
    """Bake an analytic BSDF into a measured table.

    eval_fn(wi (N,3), wo (N,3)) -> (N, 3) f*cos values (local frame)."""
    ti = (np.arange(n_ti) + 0.5) / n_ti * (np.pi / 2)
    to = (np.arange(n_to) + 0.5) / n_to * (np.pi / 2)
    ph = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    TI, TO, PH = np.meshgrid(ti, to, ph, indexing="ij")
    wi = np.stack([np.sin(TI), np.zeros_like(TI), np.cos(TI)], -1)
    wo = np.stack([np.sin(TO) * np.cos(PH), np.sin(TO) * np.sin(PH),
                   np.cos(TO)], -1)
    vals = np.asarray(eval_fn(jnp.asarray(wi.reshape(-1, 3), jnp.float32),
                              jnp.asarray(wo.reshape(-1, 3), jnp.float32)))
    return vals.reshape(n_ti, n_to, n_phi, 3)


# ---------------------------------------------------------------------------
# Device evaluation / sampling (lane-batched over the wavefront)
# ---------------------------------------------------------------------------

def _angles(md: MeasuredData):
    _, n_ti, n_to, n_phi = md.weights.shape
    return n_ti, n_to, n_phi


def _grid_lookup(md: MeasuredData, tid, wi, wo):
    """Trilinear-ish (nearest theta_i, bilinear theta_o/phi) table read.
    Returns ((N, 3) f*cos, (N,) sampling pdf over (to, phi) cells)."""
    n_ti, n_to, n_phi = _angles(md)
    wi = wi if isinstance(wi, Vec3) else Vec3.from_array(wi)
    wo = wo if isinstance(wo, Vec3) else Vec3.from_array(wo)
    theta_i = jnp.arccos(jnp.clip(wi.z, 1e-6, 1.0))
    theta_o = jnp.arccos(jnp.clip(wo.z, 0.0, 1.0))
    phi_i = jnp.arctan2(wi.y, wi.x)
    phi_o = jnp.arctan2(wo.y, wo.x)
    phi_d = jnp.remainder(phi_o - phi_i, 2 * jnp.pi)

    i_ti = jnp.clip((theta_i / (jnp.pi / 2) * n_ti).astype(jnp.int32),
                    0, n_ti - 1)
    x_to = jnp.clip(theta_o / (jnp.pi / 2) * n_to - 0.5, 0.0, n_to - 1.0)
    x_ph = phi_d / (2 * jnp.pi) * n_phi - 0.5
    i_to = jnp.clip(jnp.floor(x_to).astype(jnp.int32), 0, n_to - 2)
    f_to = x_to - i_to
    i_ph = jnp.floor(x_ph).astype(jnp.int32)
    f_ph = x_ph - i_ph

    flat_vals = md.values.reshape(-1, 3)

    def read(d_to, d_ph):
        # flat ROW gather + slices (kernels/gather.py: per-column and
        # multi-dim-index gathers lower to the scalar core)
        ito = jnp.clip(i_to + d_to, 0, n_to - 1)
        iph = jnp.remainder(i_ph + d_ph, n_phi)
        r = flat_vals[((tid * n_ti + i_ti) * n_to + ito) * n_phi + iph]
        return r[..., 0], r[..., 1], r[..., 2]

    from ..core.spec import Spec
    r00, r01 = read(0, 0), read(0, 1)
    r10, r11 = read(1, 0), read(1, 1)
    val = Spec(tuple(
        r00[c] * ((1 - f_to) * (1 - f_ph)) + r01[c] * ((1 - f_to) * f_ph) +
        r10[c] * (f_to * (1 - f_ph)) + r11[c] * (f_to * f_ph)
        for c in range(3)))

    # sampling pdf of the piecewise-constant importance table
    iph0 = jnp.remainder(jnp.round(x_ph).astype(jnp.int32), n_phi)
    ito0 = jnp.clip(jnp.round(x_to).astype(jnp.int32), 0, n_to - 1)
    w_cell = md.weights.reshape(-1)[
        ((tid * n_ti + i_ti) * n_to + ito0) * n_phi + iph0]
    total = md.marg_cdf.reshape(-1)[(tid * n_ti + i_ti) * n_to + (n_to - 1)]
    pdf_cell = w_cell / jnp.maximum(total, 1e-20)  # prob of the cell
    # (theta_o, phi_d) cell area -> solid angle: dOmega = sin(to) dto dphi
    dto = (jnp.pi / 2) / n_to
    dph = (2 * jnp.pi) / n_phi
    sin_to = jnp.maximum(jnp.sin(theta_o), 1e-6)
    pdf_sa = pdf_cell / (dto * dph * sin_to)
    return val, pdf_sa


def eval_measured(md: MeasuredData, tid, wi, wo):
    """f*cos Spec for wi, wo in the local frame (zero below the horizon)."""
    wi = wi if isinstance(wi, Vec3) else Vec3.from_array(wi)
    wo = wo if isinstance(wo, Vec3) else Vec3.from_array(wo)
    val, _ = _grid_lookup(md, tid, wi, wo)
    up = (wi.z > 0) & (wo.z > 0)
    return val.masked(up)


def pdf_measured(md: MeasuredData, tid, wi, wo):
    wi = wi if isinstance(wi, Vec3) else Vec3.from_array(wi)
    wo = wo if isinstance(wo, Vec3) else Vec3.from_array(wo)
    _, pdf = _grid_lookup(md, tid, wi, wo)
    up = (wi.z > 0) & (wo.z > 0)
    return jnp.where(up, pdf, 0.0)


def sample_measured(md: MeasuredData, tid, wi, u2):
    """Importance-sample (theta_o, phi_d) by 2D CDF inversion per
    theta_i slice (the Marginal2D warp of measured.cpp)."""
    n_ti, n_to, n_phi = _angles(md)
    wi = wi if isinstance(wi, Vec3) else Vec3.from_array(wi)
    theta_i = jnp.arccos(jnp.clip(wi.z, 1e-6, 1.0))
    i_ti = jnp.clip((theta_i / (jnp.pi / 2) * n_ti).astype(jnp.int32),
                    0, n_ti - 1)

    def bisect(flat, base, width, target):
        """Per-lane lower-bound bisection: first k in [0, width) with
        flat[base + k] >= target — (N,) gathers, no (N, width) rows."""
        lo = jnp.zeros_like(base)
        hi = jnp.full_like(base, width)
        for _ in range(int(np.ceil(np.log2(max(width, 2)))) + 1):
            mid = (lo + hi) // 2
            go_right = flat[base + mid] < target
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        return lo

    flat_marg = md.marg_cdf.reshape(-1)
    flat_cond = md.cond_cdf.reshape(-1)
    marg_base = (tid * n_ti + i_ti) * n_to
    total = flat_marg[marg_base + (n_to - 1)]
    if isinstance(u2, (tuple, list)):
        u2a, u2b = u2
    elif hasattr(u2, "x"):
        u2a, u2b = u2.x, u2.y
    else:
        u2a, u2b = u2[..., 0], u2[..., 1]
    t_r = u2b * total
    row = jnp.clip(bisect(flat_marg, marg_base, n_to, t_r), 0, n_to - 1)
    marg_lo = jnp.where(row > 0,
                        flat_marg[marg_base + jnp.maximum(row - 1, 0)], 0.0)
    row_sum = flat_marg[marg_base + row] - marg_lo
    ur = jnp.clip((t_r - marg_lo) / jnp.maximum(row_sum, 1e-20), 0.0,
                  1.0 - 1e-7)
    cond_base = ((tid * n_ti + i_ti) * n_to + row) * n_phi
    t_c = u2a * row_sum
    col = jnp.clip(bisect(flat_cond, cond_base, n_phi, t_c), 0, n_phi - 1)
    cond_lo = jnp.where(col > 0,
                        flat_cond[cond_base + jnp.maximum(col - 1, 0)], 0.0)
    cell = flat_cond[cond_base + col] - cond_lo
    uc = jnp.clip((t_c - cond_lo) / jnp.maximum(cell, 1e-20), 0.0, 1.0 - 1e-7)

    theta_o = (row + ur) / n_to * (jnp.pi / 2)
    phi_d = (col + uc) / n_phi * (2 * jnp.pi)
    phi_i = jnp.arctan2(wi.y, wi.x)
    phi_o = phi_i + phi_d
    st, ct = jnp.sin(theta_o), jnp.cos(theta_o)
    wo = Vec3(st * jnp.cos(phi_o), st * jnp.sin(phi_o), ct)

    pdf_cell = cell / jnp.maximum(total, 1e-20)
    dto = (jnp.pi / 2) / n_to
    dph = (2 * jnp.pi) / n_phi
    pdf_sa = pdf_cell / (dto * dph * jnp.maximum(st, 1e-6))
    pdf_sa = jnp.where((total > 0) & (wi.z > 0), pdf_sa, 0.0)
    return wo, pdf_sa


# ---------------------------------------------------------------------------
# measured_polarized (src/bsdfs/measured_polarized.cpp): Mueller structure
# ---------------------------------------------------------------------------

def bake_mueller_conductor(eta_re: float, eta_im: float,
                           n_ti=32, n_to=64, n_phi=64) -> np.ndarray:
    """Intensity-normalized conductor-Fresnel Mueller matrices on the
    measured grid, evaluated at the microfacet half angle of each
    (theta_i, theta_o, phi_d) cell — the pBSDF-style polarization
    structure for a metallic capture when no real pBSDF file is
    available (the reference streams these from its polarized capture
    setup; the offline stand-in derives them from the named conductor)."""
    from . import mueller as mu
    ti = (np.arange(n_ti) + 0.5) / n_ti * (np.pi / 2)
    to = (np.arange(n_to) + 0.5) / n_to * (np.pi / 2)
    ph = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    TI, TO, PH = np.meshgrid(ti, to, ph, indexing="ij")
    wi = np.stack([np.sin(TI), np.zeros_like(TI), np.cos(TI)], -1)
    wo = np.stack([np.sin(TO) * np.cos(PH), np.sin(TO) * np.sin(PH),
                   np.cos(TO)], -1)
    h = wi + wo
    h /= np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    cos_h = np.clip(np.abs((wi * h).sum(-1)), 1e-4, 1.0)
    m = np.asarray(mu.specular_reflection_conductor(
        jnp.asarray(cos_h.reshape(-1), jnp.float32),
        jnp.full(cos_h.size, eta_re, jnp.float32),
        jnp.full(cos_h.size, eta_im, jnp.float32)))
    m = m.reshape(n_ti, n_to, n_phi, 4, 4)
    return (m / np.maximum(m[..., 0:1, 0:1], 1e-12)).astype(np.float32)


def mueller_lookup(md: MeasuredData, tid, wi, wo):
    """Nearest-cell Mueller structure (N, 4, 4) at (wi, wo) local dirs."""
    n_ti, n_to, n_phi = _angles(md)
    wi = wi if isinstance(wi, Vec3) else Vec3.from_array(wi)
    wo = wo if isinstance(wo, Vec3) else Vec3.from_array(wo)
    theta_i = jnp.arccos(jnp.clip(wi.z, 1e-6, 1.0))
    theta_o = jnp.arccos(jnp.clip(wo.z, 0.0, 1.0))
    phi_d = jnp.remainder(jnp.arctan2(wo.y, wo.x) -
                          jnp.arctan2(wi.y, wi.x), 2 * jnp.pi)
    i_ti = jnp.clip((theta_i / (jnp.pi / 2) * n_ti).astype(jnp.int32),
                    0, n_ti - 1)
    i_to = jnp.clip((theta_o / (jnp.pi / 2) * n_to).astype(jnp.int32),
                    0, n_to - 1)
    i_ph = jnp.remainder((phi_d / (2 * jnp.pi) * n_phi).astype(jnp.int32),
                         n_phi)
    idx = ((tid * n_ti + i_ti) * n_to + i_to) * n_phi + i_ph
    return md.mueller.reshape(-1, 4, 4)[idx]  # row gather of (4,4) blocks

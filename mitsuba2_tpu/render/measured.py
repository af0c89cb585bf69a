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


@struct.dataclass
class MeasuredData:
    values: jnp.ndarray    # (T, n_ti, n_to, n_phi, 3) f*cos
    weights: jnp.ndarray   # (T, n_ti, n_to, n_phi) sampling density (lum*sin)
    marg_cdf: jnp.ndarray  # (T, n_ti, n_to)
    cond_cdf: jnp.ndarray  # (T, n_ti, n_to, n_phi)


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


def stage_table(table: np.ndarray) -> int:
    if _STAGING is None:
        raise RuntimeError("measured bsdf outside scene build")
    _STAGING.append(np.asarray(table, np.float32))
    return len(_STAGING) - 1


def bake_from_desc(desc: dict, n_ti=32, n_to=64, n_phi=64) -> np.ndarray:
    """Tabulate one of the analytic BSDF families into a measured table
    (capture-pipeline stand-in; also the test oracle path)."""
    from . import bsdf as bsdf_mod
    from .interaction import SurfaceInteraction
    from ..core.geometry import Frame
    from ..config import RenderConfig

    mats = []
    idx = bsdf_mod.build_material(desc, mats)
    mtype, _, row = mats[idx]
    cls = bsdf_mod.LEAF_FAMILIES[mtype]
    cfg = RenderConfig(color_mode="rgb")

    def eval_fn(wi, wo):
        n = wi.shape[0]
        z = jnp.zeros((n, 3), jnp.float32)
        si = SurfaceInteraction(
            valid=jnp.ones(n, bool), t=jnp.ones(n), p=z,
            n=jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (n, 3)),
            sh_frame=Frame.from_n(jnp.broadcast_to(
                jnp.asarray([0.0, 0, 1]), (n, 3))),
            uv=jnp.zeros((n, 2)), wi=wi,
            shape=jnp.zeros(n, jnp.int32),
            prim_index=jnp.zeros(n, jnp.int32),
            wavelengths=jnp.zeros((n, 0), jnp.float32))
        data = jnp.broadcast_to(jnp.asarray(row), (n, bsdf_mod.MAT_W))
        return cls.eval(data, si, wo, cfg)

    return tabulate_bsdf(eval_fn, n_ti, n_to, n_phi)


def build_measured(tables) -> MeasuredData:
    """tables: list of (n_ti, n_to, n_phi, 3) arrays of f*cos values."""
    vals = np.stack([np.asarray(t, np.float32) for t in tables])
    T, n_ti, n_to, n_phi, _ = vals.shape
    lum = vals @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    theta_o = (np.arange(n_to) + 0.5) / n_to * (np.pi / 2)
    w = lum * np.sin(theta_o)[None, None, :, None]
    w = np.maximum(w, 1e-12)
    cond = np.cumsum(w, axis=-1)
    marg = np.cumsum(cond[..., -1], axis=-1)
    return MeasuredData(values=jnp.asarray(vals), weights=jnp.asarray(w),
                        marg_cdf=jnp.asarray(marg),
                        cond_cdf=jnp.asarray(cond))


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
    theta_i = jnp.arccos(jnp.clip(Frame.cos_theta(wi), 1e-6, 1.0))
    theta_o = jnp.arccos(jnp.clip(Frame.cos_theta(wo), 0.0, 1.0))
    phi_i = jnp.arctan2(wi[..., 1], wi[..., 0])
    phi_o = jnp.arctan2(wo[..., 1], wo[..., 0])
    phi_d = jnp.remainder(phi_o - phi_i, 2 * jnp.pi)

    i_ti = jnp.clip((theta_i / (jnp.pi / 2) * n_ti).astype(jnp.int32),
                    0, n_ti - 1)
    x_to = jnp.clip(theta_o / (jnp.pi / 2) * n_to - 0.5, 0.0, n_to - 1.0)
    x_ph = phi_d / (2 * jnp.pi) * n_phi - 0.5
    i_to = jnp.clip(jnp.floor(x_to).astype(jnp.int32), 0, n_to - 2)
    f_to = x_to - i_to
    i_ph = jnp.floor(x_ph).astype(jnp.int32)
    f_ph = x_ph - i_ph

    def read(d_to, d_ph):
        ito = jnp.clip(i_to + d_to, 0, n_to - 1)
        iph = jnp.remainder(i_ph + d_ph, n_phi)
        return md.values[tid, i_ti, ito, iph]

    val = (read(0, 0) * ((1 - f_to) * (1 - f_ph))[..., None] +
           read(0, 1) * ((1 - f_to) * f_ph)[..., None] +
           read(1, 0) * (f_to * (1 - f_ph))[..., None] +
           read(1, 1) * (f_to * f_ph)[..., None])

    # sampling pdf of the piecewise-constant importance table
    iph0 = jnp.remainder(jnp.round(x_ph).astype(jnp.int32), n_phi)
    ito0 = jnp.clip(jnp.round(x_to).astype(jnp.int32), 0, n_to - 1)
    w_cell = md.weights[tid, i_ti, ito0, iph0]
    total = md.marg_cdf[tid, i_ti, -1]
    pdf_cell = w_cell / jnp.maximum(total, 1e-20)  # prob of the cell
    # (theta_o, phi_d) cell area -> solid angle: dOmega = sin(to) dto dphi
    dto = (jnp.pi / 2) / n_to
    dph = (2 * jnp.pi) / n_phi
    sin_to = jnp.maximum(jnp.sin(theta_o), 1e-6)
    pdf_sa = pdf_cell / (dto * dph * sin_to)
    return val, pdf_sa


def eval_measured(md: MeasuredData, tid, wi, wo):
    """f*cos for wi, wo in the local frame (zero below the horizon)."""
    val, _ = _grid_lookup(md, tid, wi, wo)
    up = (Frame.cos_theta(wi) > 0) & (Frame.cos_theta(wo) > 0)
    return jnp.where(up[..., None], val, 0.0)


def pdf_measured(md: MeasuredData, tid, wi, wo):
    _, pdf = _grid_lookup(md, tid, wi, wo)
    up = (Frame.cos_theta(wi) > 0) & (Frame.cos_theta(wo) > 0)
    return jnp.where(up, pdf, 0.0)


def sample_measured(md: MeasuredData, tid, wi, u2):
    """Importance-sample (theta_o, phi_d) by 2D CDF inversion per
    theta_i slice (the Marginal2D warp of measured.cpp)."""
    n_ti, n_to, n_phi = _angles(md)
    theta_i = jnp.arccos(jnp.clip(Frame.cos_theta(wi), 1e-6, 1.0))
    i_ti = jnp.clip((theta_i / (jnp.pi / 2) * n_ti).astype(jnp.int32),
                    0, n_ti - 1)
    marg = md.marg_cdf[tid, i_ti]          # (N, n_to)
    total = marg[..., -1]
    t_r = u2[..., 1] * total
    row = jnp.clip(jnp.sum((marg < t_r[..., None]).astype(jnp.int32), -1),
                   0, n_to - 1)
    marg_lo = jnp.where(row > 0,
                        jnp.take_along_axis(marg, jnp.maximum(row - 1, 0)[..., None],
                                            -1)[..., 0], 0.0)
    row_sum = jnp.take_along_axis(marg, row[..., None], -1)[..., 0] - marg_lo
    ur = jnp.clip((t_r - marg_lo) / jnp.maximum(row_sum, 1e-20), 0.0,
                  1.0 - 1e-7)
    cond = md.cond_cdf[tid, i_ti, row]     # (N, n_phi)
    t_c = u2[..., 0] * row_sum
    col = jnp.clip(jnp.sum((cond < t_c[..., None]).astype(jnp.int32), -1),
                   0, n_phi - 1)
    cond_lo = jnp.where(col > 0,
                        jnp.take_along_axis(cond, jnp.maximum(col - 1, 0)[..., None],
                                            -1)[..., 0], 0.0)
    cell = jnp.take_along_axis(cond, col[..., None], -1)[..., 0] - cond_lo
    uc = jnp.clip((t_c - cond_lo) / jnp.maximum(cell, 1e-20), 0.0, 1.0 - 1e-7)

    theta_o = (row + ur) / n_to * (jnp.pi / 2)
    phi_d = (col + uc) / n_phi * (2 * jnp.pi)
    phi_i = jnp.arctan2(wi[..., 1], wi[..., 0])
    phi_o = phi_i + phi_d
    st, ct = jnp.sin(theta_o), jnp.cos(theta_o)
    wo = jnp.stack([st * jnp.cos(phi_o), st * jnp.sin(phi_o), ct], -1)

    pdf_cell = cell / jnp.maximum(total, 1e-20)
    dto = (jnp.pi / 2) / n_to
    dph = (2 * jnp.pi) / n_phi
    pdf_sa = pdf_cell / (dto * dph * jnp.maximum(st, 1e-6))
    pdf_sa = jnp.where((total > 0) & (Frame.cos_theta(wi) > 0), pdf_sa, 0.0)
    return wo, pdf_sa

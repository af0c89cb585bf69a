"""`stokes` integrator: polarized direct illumination.

TPU-native rebuild of mitsuba2's polarized rendering surface: the
`_polarized` variants carry Mueller-matrix-valued spectra through
transport and the `stokes` AOV plugin (src/integrators/stokes.cpp)
exposes the resulting Stokes components. This implementation covers the
polarized DIRECT transport slice:

- camera ray -> first hit;
- smooth conductors/dielectrics reflect the incident (emitter/environment)
  radiance through the polarized Fresnel Mueller matrix, with Stokes
  reference-basis rotations into and out of the scattering plane
  (mueller.py::rotate_stokes_basis);
- rough/diffuse surfaces depolarize (their Stokes output is (I, 0, 0, 0)
  with I from the scalar direct-illumination estimator).

Multi-bounce polarized transport composes the same operators along the
path; it reuses these building blocks when needed. Output: (H, W, 4)
channel-averaged Stokes images (S0 = the usual radiance).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core.geometry import Frame, dot, normalize
from ..core.vec import Vec3, vdot, vnormalize, vcross, vsqnorm, vwhere
from . import bsdf as bsdf_mod
from . import emitters, mueller as mu, sensors
from .sampler import Sampler


def _specular_stokes(scene, si, ray_d, config):
    """Stokes radiance reflected toward the camera by a smooth specular
    first hit (conductor or dielectric reflection lobe)."""
    from ..scene import scene as scene_mod
    n = si.sh_frame.n
    wi_world = -ray_d
    cos_i = vdot(n, wi_world)
    # mirror direction
    wr = vnormalize(n * (2.0 * cos_i) - wi_world)

    # incident radiance along wr (emitter hit or environment), unpolarized
    refl_ray = si.spawn_ray_d(wr)
    si_r = scene_mod.ray_intersect(scene, refl_ray)
    from ..core.spec import swhere
    L_hit = emitters.eval_hit(scene, si_r, config)
    L_env = emitters.eval_env(scene, wr, si.wavelengths, config)
    L = swhere(si_r.valid, L_hit, L_env)
    I_in = L.hmean()  # channel-averaged intensity

    # Mueller matrix of the Fresnel reflection in the scattering plane
    mtype, mdata, _ = bsdf_mod._lane_materials(scene, si)
    cos_c = jnp.clip(jnp.abs(cos_i), 1e-4, 1.0)
    # conductor: complex IOR from slots 0/1 (channel-averaged)
    eta_re = (mdata.col(0) + mdata.col(1) + mdata.col(2)) * (1.0 / 3.0)
    eta_im = (mdata.col(8) + mdata.col(9) + mdata.col(10)) * (1.0 / 3.0)
    m_cond = mu.specular_reflection_conductor(cos_c, eta_re, eta_im)
    # dielectric: scalar eta at col 24
    m_diel = mu.specular_reflection_dielectric(cos_c, mdata.col(24))
    is_cond = (mtype == bsdf_mod.CONDUCTOR)
    m_f = jnp.where(is_cond[..., None, None], m_cond, m_diel)

    # Stokes bases: canonical basis of -wi (toward surface) and wr, rotated
    # into the scattering plane (s = perpendicular to plane of incidence)
    wi_a = (-wi_world).to_array()
    wr_a = wr.to_array()
    plane_n = jnp.cross(wi_a, wr_a)
    degenerate = jnp.sum(plane_n * plane_n, axis=-1) < 1e-12
    s_axis = jnp.where(degenerate[..., None],
                       mu.stokes_basis(wi_a), normalize(plane_n))
    b_in = mu.stokes_basis(wi_a)   # incident beam travels along -wi
    b_out = mu.stokes_basis(wr_a)
    r_in = mu.rotate_stokes_basis(wi_a, b_in, s_axis)
    r_out = mu.rotate_stokes_basis(wr_a, s_axis, b_out)
    M = r_out @ m_f @ r_in

    s_in = mu.unpolarized_intensity(I_in)
    s_out = (M @ s_in[..., None])[..., 0]
    return s_out


def _diffuse_intensity(scene, si, sampler, config):
    """Scalar direct illumination at si via one NEE sample (depolarized)."""
    from ..scene import scene as scene_mod
    u1, sampler = sampler.next_1d()
    u2, sampler = sampler.next_2d()
    ds, e_val = emitters.sample_direction(scene, si.p, si.wavelengths,
                                          u1, u2, config)
    shadow = si.spawn_ray_d(ds.d, maxt=ds.dist * (1 - 1e-3))
    occ = scene_mod.ray_test(scene, shadow)
    wo_local = si.to_local(ds.d)
    f_val = bsdf_mod.eval_(scene, si, wo_local, config)
    contrib = e_val * f_val / jnp.maximum(ds.pdf, 1e-20)
    ok = si.valid & (ds.pdf > 0) & ~occ
    I = contrib.masked(ok).hmean()
    # plus directly visible emission
    I = I + emitters.eval_hit(scene, si, config).hmean()
    return I, sampler


@partial(jax.jit, static_argnames=("config",))
def _stokes_pass(scene, config, seed):
    from ..scene import scene as scene_mod
    H, W = config.height, config.width
    sppc = config.spp_per_pass
    n = sppc * H * W
    lane = jnp.arange(n, dtype=jnp.uint32)
    sampler = Sampler.seed(seed, lane_idx=lane)
    pix = jnp.arange(n, dtype=jnp.int32) % (H * W)
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    jitter, sampler = sampler.next_2d()
    uv = sensors.film_uv(x, y, jitter, W, H)
    ray = sensors.sample_ray(scene, uv, None, None)

    si = scene_mod.ray_intersect(scene, ray)
    flags = bsdf_mod.lane_flags(scene, si)
    is_delta = si.valid & ((flags & bsdf_mod.F_DELTA_R) != 0)

    s_spec = _specular_stokes(scene, si, ray.d, config)
    I_diff, sampler = _diffuse_intensity(scene, si, sampler, config)
    I_env = emitters.eval_env(scene, ray.d, ray.wavelengths, config).hmean()
    s_diff = mu.unpolarized_intensity(jnp.where(si.valid, I_diff, I_env))

    s = jnp.where(is_delta[..., None], s_spec, s_diff)
    return s.reshape(sppc, H, W, 4).mean(0)


def render_stokes(scene, config: RenderConfig, seed: int = None) -> jnp.ndarray:
    """(H, W, 4) Stokes image of polarized direct illumination."""
    if seed is None:
        seed = config.seed
    sppc = min(config.spp_per_pass, config.spp)
    config = config.replace(spp_per_pass=sppc)
    n_passes = (config.spp + sppc - 1) // sppc
    acc = None
    for p in range(n_passes):
        img = _stokes_pass(scene, config,
                           jnp.uint32((seed * 0x9E3779B1 + p) & 0xFFFFFFFF))
        acc = img if acc is None else acc + img
    return acc / n_passes


# ===========================================================================
# Full polarized path transport (the `_polarized` variants)
# ===========================================================================
#
# The reference's polarized variants make Spectrum a Mueller-matrix-valued
# quantity and compose interaction matrices along the path with Stokes
# reference-frame rotations (mueller.h). This integrator does exactly that
# over the wavefront: per-lane, per-channel Mueller throughput
# (N, C, 4, 4), composed camera -> light, applied to unpolarized emission
# at path ends. Sampling decisions reuse the SCALAR BSDF machinery (same
# importance sampling); each vertex's Mueller matrix is intensity-
# normalized and scaled by the scalar sample weight, so the S0 component
# of the result matches the scalar BSDF-sampling path tracer exactly.
#
# Material polarization models (matching the reference's coverage):
# - smooth conductor:   polarized Fresnel reflection (per-channel complex IOR)
# - smooth dielectric:  polarized Fresnel reflection / transmission
# - polarizer/retarder: ideal elements, straight-through transmission,
#                       axis angle theta measured in the canonical Stokes
#                       basis of the (unchanged) propagation direction
# - everything else:    ideal depolarizer (reference behavior for lobes
#                       without a polarized implementation)
#
# This is a pure BSDF-sampling path tracer (no NEE/MIS): polarized NEE
# requires Mueller-valued emitter sampling weights and is a follow-up.


def _mueller_at_vertex(scene, si, d_cam, bounce_d, b_weight, config):
    """Per-channel Mueller matrix (N, C, 4, 4) of the sampled interaction,
    normalized so its intensity gain equals the scalar sample weight."""
    mtype, mdata, _ = bsdf_mod._lane_materials(scene, si)
    N = jnp.shape(si.wi.z)[0]
    C = config.n_channels

    # propagation directions of the LIGHT: arrives along -bounce_d, leaves
    # toward the camera along -d_cam
    dir_in = (-bounce_d).to_array()
    dir_out = (-d_cam).to_array()

    # scattering-plane s-axis (perpendicular to the plane of incidence),
    # shared by both beams; degenerate at normal incidence
    plane_n = jnp.cross(dir_in, dir_out)
    degenerate = jnp.sum(plane_n * plane_n, axis=-1) < 1e-9
    s_axis = jnp.where(degenerate[..., None], mu.stokes_basis(dir_out),
                       normalize(plane_n))
    r_in = mu.rotate_stokes_basis(dir_in, mu.stokes_basis(dir_in), s_axis)
    r_out = mu.rotate_stokes_basis(dir_out, s_axis, mu.stokes_basis(dir_out))

    cos_i = jnp.clip(jnp.abs(Frame.cos_theta(si.wi)), 1e-4, 1.0)

    # --- per-channel element matrices, intensity-normalized ---------------
    def norm(m):
        return m / jnp.maximum(m[..., 0:1, 0:1], 1e-12)

    out = jnp.zeros((N, C, 4, 4), jnp.float32)
    # default: depolarizer (value 1; scalar weight scales below)
    depol = mu.depolarizer(jnp.ones((N,), jnp.float32))
    out = jnp.broadcast_to(depol[:, None], (N, C, 4, 4))

    fams = set(scene.mat_families)
    if bsdf_mod.CONDUCTOR in fams or bsdf_mod.ROUGHCONDUCTOR in fams:
        # complex IOR per channel from slots 0/1 (rgb cols)
        ms = []
        for c in range(min(C, 3)):
            eta_re = mdata.col(c)
            eta_im = mdata.col(8 + c)
            m_c = norm(mu.specular_reflection_conductor(cos_i, eta_re, eta_im))
            ms.append(m_c)
        while len(ms) < C:
            ms.append(ms[-1])
        m_cond = jnp.stack(ms, axis=1)
        sel = ((mtype == bsdf_mod.CONDUCTOR) |
               (mtype == bsdf_mod.ROUGHCONDUCTOR))
        out = jnp.where(sel[:, None, None, None], m_cond, out)
    if bsdf_mod.DIELECTRIC in fams or bsdf_mod.ROUGHDIELECTRIC in fams or \
            bsdf_mod.THINDIELECTRIC in fams:
        eta = mdata.col(24)
        # reflection vs transmission from the hemisphere relation
        reflected = (Frame.cos_theta(si.wi) *
                     Frame.cos_theta(si.to_local(bounce_d))) > 0
        m_refl = norm(mu.specular_reflection_dielectric(cos_i, eta))
        m_trans = norm(mu.specular_transmission_dielectric(cos_i, eta))
        m_diel = jnp.where(reflected[..., None, None], m_refl, m_trans)
        sel = ((mtype == bsdf_mod.DIELECTRIC) |
               (mtype == bsdf_mod.THINDIELECTRIC) |
               (mtype == bsdf_mod.ROUGHDIELECTRIC))
        out = jnp.where(sel[:, None, None, None], m_diel[:, None], out)
    if bsdf_mod.POLARIZER in fams:
        theta = mdata.col(24)
        t = mdata.col(25)
        m_pol = norm(mu.rotated_element(theta, mu.linear_polarizer(t)))
        out = jnp.where((mtype == bsdf_mod.POLARIZER)[:, None, None, None],
                        m_pol[:, None], out)
    if bsdf_mod.RETARDER in fams:
        theta = mdata.col(24)
        phase = mdata.col(25)
        m_ret = mu.rotated_element(theta, mu.linear_retarder(phase))
        out = jnp.where((mtype == bsdf_mod.RETARDER)[:, None, None, None],
                        m_ret[:, None], out)
    if bsdf_mod.MEASURED_POLARIZED in fams and \
            getattr(scene.measured, "mueller", None) is not None:
        # pBSDF polarization structure: tabulated per-cell Mueller
        # matrices (measured.py::mueller_lookup; already m00-normalized)
        from . import measured as measured_mod
        tid = mdata.col(28).astype(jnp.int32)
        m_meas = measured_mod.mueller_lookup(
            scene.measured, tid, si.wi, si.to_local(bounce_d))
        sel = mtype == bsdf_mod.MEASURED_POLARIZED
        out = jnp.where(sel[:, None, None, None], m_meas[:, None], out)

    # frame rotations (straight-through elements keep the canonical basis:
    # r_in/r_out are identity there since dir_in == dir_out)
    out = r_out[:, None] @ out @ r_in[:, None]

    # scale each channel by the scalar sample weight (couples importance
    # sampling + spectra; S0 then matches the scalar path tracer)
    w = b_weight.to_array()  # (N, C)
    return out * w[..., None, None]


def sample_path_polarized(scene, ray, sampler, config: RenderConfig):
    """BSDF-sampling polarized path tracer. Returns ((N, C, 4) Stokes
    radiance in the canonical basis of each camera ray, sampler)."""
    from ..scene import scene as scene_mod
    N = jnp.shape(ray.o.z)[0]
    C = config.n_channels
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, C, 4, 4))
    M_total = eye
    result = jnp.zeros((N, C, 4), jnp.float32)
    active = jnp.ones(N, bool)

    for depth in range(config.max_depth):
        si = scene_mod.ray_intersect(scene, ray)
        # emission reaching the camera through the accumulated Mueller chain
        L_hit = emitters.eval_hit(scene, si, config)
        L_env = emitters.eval_env(scene, ray.d, ray.wavelengths, config)
        from ..core.spec import swhere
        L = swhere(si.valid, L_hit, L_env).to_array()  # (N, C)
        contrib = M_total[..., :, 0] * L[..., None]    # unpolarized source
        result = result + jnp.where(active[:, None, None], contrib, 0.0)
        active = active & si.valid
        if depth == config.max_depth - 1:
            break

        u1, sampler = sampler.next_1d()
        u2, sampler = sampler.next_2d()
        bs, b_weight = bsdf_mod.sample(scene, si, u1, u2, config)
        bounce_d = si.to_world(bs.wo)
        M_v = _mueller_at_vertex(scene, si, ray.d, bounce_d, b_weight, config)
        M_total = jnp.where(active[:, None, None, None],
                            M_total @ M_v, M_total)
        active = active & (bs.pdf > 0)
        ray = si.spawn_ray_d(bounce_d)
        ray = ray.replace(maxt=jnp.where(active, jnp.inf, 0.0))
    return result, sampler


@partial(jax.jit, static_argnames=("config",))
def _polarized_pass(scene, config, seed):
    from ..core import spectrum as sp_mod
    from ..core.spec import Spec
    from .sampler import make_sampler
    H, W = config.height, config.width
    sppc = config.spp_per_pass
    n = sppc * H * W
    lane = jnp.arange(n, dtype=jnp.uint32)
    sampler = make_sampler(config.sampler, seed, lane, H * W, sppc)
    pix = jnp.arange(n, dtype=jnp.int32) % (H * W)
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    jitter, sampler = sampler.next_2d()
    uv = sensors.film_uv(x, y, jitter, W, H)
    if config.color_mode == "spectral":
        u_wl, sampler = sampler.next_1d()
        wl, wl_pdf = sp_mod.sample_hero_wavelengths_t(u_wl)
    else:
        wl = wl_pdf = None
    ray = sensors.sample_ray(scene, uv, None, wavelengths=wl)
    s, _ = sample_path_polarized(scene, ray, sampler, config)
    if config.color_mode == "spectral":
        # per-Stokes-component hero-sample -> sRGB integration
        s = jnp.stack([sp_mod.spectrum_to_srgb_t(
            Spec(tuple(s[:, c, i] for c in range(config.n_channels))),
            wl, wl_pdf).to_array() for i in range(4)], axis=-1)
    return s.reshape(sppc, H, W, s.shape[-2], s.shape[-1]).mean(0)


def render_polarized(scene, config: RenderConfig, seed: int = None):
    """Full polarized transport: (H, W, C, 4) per-channel Stokes image."""
    if seed is None:
        seed = config.seed
    sppc = min(config.spp_per_pass, config.spp)
    config = config.replace(spp_per_pass=sppc)
    n_passes = (config.spp + sppc - 1) // sppc
    acc = None
    for p in range(n_passes):
        img = _polarized_pass(scene, config,
                              jnp.uint32((seed * 0x9E3779B1 + p) & 0xFFFFFFFF))
        acc = img if acc is None else acc + img
    return acc / n_passes

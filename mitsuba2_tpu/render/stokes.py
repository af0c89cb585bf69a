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
from ..core.geometry import dot, normalize
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

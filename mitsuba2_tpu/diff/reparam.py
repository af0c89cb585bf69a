"""Reparameterized integrator: visibility (boundary) gradients.

TPU-native rebuild of the reference's `pathreparam` branch (Loubet,
Nimier-David & Jakob 2019, "Reparameterizing discontinuous integrands for
differentiable rendering" — SURVEY.md §3.3's KEY LIMITATION and M5).

Plain AD of a Monte-Carlo render misses the boundary term: moving an
occluder moves the DISCONTINUITY of the integrand, which pointwise
differentiation never sees (the traversal is detached; interior gradients
are zero for a pure translation). The fix is a change of variables
T(u, theta) that makes the discontinuity STATIONARY in the new domain:

    I(theta) = ∫ L(T(u, theta), theta) |det dT/du| du

Both factors are then differentiable pointwise. T is estimated per primary
ray from K auxiliary rays jittered around it (fixed low-discrepancy
offsets, so the estimator is deterministic): each auxiliary ray's hit
point FOLLOWS the geometry (hit positions are differentiable w.r.t. the
vertex tables at fixed barycentrics — scene.compute_surface_interaction),
and their harmonic-weighted mean direction is the warp field V. The
primal value of T(u) equals u (V enters only through its tangent:
d' = d + (V - stop_grad(V))), and |det dT/du| is estimated from the
film-space divergence of V via two jvp probes.

This module implements the reparameterized DIRECT (primary-visibility)
integrator — the config-5 validation case (occluder pose gradients).
The same `reparam_direction` transform applies to NEE/BSDF directions for
deeper boundary terms.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..core.geometry import Ray, normalize
from ..core.vec import Vec3, vdot, vnormalize, vcross, vwhere
from ..render import emitters, sensors
from ..render.sampler import Sampler

K_AUX = 16         # default auxiliary rays per primary ray
                   # (RenderConfig.reparam_kaux overrides; the measured
                   # K-vs-FD-error tradeoff lives in docs/TPU_TRAVERSAL.md)
KAPPA = 5e3        # vMF concentration of the warp kernel (aux samples
                   # spread over 3/sqrt(KAPPA); see warp_and_divergence)
_FAR = 1e4


def _aux_offsets(k: int = K_AUX):
    """Fixed unit-disk offsets (deterministic golden-angle spiral)."""
    i = np.arange(k) + 0.5
    r = np.sqrt(i / k)
    th = i * 2.399963229728653  # golden angle
    return jnp.asarray(np.stack([r * np.cos(th), r * np.sin(th)], -1),
                       jnp.float32)


def _follow_points_batched(scene, os_, ds_):
    """Differentiable 'followed' hit points of MANY rays in ONE traversal.

    os_/ds_ are equal-length lists of (N,)-planar Vec3; all rays are
    concatenated into a single (len*N,) wavefront and traced through ONE
    backend call (`scene.ray_intersect_positions` — minimal gather
    traffic, no shading record). One big sorted wavefront replaces
    K (x sites) sequential traversals: each of those paid its own
    presort + kernel launch, and the combined wavefront is MORE coherent
    (a primary ray's aux set sorts into the same blocks). Measured on
    the config-5 bench this is the difference between the reparam
    integrator costing ~21x a plain render and ~<10x (BENCH_r05).

    The traversal picks prims detached; positions re-derive from the
    vertex tables, so each point FOLLOWS the geometry under
    differentiation. Returns lists (points, dists) per input ray."""
    import os as _os
    from ..scene import scene as scene_mod
    n_rays = len(ds_)
    n = jnp.shape(ds_[0].x)[0]
    # Chunk cap, MEASURED (config-5 Cornell bench, same-regime A/B,
    # docs/TPU_TRAVERSAL.md "Reparam cost decomposition"): the brute
    # backend materializes (lanes, prims) intermediates, so one
    # monolithic 8.4M-lane batch spills HBM bandwidth (13.5 Mrays/s)
    # while the fully sequential layout pays per-sweep floors (17.4);
    # ~2M-lane chunks hit the knee at 30.5. Accel (sorted-Pallas)
    # backends keep the single batch — each chunk would pay its own
    # presort bracket. MI_REPARAM_CHUNK overrides (0 = one batch).
    cap = int(_os.environ.get(
        "MI_REPARAM_CHUNK",
        "2097152" if scene_mod._pick_backend(scene) == "brute" else "0"))
    per = max(1, cap // max(n, 1)) if cap else n_rays
    xs, ts = [], []
    for c0 in range(0, n_rays, per):
        grp_o = os_[c0:c0 + per]
        grp_d = ds_[c0:c0 + per]
        O = Vec3(jnp.concatenate([o.x for o in grp_o]),
                 jnp.concatenate([o.y for o in grp_o]),
                 jnp.concatenate([o.z for o in grp_o]))
        D = Vec3(jnp.concatenate([d.x for d in grp_d]),
                 jnp.concatenate([d.y for d in grp_d]),
                 jnp.concatenate([d.z for d in grp_d]))
        p, t, valid = scene_mod.ray_intersect_positions(
            scene, Ray.make(O, D))
        x = vwhere(valid, p, O + D * _FAR)
        t = jnp.where(valid, t, jnp.float32(_FAR))
        for i in range(len(grp_d)):
            sl = slice(i * n, (i + 1) * n)
            xs.append(Vec3(x.x[sl], x.y[sl], x.z[sl]))
            ts.append(t[sl])
    return xs, ts


def _tangent_frame(d0: Vec3):
    vertical = jnp.abs(d0.z) < 0.9
    up = Vec3(jnp.where(vertical, 0.0, 1.0), jnp.zeros_like(d0.z),
              jnp.where(vertical, 1.0, 0.0))
    t1 = vnormalize(vcross(up, d0))
    t2 = vcross(d0, t1)
    return t1, t2


def warp_and_divergence_multi(scene, sites, k_aux: int = None):
    """Loubet-style warp fields for SEVERAL reparameterization sites in
    one batched traversal.

    `sites` is a list of (o: Vec3, d: Vec3) pairs of equal wavefront
    size — e.g. a bounce's NEE direction and its BSDF-sampled
    continuation. Per site, a FIXED auxiliary sample set {d_k} (detached)
    is built around d; ALL sites' aux rays are traced in ONE
    `_follow_points_batched` call (one presort + one kernel sweep over
    len(sites) * K * N lanes instead of len(sites) * K sequential
    launches). Each aux ray yields a geometry-following direction
    omega_k(theta) and a detached importance h_k; the warp at a query
    direction w is the kernel-weighted mean

        V(w) = normalize( sum_k K(w . d_k) h_k omega_k / sum_k ... )

    — smooth in w through the kernel, theta-dependent through omega_k.
    Its tangent-plane Jacobian at w = d gives the change-of-variables
    factor. Returns a list of (V(d) Vec3, det (N,)) per site; det has
    primal exactly 1 and carries the boundary derivative.
    """
    sg = jax.lax.stop_gradient
    k = K_AUX if k_aux is None else int(k_aux)
    assert k > 0, f"reparam_kaux={k}: the warp needs >= 1 auxiliary ray"
    offs = _aux_offsets(k)                     # (K, 2), static
    # aux samples must cover the kernel's support well past its std dev
    # (1/sqrt(kappa)), else the importance-reweighted warp derivative is
    # truncated and the boundary gradient systematically shrinks
    radius = jnp.float32(3.0 / np.sqrt(KAPPA))

    frames = []
    aux_o, aux_d = [], []
    for (o, d) in sites:
        d0 = sg(d)
        t1, t2 = _tangent_frame(d0)
        dirs_k = [vnormalize(d0 + t1 * (radius * offs[j, 0]) +
                             t2 * (radius * offs[j, 1])) for j in range(k)]
        frames.append((o, d0, t1, t2, dirs_k))
        aux_o.extend([o] * k)
        aux_d.extend(dirs_k)

    # ONE traversal for every aux ray of every site
    xs, ts = _follow_points_batched(scene, aux_o, aux_d)

    kappa_kernel = jnp.float32(KAPPA)
    out = []
    for s, (o, d0, t1, t2, dirs_k) in enumerate(frames):
        omega_k = [vnormalize(xs[s * k + j] - o) for j in range(k)]
        t_k = [sg(ts[s * k + j]) for j in range(k)]

        # Boundary-aware importance (Loubet's B(omega) test in spirit):
        # the NEAREST surface among the aux hits owns the silhouette, so
        # the warp must follow it fully AT the edge — a symmetric average
        # would move at only half the occluder's velocity there, halving
        # every boundary gradient. Weights are harmonic in the distance
        # above the minimum.
        t_stack = jnp.stack(t_k, 0)             # (K, N)
        t_min = jnp.min(t_stack, 0)
        h_k = [1.0 / (0.05 * t_min + (tk - t_min) + 1e-4) for tk in t_k]

        def V(w: Vec3, omega_k=omega_k, h_k=h_k, dirs_k=dirs_k) -> Vec3:
            num = Vec3.zeros(jnp.shape(w.z))
            den = jnp.zeros(jnp.shape(w.z), jnp.float32)
            for j in range(k):
                # vMF-style smooth kernel in the query direction
                lw = kappa_kernel * (vdot(w, dirs_k[j]) - 1.0)
                wk = jnp.exp(jnp.maximum(lw, -30.0)) * h_k[j]
                num = num + omega_k[j] * wk
                den = den + wk
            return vnormalize(num * (1.0 / jnp.maximum(den, 1e-20)))

        V0 = V(d0)
        # tangent-plane Jacobian via two jvp probes; primal part removed
        # so det has primal exactly 1 (T is identity at the primal point)
        _, dV1 = jax.jvp(V, (d0,), (t1,))
        _, dV2 = jax.jvp(V, (d0,), (t2,))
        dV1 = dV1 - sg(dV1)
        dV2 = dV2 - sg(dV2)
        j11 = vdot(dV1, t1)
        j12 = vdot(dV1, t2)
        j21 = vdot(dV2, t1)
        j22 = vdot(dV2, t2)
        det = (1.0 + j11) * (1.0 + j22) - j12 * j21
        out.append((V0, det))
    return out


def warp_and_divergence(scene, o, d, k_aux: int = None):
    """Single-site convenience wrapper over warp_and_divergence_multi."""
    return warp_and_divergence_multi(scene, [(o, d)], k_aux)[0]


def warp_field(scene, o, d):
    """V(d) alone (see warp_and_divergence)."""
    return warp_and_divergence(scene, o, d)[0]


def _radiance_at(scene, o, d, wavelengths, config):
    """Direct radiance along (o, d): emitter hit or environment. Hit
    positions re-derive differentiably; the emitter lookup is smooth."""
    from ..core.spec import swhere
    from ..scene import scene as scene_mod
    si = scene_mod.ray_intersect(scene, Ray.make(o, d))
    L_hit = emitters.eval_hit(scene, si, config)
    L_env = emitters.eval_env(scene, d, wavelengths, config)
    return swhere(si.valid, L_hit, L_env)


def _reparam_pass(scene, config: RenderConfig, sppc: int, seed_p):
    H, W = config.height, config.width
    sg = jax.lax.stop_gradient
    n = sppc * H * W
    lane = jnp.arange(n, dtype=jnp.uint32)
    sampler = Sampler.seed(seed_p, lane_idx=lane)
    pix = jnp.arange(n, dtype=jnp.int32) % (H * W)
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    jitter, sampler = sampler.next_2d()
    uv = sensors.film_uv(x, y, jitter, W, H)
    ray = sensors.sample_ray(scene, uv, None, None)
    o, d = ray.o, ray.d

    V, det = warp_and_divergence(scene, o, d, config.reparam_kaux)
    # reparameterized direction: primal d, tangent follows the warp
    d_rep = vnormalize(d + (V - sg(V)))

    L = _radiance_at(scene, o, d_rep, None, config)
    vals = (L * det).to_array()
    return vals.reshape(sppc, H, W, -1).mean(0)


@partial(jax.jit, static_argnames=("config", "sppc", "n_passes"))
def _reparam_all_passes(scene, config, sppc, seed, n_passes):
    seeds = (jnp.uint32(seed) * jnp.uint32(0x9E3779B1) +
             jnp.arange(n_passes, dtype=jnp.uint32))

    def body(acc, s):
        return acc + _reparam_pass(scene, config, sppc, s), None

    H, W = config.height, config.width
    acc0 = jnp.zeros((H, W, config.n_image_channels), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, seeds)
    return acc / n_passes


def render_direct_reparam(scene, config: RenderConfig, seed: int = None
                          ) -> jnp.ndarray:
    """Primary-visibility render with reparameterized camera rays, fully
    jitted (one dispatch; lax.scan over passes).

    Differentiable w.r.t. the scene's geometry tables INCLUDING the
    visibility boundary term. Forward value equals the plain direct
    render (the warp's primal part cancels; the det factor's primal is 1).

    For boundary gradients at EVERY path vertex (NEE + BSDF directions),
    use the full path integrator with RenderConfig(reparam=True) —
    render/integrators.py wires this module's warp into each bounce.
    """
    if seed is None:
        seed = config.seed
    sppc = min(config.spp_per_pass, config.spp)
    n_passes = (config.spp + sppc - 1) // sppc
    return _reparam_all_passes(scene, config, sppc, seed & 0xFFFFFFFF,
                               n_passes)

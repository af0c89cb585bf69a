"""Integrators: the wavefront path tracer and the render driver loop.

TPU-native rebuild of mitsuba2's integrator machinery
(src/librender/integrator.cpp, src/integrators/path.cpp). Key structural
changes vs the reference (SURVEY.md §3.2):

- The bounce loop runs entirely ON DEVICE inside one jitted pass — the
  reference's per-bounce `any(active)` host sync disappears.
- The wavefront is laid out (spp_pass, H, W) so box-filter film
  accumulation is a reshape+sum, not an atomic scatter.
- spp is chunked into passes (`spp_per_pass`, mirroring m_samples_per_pass)
  by a host loop over identical jitted passes; each pass reseeds PCG32
  streams from (seed, pass, lane) so passes are independent and the whole
  render is deterministic and replayable (load-bearing for the adjoint).

`sample_path` mirrors path.cpp's MIS logic exactly: NEE with power(2)
heuristic + BSDF sampling with emitter-hit reweighting + Russian roulette.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..core import spectrum as sp
from ..core.geometry import Ray
from ..core.spec import Spec, swhere
from . import bsdf as bsdf_mod
from . import emitters, film as film_mod, sensors
from .sampler import Sampler


def mis_weight(pdf_a, pdf_b):
    """Power heuristic, beta = 2 (path.cpp::mis_weight)."""
    a2 = pdf_a * pdf_a
    return jnp.where(pdf_a > 0, a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-38), 0.0)


def _path_bounce(scene, config: RenderConfig, depth, carry):
    """One bounce of path.cpp's loop: NEE (+MIS) from the current vertex,
    BSDF sampling, emitter hit along the new ray (+MIS), Russian roulette.

    carry = (si, active, throughput, result, sampler, orig); `depth` may be
    a static int (unrolled callers, e.g. utils/observability.py) or a traced
    scalar (the lax.scan loop in sample_path — ONE compiled bounce body
    instead of max_depth copies, which cuts XLA compile time ~depth-fold).
    Factored out so the adjoint integrator can wrap each bounce in
    jax.checkpoint (recompute-in-backward = the radiative-backprop memory
    discipline; diff/adjoint.py).
    """
    from ..scene import scene as scene_mod
    si, active, throughput, result, sampler, orig = carry

    if config.compact:
        # wavefront compaction: dead lanes to the back, live lanes Morton-
        # sorted by hit position (kernels/compact.py) -> coherent packets
        from ..kernels import compact as compact_mod
        perm = compact_mod.compaction_order(active, si.p,
                                            scene.bvh_min[0], scene.bvh_max[0])
        si, active, throughput, result, sampler, orig = compact_mod.permute(
            (si, active, throughput, result, sampler, orig), perm)

    si = si.replace(tex=scene.textures)  # re-attach (kept out of the carry)

    # ----------------------------------------------------------------------
    # Next-event estimation (Scene::sample_emitter_direction + shadow ray)
    # ----------------------------------------------------------------------
    flags = bsdf_mod.lane_flags(scene, si)
    is_smooth = (flags & bsdf_mod.F_SMOOTH) != 0
    u_nee, sampler = sampler.next_1d()
    u2_nee, sampler = sampler.next_2d()
    ds, e_val = emitters.sample_direction(scene, si.p, si.wavelengths,
                                          u_nee, u2_nee, config)
    nee_active = active & is_smooth & (ds.pdf > 0)
    # maxt = 0 on NEE-inactive lanes (dead paths, delta BSDFs, zero-pdf
    # draws): the presort's dead-lane key sends them to the back of the
    # wavefront and their blocks exit traversal at the root — measured
    # lever on bounce wavefronts where the active fraction has decayed
    # (the bounce ray below already had this; the shadow ray did not).
    shadow_ray = si.spawn_ray_d(
        ds.d, maxt=jnp.where(nee_active, ds.dist * (1.0 - 1e-3), 0.0))
    d_nee = ds.d
    det_nee = 1.0

    # BSDF sample draws happen HERE (sampler stream order is part of the
    # determinism contract — u_nee, u2_nee, u1_b, u2_b, [u_rr] per
    # bounce); the sample itself is consumed further down.
    u1_b, sampler = sampler.next_1d()
    u2_b, sampler = sampler.next_2d()
    bs, b_weight = bsdf_mod.sample(scene, si, u1_b, u2_b, config)
    bounce_d = si.to_world(bs.wo)
    next_ray = si.spawn_ray_d(bounce_d)

    det_b = None
    if config.reparam:
        # Reparameterize the NEE direction AND the BSDF-sampled
        # continuation (Loubet 2019 / pathreparam): the warps follow
        # moving occluder silhouettes so visibility boundaries are
        # stationary in the sample domain; each det carries the
        # change-of-variables derivative (primal exactly 1). BOTH sites'
        # auxiliary rays trace in ONE batched traversal (2*K*N lanes) —
        # one presort + kernel sweep instead of 2*K sequential launches
        # (diff/reparam.py::warp_and_divergence_multi).
        from ..diff import reparam as reparam_mod
        from ..core.vec import vnormalize as _vnorm
        sgf = jax.lax.stop_gradient
        (Vn, det_nee), (Vb, det_b) = reparam_mod.warp_and_divergence_multi(
            scene, [(shadow_ray.o, ds.d), (next_ray.o, bounce_d)],
            config.reparam_kaux)
        d_nee = _vnorm(ds.d + (Vn - sgf(Vn)))
        bounce_d = _vnorm(bounce_d + (Vb - sgf(Vb)))
        next_ray = next_ray.replace(d=bounce_d)

    occluded = scene_mod.ray_test(scene, shadow_ray)
    if config.remat:
        # Save the shadow-query result across the checkpoint boundary
        # (see the si_next note below): the backward re-run of this
        # bounce must not pay the sorted any-hit traversal again.
        from jax.ad_checkpoint import checkpoint_name
        occluded = checkpoint_name(occluded, "trace")
    wo_local = si.to_local(d_nee)
    f_val = bsdf_mod.eval_(scene, si, wo_local, config)
    f_pdf = bsdf_mod.pdf(scene, si, wo_local, config)
    w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, f_pdf))
    contrib = throughput * e_val * f_val * \
        ((det_nee * w_nee) / jnp.maximum(ds.pdf, 1e-20))
    result = result + contrib.masked(nee_active & ~occluded)

    # ----------------------------------------------------------------------
    # BSDF sampling (drawn above; throughput/Jacobian applied here)
    # ----------------------------------------------------------------------
    throughput = throughput * swhere(active, b_weight, 1.0)
    active = active & (bs.pdf > 0) & b_weight.any_positive()
    if det_b is not None:
        # the Jacobian multiplies the throughput so it chains into every
        # later contribution along the path
        throughput = throughput * jnp.where(active, det_b, 1.0)
    # Kill rays of inactive lanes cheaply (maxt = 0 -> instant miss)
    next_ray = next_ray.replace(maxt=jnp.where(active, jnp.inf, 0.0))
    si_next = scene_mod.ray_intersect(scene, next_ray)
    if config.remat:
        # SELECTIVE rematerialization (diff/adjoint.py): the bounce body
        # is wrapped in jax.checkpoint with
        # save_only_these_names("trace"), so the backward sweep re-runs
        # the bounce's SHADING (cheap VPU math) but reads the traversal
        # outputs — the expensive presort + Pallas kernel sweeps — from
        # storage instead of re-tracing them. Traversal is detached
        # anyway (gradients flow through shading/emission tables), so
        # saving its outputs loses nothing and cuts the adjoint pass
        # from 2x traversal to 1x (BENCH_r05 adjoint metrics). Memory:
        # ~25 f32/lane/bounce — small next to the pass wavefront. The
        # texture atlas is excluded (a closed-over constant; naming it
        # would snapshot the whole atlas per bounce per scan step).
        from jax.ad_checkpoint import checkpoint_name
        named = jax.tree.map(lambda a: checkpoint_name(a, "trace"),
                             si_next.replace(tex=None))
        si_next = named.replace(tex=si_next.tex)

    # Emitter hit along the BSDF ray, MIS-weighted against NEE
    delta_sample = (bs.sampled_flags & bsdf_mod.F_DELTA) != 0
    em_pdf_hit = emitters.pdf_direction_hit(scene, si.p, si_next, config)
    em_pdf_env = emitters.pdf_direction_env(scene, config, bounce_d)
    em_pdf = jnp.where(si_next.valid, em_pdf_hit, em_pdf_env)
    em_pdf = jnp.where(delta_sample, 0.0, em_pdf)
    w_bsdf = mis_weight(bs.pdf, em_pdf)
    L_hit = emitters.eval_hit(scene, si_next, config)
    L_env = emitters.eval_env(scene, bounce_d, si.wavelengths, config)
    L = swhere(si_next.valid, L_hit, L_env)
    result = result + (throughput * L * w_bsdf).masked(active)

    # ----------------------------------------------------------------------
    # Russian roulette (path.cpp: after rr_depth, q capped at 0.95).
    # Statically elided when RR can never trigger (rr_depth >= max_depth) so
    # those configs' sample streams are unchanged; otherwise the draw happens
    # EVERY bounce (uniform dimension layout for the scan body) and the kill
    # is masked by the depth test (q = 1 before rr_depth).
    # ----------------------------------------------------------------------
    if config.rr_depth < config.max_depth:
        do_rr = (depth + 1 >= config.rr_depth) & (depth + 1 < config.max_depth)
        q = jnp.where(do_rr,
                      jnp.minimum(throughput.hmax() * bs.eta * bs.eta, 0.95),
                      1.0)
        u_rr, sampler = sampler.next_1d()
        rr_alive = u_rr < q
        throughput = throughput / jnp.maximum(q, 1e-8)
        active = active & rr_alive

    active = active & si_next.valid
    si_next = si_next.replace(tex=None)  # keep the atlas out of the carry
    if si.duv_dx is not None:
        # carry-type stability: bounce rays carry no differentials — zero
        # footprint = finest mip, the reference's behavior past the primary
        # hit (interaction.h: differentials only from the camera ray)
        from ..core.vec import Vec2 as _V2
        z = jnp.zeros_like(si.duv_dx.x)
        si_next = si_next.replace(duv_dx=_V2(z, z), duv_dy=_V2(z, z))
    return (si_next, active, throughput, result, sampler, orig)


def sample_path(scene, ray: Ray, sampler: Sampler, config: RenderConfig
                ) -> Tuple[jnp.ndarray, Sampler]:
    """Path-trace one wavefront of rays. Returns ((N, C) radiance, sampler).

    Follows src/integrators/path.cpp: emitter hit at depth 1, then for each
    bounce NEE (+MIS) and BSDF sampling (+MIS on the induced emitter hit),
    Russian roulette after rr_depth. With config.remat each bounce is
    jax.checkpoint'ed: the backward pass re-traces instead of storing
    per-bounce intermediates (O(wavefront) not O(wavefront x depth) memory).
    """
    from ..scene import scene as scene_mod

    N = ray.o.shape[0]
    C = config.n_channels

    # primary camera wavefront: (spp, H, W) pixel order is already
    # block-coherent — skip the presort (measured win, scene.py note).
    # Instanced scenes keep the auto policy: their unsorted penalty is
    # much steeper (TPU_TRAVERSAL.md phase-5 table) and pixel-order
    # coherence was only measured on the flattened MXU path.
    si = scene_mod.ray_intersect(
        scene, ray, sort=None if scene.has_instances else False)
    active = si.valid
    throughput = Spec.ones((N,), C)
    result = Spec.zeros((N,), C)

    # Depth-1: directly visible emitters + environment
    if not config.hide_emitters:
        result = result + emitters.eval_hit(scene, si, config)
        result = result + emitters.eval_env(scene, ray.d, ray.wavelengths,
                                            config).masked(~si.valid)

    orig = jnp.arange(N, dtype=jnp.int32)
    carry = (si.replace(tex=None), active, throughput, result, sampler, orig)
    n_bounces = config.max_depth - 1
    # Selective remat policy: rematerialize shading, SAVE the traversal
    # outputs (tagged "trace" in _path_bounce) — the backward sweep then
    # re-runs each bounce's arithmetic but never re-traces rays.
    _remat_policy = (jax.checkpoint_policies.save_only_these_names("trace")
                     if config.remat else None)
    if n_bounces >= 2:
        # lax.scan: one compiled bounce body for all depths (the reference
        # unrolls in C++; under XLA unrolling multiplies compile time)
        def body(c, depth):
            return _path_bounce(scene, config, depth, c), None

        if config.remat:
            body = jax.checkpoint(body, policy=_remat_policy)
        carry, _ = jax.lax.scan(body, carry, jnp.arange(1, config.max_depth))
    elif n_bounces == 1:
        step = partial(_path_bounce, scene, config, 1)
        if config.remat:
            step = jax.checkpoint(step, policy=_remat_policy)
        carry = step(carry)
    _, _, _, result, sampler, orig = carry

    if config.compact:
        from ..kernels import compact as compact_mod
        result = compact_mod.unsort(result, orig)

    return result, sampler


def sample_depth(scene, ray: Ray, config: RenderConfig) -> jnp.ndarray:
    """`depth` integrator (src/integrators/depth.cpp): hit distance, 0 on
    miss."""
    from ..scene import scene as scene_mod
    si = scene_mod.ray_intersect(scene, ray)
    return jnp.where(si.valid, si.t, 0.0)[..., None]


AOV_CHANNELS = {"depth": 1, "position": 3, "sh_normal": 3, "geo_normal": 3,
                "uv": 2, "prim_index": 1, "shape_index": 1, "albedo": None}


def sample_aovs(scene, ray: Ray, config: RenderConfig, aovs: Tuple[str, ...]):
    """`aov` integrator (src/integrators/aov.cpp): arbitrary geometric
    output variables from the first hit."""
    from ..scene import scene as scene_mod
    si = scene_mod.ray_intersect(scene, ray)
    v = si.valid
    out = {}
    for name in aovs:
        if name == "depth":
            out[name] = jnp.where(v, si.t, 0.0)[..., None]
        elif name == "position":
            out[name] = jnp.where(v[..., None], si.p.to_array(), 0.0)
        elif name == "sh_normal":
            out[name] = jnp.where(v[..., None], si.sh_frame.n.to_array(), 0.0)
        elif name == "geo_normal":
            out[name] = jnp.where(v[..., None], si.n.to_array(), 0.0)
        elif name == "uv":
            out[name] = jnp.where(v[..., None], si.uv.to_array(), 0.0)
        elif name == "prim_index":
            out[name] = si.prim_index.astype(jnp.float32)[..., None]
        elif name == "shape_index":
            out[name] = si.shape.astype(jnp.float32)[..., None]
        elif name == "albedo":
            # first spectrum slot of the hit material (denoiser guide)
            _, mdata, _ = bsdf_mod._lane_materials(scene, si)
            from .spectra import eval_spectrum_slot
            alb = eval_spectrum_slot(mdata.slot(0), si.wavelengths, "rgb",
                                     tex=si.tex, uv=si.uv)
            out[name] = jnp.where(v[..., None], alb.to_array(), 0.0)
        else:
            raise ValueError(f"unknown aov {name!r}")
    return out


def render_aovs(scene, config: RenderConfig,
                aovs: Tuple[str, ...] = ("depth", "sh_normal", "position"),
                seed: int = None):
    """AOV render: one pass, box filter. Returns {name: (H, W, C) image}."""
    if seed is None:
        seed = config.seed
    H, W = config.height, config.width
    sppc = min(config.spp_per_pass, config.spp)

    @partial(jax.jit, static_argnames=("aovs_",))
    def pass_fn(scene, seed, aovs_):
        n = sppc * H * W
        lane = jnp.arange(n, dtype=jnp.uint32)
        sampler = Sampler.seed(seed, lane_idx=lane)
        pix = jnp.arange(n, dtype=jnp.int32) % (H * W)
        x = (pix % W).astype(jnp.float32)
        y = (pix // W).astype(jnp.float32)
        jitter, sampler = sampler.next_2d()
        uv = sensors.film_uv(x, y, jitter, W, H)
        if scene.cam_type in sensors.NEEDS_APERTURE_SAMPLE:
            u_lens, sampler = sampler.next_2d()
        else:
            u_lens = None
        ray = sensors.sample_ray(scene, uv, u_lens, None)
        outs = sample_aovs(scene, ray, config, aovs_)
        return {k: v.reshape(sppc, H, W, v.shape[-1]).mean(0)
                for k, v in outs.items()}

    return pass_fn(scene, jnp.uint32(seed), tuple(aovs))


def render_pass(scene, config: RenderConfig, seed,
                lane_offset=0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One jitted pass: (spp_per_pass x H x W) lanes -> (H, W, C) + weights.

    `lane_offset` shifts the global lane ids (and therefore every PCG32
    stream): a pass sharded over D devices, each rendering spp/D samples at
    offset d * (spp/D) * H * W with the SAME base seed, draws bit-identical
    samples to the unsharded pass — the determinism contract the
    distributed layer's tests rely on (dist/sharding.py)."""
    from .sampler import make_sampler
    if config.dtype == "float64":
        # `_double` variant: upcast the scene; jnp promotion carries f64
        # through every scene-derived computation (config.py dtype note)
        import jax as _jax
        if not _jax.config.jax_enable_x64:
            raise RuntimeError(
                "dtype='float64' requires x64: wrap the render in "
                "jax.enable_x64(True)")
        scene = _jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, scene)
    H, W = config.height, config.width
    sppc = config.spp_per_pass
    n = sppc * H * W
    lane = jnp.asarray(lane_offset, jnp.uint32) + jnp.arange(n, dtype=jnp.uint32)
    sampler = make_sampler(config.sampler, seed, lane, H * W, sppc)

    pix = jnp.arange(n, dtype=jnp.int32) % (H * W)
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    jitter, sampler = sampler.next_2d()
    uv = sensors.film_uv(x, y, jitter, W, H,
                         crop=(config.crop_x, config.crop_y,
                               config.film_width, config.film_height))

    if config.color_mode == "spectral":
        u_wl, sampler = sampler.next_1d()
        wl, wl_pdf = sp.sample_hero_wavelengths_t(u_wl)
    else:
        wl = None
        wl_pdf = None

    if scene.cam_type in sensors.NEEDS_APERTURE_SAMPLE:
        u_lens, sampler = sampler.next_2d()
    else:
        u_lens = None
    if scene.cam_motion is not None:
        # camera motion blur: uniform shutter time over the key range,
        # clamped to [shutter_open, shutter_close] (cam_data[10:12])
        u_time, sampler = sampler.next_1d()
        t0 = jnp.maximum(scene.cam_motion.times[0], scene.cam_data[10])
        t1 = jnp.minimum(scene.cam_motion.times[-1], scene.cam_data[11])
        cam_time = t0 + u_time * (t1 - t0)
    else:
        cam_time = None
    if scene.textures is not None and scene.cam_type in sensors.HAS_DIFFERENTIALS:
        # ray differentials for texture-LOD filtering; each sample covers
        # 1/spp of a pixel (integrator.cpp's diff_scale_factor)
        ray = sensors.sample_ray_differential(scene, uv, u_lens, W,
                                              wavelengths=wl, time=cam_time)
        ray = ray.scale_differential(1.0 / jnp.sqrt(jnp.float32(config.spp)))
    else:
        ray = sensors.sample_ray(scene, uv, u_lens, wavelengths=wl,
                                 time=cam_time)
    det_cam = None
    if config.reparam:
        # reparameterized camera rays: primary-visibility boundary term
        from ..core.vec import vnormalize as _vnorm
        from ..diff import reparam as reparam_mod
        _sg = jax.lax.stop_gradient
        Vc, det_cam = reparam_mod.warp_and_divergence(
            scene, ray.o, ray.d, config.reparam_kaux)
        ray = ray.replace(d=_vnorm(ray.d + (Vc - _sg(Vc))))

    if config.integrator in ("volpath", "volpathmis") or scene.has_media:
        from .volpath import sample_path_vol
        spec, sampler = sample_path_vol(scene, ray, sampler, config)
    else:
        spec, sampler = sample_path(scene, ray, sampler, config)
    if det_cam is not None:
        spec = spec * det_cam
    if scene.cam_weight is not None:
        spec = spec * scene.cam_weight  # sensor importance (irradiancemeter)

    if config.color_mode == "spectral":
        rgb = sp.spectrum_to_srgb_t(spec, wl, wl_pdf)
    else:
        rgb = spec

    image = jnp.zeros((H, W, config.n_image_channels), config.float_dtype)
    wsum = jnp.zeros((H, W) if config.rfilter != "box" else (), config.float_dtype)
    image, wsum = film_mod.accumulate_pass(image, wsum, rgb, jitter, config)
    return image, wsum


@partial(jax.jit, static_argnames=("config",))
def _render_pass_jit(scene, config, seed):
    return render_pass(scene, config, seed)


@partial(jax.jit, static_argnames=("config", "n_passes"))
def _render_all_passes_jit(scene, config, seed, n_passes):
    """All spp passes in ONE dispatch: lax.scan over pass seeds.

    The reference launches one wavefront per pass from the host; on a
    remote/tunneled TPU runtime each dispatch pays round-trip latency that
    can dwarf the 17 ms of device work per pass, so the whole render is a
    single compiled program. Memory matches the host loop: one wavefront
    live at a time."""
    seed = jnp.uint32(seed)
    seeds = (seed * jnp.uint32(0x9E3779B1) +
             jnp.arange(n_passes, dtype=jnp.uint32))

    def body(acc, s):
        img_p, w_p = render_pass(scene, config, s)
        return (acc[0] + img_p, acc[1] + w_p), None

    H, W = config.height, config.width
    img0 = jnp.zeros((H, W, config.n_image_channels), config.float_dtype)
    w0 = jnp.zeros((H, W) if config.rfilter != "box" else (), config.float_dtype)
    (image, wsum), _ = jax.lax.scan(body, (img0, w0), seeds)
    return image, wsum


def render(scene, config: RenderConfig, seed: int = None) -> jnp.ndarray:
    """SamplingIntegrator::render — chunk spp into passes (one dispatch)."""
    if seed is None:
        seed = config.seed
    sppc = min(config.spp_per_pass, config.spp)
    config = config.replace(spp_per_pass=sppc)
    n_passes = (config.spp + sppc - 1) // sppc
    if n_passes == 1:
        image, wsum = _render_pass_jit(
            scene, config, jnp.uint32((seed * 0x9E3779B1) & 0xFFFFFFFF))
    else:
        image, wsum = _render_all_passes_jit(scene, config,
                                             (seed & 0xFFFFFFFF), n_passes)
    return film_mod.develop(image, wsum)


def render_direct(scene, config: RenderConfig, seed: int = None) -> jnp.ndarray:
    """`direct` integrator (src/integrators/direct.cpp): one-bounce MIS
    direct illumination == the path tracer truncated at depth 2."""
    return render(scene, config.replace(max_depth=2, integrator="path"), seed)


def render_any(scene, config: RenderConfig, seed: int = None):
    """Top-level integrator dispatch on `config.integrator` — the loader/
    CLI entry point (the reference instantiates the XML's integrator
    plugin; here the plugin set is this switch).

    Returns, by integrator:
      path|volpath|volpathmis  (H, W, C) image
      direct                   (H, W, C) image (depth-2 path)
      depth                    (H, W, 1) primary-hit distance
      aov                      {"image": (H, W, C), <name>: (H, W, Ck)...}
      moment                   (mean, variance) pair
      stokes                   (H, W, 4) Stokes image
    """
    it = config.integrator
    if it == "direct":
        return render_direct(scene, config, seed)
    if it == "depth":
        return render_aovs(scene, config, aovs=("depth",), seed=seed)["depth"]
    if it == "aov":
        names = tuple(config.aovs) or ("depth", "sh_normal", "position")
        out = dict(render_aovs(scene, config, aovs=names, seed=seed))
        child = config.replace(integrator=config.aov_child)
        out["image"] = render_any(scene, child, seed)
        return out
    if it == "moment":
        return render_with_variance(scene, config, seed)
    if it == "stokes":
        from .stokes import render_stokes
        return render_stokes(scene, config.replace(polarized=True), seed)
    return render(scene, config, seed)


def render_with_variance(scene, config: RenderConfig, seed: int = None):
    """`moment` integrator (src/integrators/moment.cpp): accumulate the 2nd
    sample moment alongside the mean. Returns (mean, variance-of-the-mean);
    variance is estimated across passes, so it requires >= 2 passes."""
    if seed is None:
        seed = config.seed
    sppc = min(config.spp_per_pass, config.spp)
    config = config.replace(spp_per_pass=sppc)
    n_passes = (config.spp + sppc - 1) // sppc
    m1 = m2 = wsum = None
    for p in range(n_passes):
        img_p, w_p = _render_pass_jit(
            scene, config, jnp.uint32((seed * 0x9E3779B1 + p) & 0xFFFFFFFF))
        img_p = film_mod.develop(img_p, w_p)
        m1 = img_p if m1 is None else m1 + img_p
        m2 = img_p ** 2 if m2 is None else m2 + img_p ** 2
    mean = m1 / n_passes
    var_pass = m2 / n_passes - mean ** 2  # variance of one pass estimate
    var_mean = var_pass / max(n_passes - 1, 1)
    return mean, var_mean

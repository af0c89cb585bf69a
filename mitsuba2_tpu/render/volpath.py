"""Volumetric path tracer.

TPU-native rebuild of mitsuba2's `volpath` integrator
(src/integrators/volpath.cpp) over the wavefront architecture of
integrators.py. Differences from the surface path tracer:

- each lane tracks its CURRENT MEDIUM as an int32 index (-1 = vacuum),
  updated when crossing null-BSDF boundaries;
- between interactions the free-flight distance is sampled analytically
  (homogeneous) or by bounded delta tracking (heterogeneous grid);
- NEE shadow rays accumulate TRANSMITTANCE through media and pass through
  null boundaries (Scene::eval_transmittance semantics) instead of a
  binary occlusion test;
- medium events scatter via the Henyey-Greenstein / isotropic phase
  function with MIS against emitter sampling.

Wavefront notes: every branch is masked-evaluate-all; loop bounds are
static (max_depth bounces, _MAX_NULL null crossings per shadow ray,
_DELTA_STEPS delta-tracking trials), mirroring SURVEY.md §7.3's
static-shape discipline. All colors are planar Specs (core/spec.py).
Spectral mode lifts the media's RGB sigma_t/albedo to per-channel hero-
wavelength values through the sigmoid-polynomial upsampling lattice (same
treatment as every other color parameter).

Documented deviations from volpath.cpp (costs of the static-loop
wavefront design, stated rather than hidden):
- Null boundary crossings CONSUME a bounce of the max_depth budget
  (the reference's while-loop does not count them); null-shell scenes
  need ~+2 max_depth for equal scattering order.
- HETEROGENEOUS free flights track with the channel-MEAN extinction and
  a gray weight: chromatic grids get gray camera-path transmittance
  while NEE transmittance stays per-channel (the raymarched segments).
  Chromatic-medium spectral MIS (volpathmis) applies fully to
  homogeneous media only.
- Exhausting _MAX_NULL crossings on a shadow ray fails DARK (tr = 0),
  never bright.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core.geometry import Ray, dot
from ..kernels import gather as gth
from ..core.spec import Spec, swhere
from ..core.vec import Vec3, vdot, vwhere
from . import bsdf as bsdf_mod
from . import emitters, media as media_mod, sensors
from .integrators import mis_weight
from .sampler import Sampler

_MAX_NULL = 3       # transmittance segments per shadow ray: a single
                    # null-bounded volume needs THREE (enter crossing,
                    # exit crossing, final clear segment to the light).
                    # 2 "worked" only because budget exhaustion used to
                    # leak light instead of failing dark.
_DELTA_STEPS = 64   # delta-tracking trials per free-flight sample
_TAU_STEPS = 8      # midpoint raymarch points for the DERIVATIVE-side
                    # optical depth of a heterogeneous free flight (the
                    # differential-tracking factor; primal unaffected)


def _medium_coeffs(scene, med_idx, config, wavelengths=None):
    """Per-lane (sigma_t Spec, albedo Spec, g (N,), scale (N,)).

    rgb mode: the stored RGB channels. spectral mode: the RGB pair is
    upsampled to the lane's hero wavelengths through the sigmoid-polynomial
    lattice (core/spectrum.py) — per-channel spectral media, matching how
    every other color parameter is lifted. mono: channel mean."""
    from ..core import spectrum as sp
    idx = jnp.maximum(med_idx, 0)
    tbl = scene.med_data
    c = [gth.scalar(tbl[:, i], idx) for i in range(8)]

    def lift(r, g, b):
        if config.n_channels == 3:
            return Spec((r, g, b))
        if config.color_mode == "spectral" and wavelengths is not None:
            mx = jnp.maximum(jnp.maximum(r, jnp.maximum(g, b)), 1e-9)
            scale_c = jnp.maximum(mx / 0.999, 1.0)
            inv = 1.0 / scale_c
            lattice = sp.srgb_model_fetch_lattice()
            c2, c1, c0 = sp.srgb_model_fetch_interp_t(
                lattice, r * inv, g * inv, b * inv)
            return Spec(tuple(sp.srgb_model_eval_t(c2, c1, c0, w) * scale_c
                              for w in wavelengths.ch))
        return Spec.splat((r + g + b) * (1.0 / 3.0), config.n_channels)

    sig = lift(c[0], c[1], c[2])
    alb = lift(c[3], c[4], c[5])
    in_med = med_idx >= 0
    return sig.masked(in_med), alb.masked(in_med), c[6], c[7]


def _density(scene, med_idx, p):
    """Heterogeneous density multiplier at p (1 for homogeneous lanes)."""
    if scene.medium_grid is None:
        return jnp.ones(jnp.shape(p.z), jnp.float32)
    hetero = gth.scalar(scene.med_type, jnp.maximum(med_idx, 0)) == \
        media_mod.MEDIUM_HETEROGENEOUS
    d = scene.medium_grid.eval(p)
    return jnp.where(hetero & (med_idx >= 0), d, 1.0)


def _sample_free_flight(scene, med_idx, ray, t_surf, u, sampler, config):
    """Sample a collision distance along `ray`, capped at t_surf.

    Returns (t_col (N,), is_medium_event (N,), weight Spec, sampler).
    Homogeneous: analytic exponential sampling with the channel-mean rate;
    the returned weight includes transmittance / pdf for both outcomes.
    Heterogeneous: delta tracking against the grid majorant (weight 1).
    """
    sig, alb, _, scale = _medium_coeffs(scene, med_idx, config,
                                        ray.wavelengths)
    in_med = med_idx >= 0
    C = config.n_channels

    if scene.medium_grid is None:
        sig_rgb = sig * scale
        if config.integrator == "volpathmis" and C > 1:
            # volpathmis (src/integrators/volpathmis.cpp): SPECTRAL MIS for
            # chromatic media. Pick one channel's extinction as the
            # distance-sampling technique (uniform channel choice), then
            # combine the C per-channel techniques with the balance
            # heuristic: weight = Tr * sigma / mean_c pdf_c. The plain
            # volpath below instead samples with the channel-MEAN rate —
            # an acceptable proxy until the channels differ strongly,
            # where its per-channel weights explode; the MIS estimator
            # stays bounded (weight <= C for any chromaticity).
            u_ch, sampler = sampler.next_1d()
            k = jnp.minimum((u_ch * C).astype(jnp.int32), C - 1)
            sig_k = sig_rgb.ch[0]
            for c in range(1, C):
                sig_k = jnp.where(k == c, sig_rgb.ch[c], sig_k)
            # DETACHED sampling (the gpu_autodiff discipline): the drawn
            # distance is a decision, not a differentiable quantity —
            # its 1/sigma^2 pathwise derivative is inf on vacuum lanes
            # (0-cotangent x inf = NaN poisoning every medium gradient);
            # the weight ratio below carries the sigma derivative.
            t_s = jax.lax.stop_gradient(
                -jnp.log(jnp.maximum(1.0 - u, 1e-38)) /
                jnp.maximum(sig_k, 1e-20))
            med_event = in_med & (t_s < t_surf) & (sig_k > 0)
            t_col = jnp.where(med_event, t_s, t_surf)
            t_cl = jnp.minimum(t_col, 1e20)
            tr = (sig_rgb * (-t_cl)).map(jnp.exp)
            # Balance-heuristic denominators, averaged over channels.
            # DETACHED (detached-sampling estimator, gpu_autodiff's
            # discipline): the pdf is the sampler's choice probability —
            # differentiating it would cancel the transmittance
            # derivative exactly (gray medium: w = Tr/P = 1 identically
            # -> zero gradient), and its 1/pdf^2 backward factor is the
            # inf that NaN-poisoned masked lanes. Only the integrand
            # (Tr, sigma) carries d/d(medium params). Neutralized (-> 1)
            # on the branch a lane did not take. All caught by
            # tests/test_medium_grad.py's FD oracle.
            sgf = jax.lax.stop_gradient
            pdf_med = (sig_rgb * tr).hmean()
            pdf_surf = (sig_rgb * (-jnp.minimum(t_surf, 1e20))) \
                .map(jnp.exp).hmean()
            w_med = tr * sig_rgb / sgf(jnp.where(
                med_event, jnp.maximum(pdf_med, 1e-30), 1.0))
            w_surf = tr / sgf(jnp.where(
                med_event, 1.0, jnp.maximum(pdf_surf, 1e-30)))
        else:
            sig_bar = sig.hmean() * scale
            # detached sampling — see the volpathmis branch note
            t_s = jax.lax.stop_gradient(
                -jnp.log(jnp.maximum(1.0 - u, 1e-38)) /
                jnp.maximum(sig_bar, 1e-20))
            med_event = in_med & (t_s < t_surf) & (sig_bar > 0)
            t_col = jnp.where(med_event, t_s, t_surf)
            t_cl = jnp.minimum(t_col, 1e20)
            tr = (sig_rgb * (-t_cl)).map(jnp.exp)
            # DETACHED, neutralized off-branch denominators — see the
            # volpathmis branch note (the differentiable pdf would
            # cancel the Tr derivative; its backward 1/pdf^2 is the
            # masked-lane NaN)
            sgf = jax.lax.stop_gradient
            pdf_med = sig_bar * jnp.exp(-sig_bar * t_s)
            pdf_surf = jnp.exp(-sig_bar * jnp.minimum(t_surf, 1e20))
            w_med = tr * sig_rgb / sgf(jnp.where(
                med_event, jnp.maximum(pdf_med, 1e-30), 1.0))
            w_surf = tr / sgf(jnp.where(
                med_event, 1.0, jnp.maximum(pdf_surf, 1e-30)))
        w = swhere(med_event, w_med, w_surf)
        w = swhere(in_med, w, Spec.ones((), C))
        return t_col, med_event, w, sampler

    # Heterogeneous: delta tracking with the global majorant (unit weight
    # estimator; bias only if _DELTA_STEPS is exhausted, which the majorant
    # bound makes vanishingly rare for reasonable optical depths)
    sig_bar = sig.hmean() * scale
    # The majorant and the tracked distances are sampling DECISIONS
    # (detached). The 1.05 margin keeps the real-collision ratio
    # STRICTLY below the clip boundary: at a constant-density grid the
    # ratio is otherwise exactly 1.0 and clip's tie-breaking zeroes the
    # differential-tracking score below (measured: all grid gradients
    # silently 0). Cost: ~5% more null steps. The max(gmax, 1) floor
    # bounds HOMOGENEOUS lanes too (density multiplier 1): any grid in
    # the scene routes ALL media lanes through this branch, and a grid
    # whose peak density is < 1 would otherwise under-majorize the
    # homogeneous media (clip hid the violation -> too-thin media).
    gmax = jnp.maximum(jnp.max(scene.medium_grid.data), 1.0)
    maj = jax.lax.stop_gradient(1.05 * sig_bar * gmax)
    maj = jnp.maximum(maj, 1e-20)

    sgf = jax.lax.stop_gradient

    def t_cond(state):
        # early exit once EVERY lane is done: a fori_loop here ran all
        # _DELTA_STEPS trials unconditionally — the expected trial count
        # is the majorant optical depth (~10 on the smoke bench) and
        # bounce wavefronts that are mostly OUTSIDE the medium exit at
        # iteration 0 (measured: the volumetric bench's single biggest
        # lever, see BENCH_r05 smoke metric)
        i, _, done = state[0], state[1], state[2]
        return (i < _DELTA_STEPS) & ~jnp.all(done)

    def body(state):
        i, t, done, collided, st = state
        u1, st = _next1(st)
        u2, st = _next1(st)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-38)) / maj
        past = t_new >= t_surf
        p = ray.o + ray.d * t_new
        dens = _density(scene, med_idx, p)
        real = u2 < sgf(jnp.clip((sig_bar * dens) / maj, 0.0, 1.0))
        new_done = done | past | real
        collided = jnp.where(~done & ~past & real, True, collided)
        t = jnp.where(done, t, t_new)
        return i + 1, t, new_done, collided, st

    # FORKED tracking stream: the while_loop's trip count is a
    # wavefront max, so drawing from the MAIN sampler inside it would
    # make every later draw depend on how the wavefront was sharded —
    # breaking the bit-identical N-device == 1-device contract
    # (dist/sharding.py). Instead the main stream advances by a FIXED
    # three draws, which seed an independent per-lane PCG32 whose final
    # state is discarded (its consumption cannot matter).
    from ..core import pcg32 as _pcg
    from .sampler import Sampler as _Indep
    # three draws (~24 usable bits each after float32 quantization) give
    # ~2^72 distinct (state, stream) tuples — two lanes share a tracking
    # stream only if all three collide (the 2-draw version had ~2^48 and
    # a non-negligible birthday collision rate on 8M-lane wavefronts)
    u_f1, sampler = sampler.next_1d()
    u_f2, sampler = sampler.next_1d()
    u_f3, sampler = sampler.next_1d()
    k1 = (u_f1 * 4294967296.0).astype(jnp.uint32)
    k2 = (u_f2 * 4294967296.0).astype(jnp.uint32)
    k3 = (u_f3 * 4294967296.0).astype(jnp.uint32)
    track0 = _Indep(state=_pcg.seed(k1, k2, k3, k2 ^ (k1 >> 7)))
    zero = jnp.zeros_like(t_surf)
    done0 = ~in_med | (sig_bar <= 0)
    # stop_gradient barrier: the loop state is decision-only (maj and
    # the draws are detached), and the barrier guarantees reverse AD
    # never asks for the while_loop transpose (unsupported in JAX)
    _, t, done, collided, _ = jax.lax.stop_gradient(
        jax.lax.while_loop(
            t_cond, body,
            (jnp.int32(0), zero, done0, jnp.zeros_like(done0), track0)))
    med_event = collided & in_med
    t_col = jnp.where(med_event, t, t_surf)

    # DIFFERENTIAL free flight (the smoke-recovery gradient path): the
    # PRIMAL stays the unbiased unit-weight delta-tracking estimate
    # (decisions detached above), while the DERIVATIVE comes from a
    # primal-1 ratio R/sg(R) with R the pathwise event density of this
    # flight — exp(-tau) [x sigma(x_col) on collision] — evaluated with
    # a DETERMINISTIC _TAU_STEPS-point midpoint raymarch of the optical
    # depth. d log R is the transport derivative w.r.t. sigma_t and the
    # grid voxels; unlike the per-decision score estimator (REINFORCE
    # over the tracking chain — tried first, its variance random-walked
    # the smoke-recovery demo into divergence) this is smooth per
    # voxel, at the cost of raymarch-resolution bias in the DERIVATIVE
    # only (the primal is untouched: the factor is exactly 1).
    t_cl = sgf(jnp.minimum(t_col, 1e20))
    dt_m = t_cl / _TAU_STEPS
    dens_sum = jnp.zeros_like(t_cl)
    for i in range(_TAU_STEPS):
        pm = ray.o + ray.d * ((i + 0.5) * dt_m)
        dens_sum = dens_sum + _density(scene, med_idx, pm)
    tau = sig_bar * dt_m * dens_sum
    col_dens = _density(scene, med_idx, ray.o + ray.d * t_cl)
    logR = -tau + jnp.where(
        med_event,
        jnp.log(jnp.maximum(sig_bar * col_dens, 1e-30)), 0.0)
    w_track = jnp.where(in_med, jnp.exp(logR - sgf(logR)), 1.0)
    return t_col, med_event, Spec.splat(w_track, C), sampler


def _next1(sampler):
    return sampler.next_1d()


def _transition(scene, si, d_world, cur_med):
    """Medium change when crossing shape `si` along d_world (null boundary
    or refraction): entering -> the shape's interior medium, exiting ->
    vacuum (nested media collapse to the outermost, volpath.cpp behavior
    without a medium stack)."""
    entering = vdot(d_world, si.n) < 0
    interior = gth.scalar(scene.shape_interior, jnp.maximum(si.shape, 0))
    new_med = jnp.where(entering, interior, -1)
    return jnp.where(si.valid & (si.shape >= 0), new_med, cur_med)


def eval_transmittance(scene, p, d, dist, med_idx, sampler, config,
                       wavelengths=None):
    """Transmittance from p along d up to dist, passing through up to
    _MAX_NULL null boundaries (Scene::eval_transmittance in volpath.cpp).

    Returns (transmittance Spec, sampler)."""
    from ..scene import scene as scene_mod
    N = jnp.shape(p.z)[0]
    C = config.n_channels
    tr = Spec.ones((N,), C)
    cur = med_idx
    o = p
    remaining = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (N,))
    # lanes with dist <= 0 never trace: callers pass 0 for NEE-inactive
    # lanes, whose maxt-0 rays sort to the dead end of the wavefront and
    # retire at the BVH root (same lever as the surface integrator's
    # shadow rays)
    active = remaining > 0
    eps = 1e-4

    for _ in range(_MAX_NULL):
        ray = Ray.make(o, d, maxt=jnp.where(active, remaining, 0.0))
        si = scene_mod.ray_intersect(scene, ray)
        seg = jnp.where(si.valid, si.t, remaining)
        # medium attenuation over this segment
        sig, _, _, scale = _medium_coeffs(scene, cur, config, wavelengths)
        seg_cl = jnp.minimum(seg, 1e20)
        if scene.medium_grid is None:
            seg_tr = (sig * (-scale * seg_cl)).map(jnp.exp)
        else:
            # deterministic _TAU_STEPS midpoint raymarch of the optical
            # depth (matches the free-flight derivative factor's
            # resolution). The previous SINGLE midpoint sample could
            # miss a dense plume core entirely (zero self-shadowing) or
            # over-darken a mostly-empty segment.
            dens_sum = jnp.zeros_like(seg_cl)
            for i in range(_TAU_STEPS):
                pm = o + d * (((i + 0.5) / _TAU_STEPS) * seg_cl)
                dens_sum = dens_sum + _density(scene, cur, pm)
            seg_tr = (sig * (-(scale * dens_sum / _TAU_STEPS) *
                             seg_cl)).map(jnp.exp)
        tr = swhere(active, tr * seg_tr, tr)

        flags = bsdf_mod.lane_flags(scene, si)
        is_null = si.valid & ((flags & bsdf_mod.F_NULL) != 0)
        blocked = active & si.valid & ~is_null
        tr = tr.masked(~blocked)
        # null-lobe transmission of the crossed surface: 1 for `null`,
        # (1 - opacity) for `mask` — a masked surface must cast its
        # partial shadow (Scene::eval_transmittance x
        # eval_null_transmission; previously masks were fully
        # transparent to shadow rays)
        tr = swhere(active & is_null,
                    tr * bsdf_mod.null_transmission(
                        scene, si.replace(wavelengths=wavelengths),
                        config),
                    tr)
        cur = jnp.where(active & is_null,
                        _transition(scene, si, d, cur), cur)
        o = vwhere(active & is_null, si.p + d * eps, o)
        remaining = jnp.where(active & is_null,
                              remaining - si.t - eps, remaining)
        active = active & is_null & (remaining > 0)
    # crossing budget exhausted with distance still to cover: the final
    # segment was never traced, so FAIL DARK (tr = 0) instead of letting
    # light leak through whatever occluders lie beyond _MAX_NULL
    # crossings
    tr = tr.masked(~active)
    if config.remat:
        # adjoint: save the transmittance value across the bounce
        # checkpoint (saving is NOT detaching — named residuals stay
        # exact under vjp; integrators._path_bounce). HONESTY NOTE:
        # this spares the backward sweep the _MAX_NULL re-traversals
        # only for cotangent paths that consume tr's VALUE (throughput/
        # contribution chains). When MEDIUM parameters are gradient
        # targets, d tr/d sigma needs the loop's unsaved segment
        # primals, so that part of the backward DOES replay the loop —
        # the "never re-traces" property is exact for surface-parameter
        # adjoints and partial for media adjoints.
        from jax.ad_checkpoint import checkpoint_name
        tr = jax.tree.map(lambda a: checkpoint_name(a, "trace"), tr)
    return tr, sampler


def _vol_flight(scene, config, depth, carry):
    """Shared head of each volpath iteration: intersect, free flight,
    MIS-weighted emitter hit. `depth` may be static or traced."""
    from ..scene import scene as scene_mod
    (ray, sampler, throughput, result, med, active,
     prev_pdf, prev_delta) = carry
    C = config.n_channels

    si = scene_mod.ray_intersect(scene, ray)
    if config.remat:
        # save the flight intersection across the bounce checkpoint
        # (integrators._path_bounce note); identity outside a checkpoint
        # context, so the trailing flight-only call is unaffected
        from jax.ad_checkpoint import checkpoint_name
        named = jax.tree.map(lambda a: checkpoint_name(a, "trace"),
                             si.replace(tex=None))
        si = named.replace(tex=si.tex)
    t_surf = jnp.where(si.valid, si.t, jnp.float32(1e20))

    # --- free flight --------------------------------------------------
    u_ff, sampler = sampler.next_1d()
    t_col, med_event, w_ff, sampler = _sample_free_flight(
        scene, med, ray, t_surf, u_ff, sampler, config)
    throughput = throughput * swhere(active, w_ff, Spec.ones((), C))
    p_med = ray.o + ray.d * t_col

    # --- emitter hit (surface lanes that reached the surface) ---------
    surf_event = active & ~med_event
    em_pdf_hit = emitters.pdf_direction_hit(scene, ray.o, si, config)
    em_pdf_env = emitters.pdf_direction_env(scene, config, ray.d)
    em_pdf = jnp.where(si.valid, em_pdf_hit, em_pdf_env)
    w_mis = jnp.where(prev_delta, 1.0, mis_weight(prev_pdf, em_pdf))
    L_hit = emitters.eval_hit(scene, si, config)
    L_env = emitters.eval_env(scene, ray.d, ray.wavelengths, config)
    L = swhere(si.valid, L_hit, L_env)
    gate = surf_event if not config.hide_emitters else (surf_event & (depth > 0))
    result = result + (throughput * L * w_mis).masked(gate)
    active = active & (med_event | si.valid)
    return (si, t_col, med_event, p_med, sampler, throughput, result, active)


def _vol_bounce(scene, config, depth, carry):
    """One full volpath iteration: flight head + medium/surface scattering.

    carry = (ray, sampler, throughput, result, med, active, prev_pdf,
    prev_delta); `depth` may be static or traced (lax.scan)."""
    (ray, _, _, _, med, _, prev_pdf, prev_delta) = carry
    (si, t_col, med_event, p_med, sampler, throughput, result,
     active) = _vol_flight(scene, config, depth, carry)

    sig, alb, g_hg, _ = _medium_coeffs(scene, med, config,
                                       ray.wavelengths)

    # =========== medium interaction branch ===========================
    m_act = active & med_event
    wi_med = -ray.d
    # NEE from the medium point
    u_nee, sampler = sampler.next_1d()
    u2_nee, sampler = sampler.next_2d()
    ds, e_val = emitters.sample_direction(scene, p_med, ray.wavelengths,
                                          u_nee, u2_nee, config)
    tr_sh, sampler = eval_transmittance(
        scene, p_med + ds.d * 1e-4, ds.d,
        jnp.where(m_act & (ds.pdf > 0), ds.dist * (1 - 1e-3), 0.0), med,
        sampler, config, ray.wavelengths)
    ph_val = media_mod.phase_eval(g_hg, wi_med, ds.d)
    w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, ph_val))
    contrib = throughput * alb * e_val * tr_sh * \
        (ph_val * w_nee / jnp.maximum(ds.pdf, 1e-20))
    result = result + contrib.masked(m_act & (ds.pdf > 0))
    # phase sampling for the continuation ray
    u2_ph, sampler = sampler.next_2d()
    wo_med, ph_pdf = media_mod.phase_hg_sample(g_hg, wi_med, u2_ph)
    thr_med = throughput * alb  # value/pdf = 1 for HG sampling

    # =========== surface interaction branch ==========================
    s_act = active & ~med_event & si.valid
    flags = bsdf_mod.lane_flags(scene, si)
    is_null = (flags & bsdf_mod.F_NULL) != 0
    is_smooth = (flags & bsdf_mod.F_SMOOTH) != 0

    u_s, sampler = sampler.next_1d()
    u2_s, sampler = sampler.next_2d()
    ds_s, e_val_s = emitters.sample_direction(scene, si.p,
                                              si.wavelengths, u_s, u2_s,
                                              config)
    tr_s, sampler = eval_transmittance(
        scene, si.p + si.n * (jnp.sign(vdot(si.n, ds_s.d)) * 1e-4),
        ds_s.d,
        jnp.where(s_act & is_smooth & (ds_s.pdf > 0),
                  ds_s.dist * (1 - 1e-3), 0.0),
        med, sampler, config, si.wavelengths)
    wo_local = si.to_local(ds_s.d)
    f_val = bsdf_mod.eval_(scene, si, wo_local, config)
    f_pdf = bsdf_mod.pdf(scene, si, wo_local, config)
    w_nee_s = jnp.where(ds_s.delta, 1.0, mis_weight(ds_s.pdf, f_pdf))
    contrib_s = throughput * e_val_s * f_val * tr_s * \
        (w_nee_s / jnp.maximum(ds_s.pdf, 1e-20))
    result = result + contrib_s.masked(s_act & is_smooth & (ds_s.pdf > 0))

    u1_b, sampler = sampler.next_1d()
    u2_b, sampler = sampler.next_2d()
    bs, b_weight = bsdf_mod.sample(scene, si, u1_b, u2_b, config)
    wo_surf = si.to_world(bs.wo)
    delta_s = (bs.sampled_flags & bsdf_mod.F_DELTA) != 0

    # --- merge branches into the continuation wavefront ----------------
    new_d = vwhere(med_event, wo_med, wo_surf)
    new_o = vwhere(med_event, p_med,
                   si.p + si.n * (jnp.sign(vdot(si.n, wo_surf)) * 1e-4))
    throughput = swhere(m_act, thr_med,
                        swhere(s_act, throughput * b_weight, throughput))
    # null/transmission crossings switch the medium. The null term uses
    # the SAMPLED lobe, not the surface's static F_NULL flag: a
    # reflection off a mask surface's child BSDF stays on the same side
    # and must NOT transition (the static flag corrupted the lane's
    # medium index for mask-child reflections).
    null_sampled = (bs.sampled_flags & bsdf_mod.F_NULL) != 0
    crossing = s_act & (null_sampled |
                        ((bs.sampled_flags & bsdf_mod.F_DELTA_T) != 0) |
                        ((bs.sampled_flags & bsdf_mod.F_GLOSSY_T) != 0))
    med = jnp.where(crossing, _transition(scene, si, wo_surf, med), med)

    # MIS bookkeeping: a PURE null crossing is not a scattering event —
    # carry the previous vertex's (pdf, delta) through it unchanged
    # (volpath.cpp behavior). Resetting to delta=True here made the
    # next emitter hit MIS-weight 1 while the previous real vertex's
    # NEE had already sampled that emitter: ~double-counted emitters
    # seen through null boundaries. (The emitter pdf at the next hit is
    # then evaluated from the crossing point rather than the real
    # vertex — a small MIS-weight approximation, far inside the
    # double-count it replaces.)
    prev_pdf = jnp.where(med_event, ph_pdf,
                         jnp.where(null_sampled, prev_pdf, bs.pdf))
    prev_delta = jnp.where(med_event, False,
                           jnp.where(null_sampled, prev_delta, delta_s))
    active = active & (med_event | (s_act & (bs.pdf > 0)))
    active = active & throughput.any_positive()

    # Russian roulette (statically elided when it can never trigger; see
    # integrators._path_bounce for the stream-layout rationale)
    if config.rr_depth < config.max_depth:
        do_rr = (depth + 2 >= config.rr_depth) & (depth + 2 < config.max_depth)
        q = jnp.where(do_rr, jnp.minimum(throughput.hmax(), 0.95), 1.0)
        u_rr, sampler = sampler.next_1d()
        rr_alive = u_rr < q
        throughput = throughput / jnp.maximum(q, 1e-8)
        active = active & rr_alive

    ray = Ray.make(new_o, new_d,
                   maxt=jnp.where(active, jnp.inf, 0.0),
                   wavelengths=ray.wavelengths)
    return (ray, sampler, throughput, result, med, active,
            prev_pdf, prev_delta)


def sample_path_vol(scene, ray: Ray, sampler: Sampler, config: RenderConfig
                    ) -> Tuple[Spec, Sampler]:
    """volpath.cpp's transport loop over the wavefront: max_depth-1 full
    iterations (lax.scan — one compiled body) + a trailing flight-only
    iteration that collects the final emitter hit."""
    N = jnp.shape(ray.o.z)[0]
    C = config.n_channels
    # the scan carries the ray; a camera RayDifferential would change the
    # carry pytree after the first bounce rebuilds a plain Ray. Volumetric
    # transport doesn't track footprints (volpath.cpp likewise) — demote.
    ray = Ray(o=ray.o, d=ray.d, maxt=ray.maxt, time=ray.time,
              wavelengths=ray.wavelengths)
    carry = (ray, sampler,
             Spec.ones((N,), C), Spec.zeros((N,), C),
             jnp.full((N,), -1, jnp.int32),  # camera starts in vacuum
             jnp.ones(N, bool),
             jnp.zeros(N, jnp.float32),      # last directional pdf (MIS)
             jnp.ones(N, bool))              # depth-1 emitter hits unweighted

    n_full = config.max_depth - 1
    # selective remat: save the tagged traversal/transmittance outputs,
    # re-run only the scattering arithmetic in the backward sweep
    # (integrators.sample_path note; measured 2.73x -> 2.03x there)
    _remat_policy = (jax.checkpoint_policies.save_only_these_names("trace")
                     if config.remat else None)
    if n_full >= 2:
        def body(c, depth):
            return _vol_bounce(scene, config, depth, c), None

        if config.remat:
            body = jax.checkpoint(body, policy=_remat_policy)
        carry, _ = jax.lax.scan(body, carry, jnp.arange(n_full))
    elif n_full == 1:
        def step(c):
            return _vol_bounce(scene, config, 0, c)

        if config.remat:
            step = jax.checkpoint(step, policy=_remat_policy)
        carry = step(carry)

    # trailing iteration: intersect + free flight + emitter hit only
    (_si, _t, _me, _pm, sampler, _thr, result, _act) = \
        _vol_flight(scene, config, config.max_depth - 1, carry)
    return result, sampler

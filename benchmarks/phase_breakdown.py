"""Per-phase cost breakdown of the production render pass (VERDICT r04 #1).

`jax.profiler.trace` hangs on the tunneled axon runtime (measured
2026-08-20, docs/TPU_TRAVERSAL.md "Timing hygiene"), so the §5.1 phase
table is produced by STAGE-LADDER timing instead: each pipeline stage of
`render_pass` (integrators.py) is jitted as a standalone program on
realistic inputs — the actual primary/bounce wavefronts of the gallery
scene — and timed with the bench protocol (fetch-first warmup, median of
5 seed-varied reps). The full pass is timed the same way; the residual
(full - sum of stages) is fusion overlap + scan overhead and is reported
honestly as such.

Stages (mirroring one bounce of integrators._path_bounce):
  raygen        sampler seeding + film uv + camera ray
  sort          coherence key + 9-operand lax.sort + 6-operand unsort
                (the presort bracket around every traversal)
  kernel        the raw Pallas closest-hit sweep on PRE-SORTED rays
  csi           compute_surface_interaction (vertex/normal/uv gathers +
                planar shading-record math)
  nee           emitter direction sampling + bsdf eval/pdf + MIS
  shadow        sorted any-hit traversal of the NEE shadow rays
  bsdfsample    bsdf sampling + frame transforms + ray spawn
  bounce        sorted closest-hit of the BSDF continuation rays + csi
  emitter_eval  emitter-hit/env radiance + pdfs + MIS combine
  film          filter accumulation + develop

Usage (TPU, single tenant — run alone):
    timeout 1800 python benchmarks/phase_breakdown.py [subdiv]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import mitsuba2_tpu as mi  # noqa: E402
from mitsuba2_tpu.core.geometry import Ray  # noqa: E402
from mitsuba2_tpu.core.spec import Spec, swhere  # noqa: E402
from mitsuba2_tpu.core.vec import Vec2, Vec3  # noqa: E402
from mitsuba2_tpu.render import bsdf as bsdf_mod  # noqa: E402
from mitsuba2_tpu.render import emitters, film as film_mod, sensors  # noqa: E402
from mitsuba2_tpu.render.integrators import (  # noqa: E402
    _render_all_passes_jit, mis_weight)
from mitsuba2_tpu.render.sampler import Sampler  # noqa: E402
from mitsuba2_tpu.scene import scene as scene_mod  # noqa: E402
from mitsuba2_tpu.scene.presets import mesh_gallery  # noqa: E402


def median_time(run, warmups=2, reps=5):
    for r in range(warmups):
        out = run(r)
        jax.block_until_ready(out)
        if r == 0:
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(warmups + r))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import os
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    smoke = os.environ.get("MI_PB_SMOKE", "") == "1"
    if smoke:  # logic-only CI pass on CPU; numbers meaningless
        jax.config.update("jax_platforms", "cpu")
    R, SPP = (32, 2) if smoke else (256, 16)
    # MI_PB_SPP: match a bench metric's wavefront (e.g. 4 for the 491k
    # row's 262k lanes)
    SPP = int(os.environ.get("MI_PB_SPP", SPP))
    cfg = mi.RenderConfig(width=R, height=R, spp=SPP, spp_per_pass=SPP,
                          max_depth=3, rr_depth=8)
    scene = mesh_gallery(subdiv=subdiv)
    H, W = cfg.height, cfg.width
    sppc = cfg.spp_per_pass
    n = sppc * H * W
    print(f"gallery subdiv={subdiv} n_prims={scene.n_prims} lanes={n}",
          flush=True)

    # ---- stage inputs (built once, on device) ------------------------------
    def raygen(seed):
        lane = jnp.arange(n, dtype=jnp.uint32)
        sampler = Sampler.seed(jnp.uint32(seed), lane_idx=lane)
        pix = jnp.arange(n, dtype=jnp.int32) % (H * W)
        x = (pix % W).astype(jnp.float32)
        y = (pix // W).astype(jnp.float32)
        jitter, sampler = sampler.next_2d()
        uv = sensors.film_uv(x, y, jitter, W, H)
        ray = sensors.sample_ray(scene, uv, None, None)
        return ray, sampler, jitter

    j_raygen = jax.jit(lambda s: raygen(s)[0])

    # presort bracket alone: key + 9-operand sort + 6-operand unsort
    def sort_bracket(ray):
        o, d = ray.o, ray.d
        t_max = jnp.broadcast_to(jnp.asarray(jnp.inf, jnp.float32), (n,))
        key = scene_mod._coherence_key(scene, o, d, t_max)
        lane = jnp.arange(n, dtype=jnp.int32)
        key, ox, oy, oz, dx, dy, dz, tm, lane = jax.lax.sort(
            (key, o.x, o.y, o.z, d.x, d.y, d.z, t_max, lane), num_keys=1)
        # unsort payload mirror: 5 result operands keyed by lane
        _, a, b, c, dd, e = jax.lax.sort(
            (lane, tm, ox, oy, oz, dx), num_keys=1)
        return a, b, c, dd, e

    j_sort = jax.jit(sort_bracket)

    # raw kernel on PRE-sorted rays (no sort, no unsort, no csi)
    from mitsuba2_tpu.kernels import traverse_pallas

    def presorted(ray):
        o, d = ray.o, ray.d
        t_max = jnp.broadcast_to(jnp.asarray(jnp.inf, jnp.float32), (n,))
        key = scene_mod._coherence_key(scene, o, d, t_max)
        ops = jax.lax.sort(
            (key, o.x, o.y, o.z, d.x, d.y, d.z, t_max), num_keys=1)
        return Vec3(*ops[1:4]), Vec3(*ops[4:7]), ops[7]

    j_kernel = jax.jit(lambda o, d, tm: traverse_pallas.
                       ray_intersect_preliminary(scene, o, d, tm))
    j_anyhit = jax.jit(lambda o, d, tm: traverse_pallas.
                       ray_test(scene, o, d, tm))

    j_intersect_full = jax.jit(
        lambda ray: scene_mod.ray_intersect(scene, ray))

    # csi alone: preliminary (t, prim, u, v) -> shading record
    from mitsuba2_tpu.render.interaction import PreliminaryIntersection

    def csi_only(ray, t, prim, u, v):
        pi = PreliminaryIntersection(t=t, prim_index=prim,
                                     prim_uv=Vec2(u, v))
        return scene_mod.compute_surface_interaction(scene, ray, pi)

    j_csi = jax.jit(csi_only)

    def nee_math(si, active, throughput, u_nee, u2_nee):
        flags = bsdf_mod.lane_flags(scene, si)
        is_smooth = (flags & bsdf_mod.F_SMOOTH) != 0
        ds, e_val = emitters.sample_direction(scene, si.p, si.wavelengths,
                                              u_nee, u2_nee, cfg)
        wo_local = si.to_local(ds.d)
        f_val = bsdf_mod.eval_(scene, si, wo_local, cfg)
        f_pdf = bsdf_mod.pdf(scene, si, wo_local, cfg)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, f_pdf))
        contrib = throughput * e_val * f_val * \
            (w_nee / jnp.maximum(ds.pdf, 1e-20))
        sr = si.spawn_ray_d(ds.d, maxt=ds.dist * (1.0 - 1e-3))
        return contrib.masked(active & is_smooth), sr

    j_nee = jax.jit(nee_math)

    def bsdf_sample_stage(si, u1, u2):
        bs, b_weight = bsdf_mod.sample(scene, si, u1, u2, cfg)
        d = si.to_world(bs.wo)
        nr = si.spawn_ray_d(d)
        return bs, b_weight, nr

    j_bsdfsample = jax.jit(bsdf_sample_stage)

    def emitter_eval_stage(si, si_next, bs_pdf, d, throughput):
        em_pdf_hit = emitters.pdf_direction_hit(scene, si.p, si_next, cfg)
        em_pdf_env = emitters.pdf_direction_env(scene, cfg, d)
        em_pdf = jnp.where(si_next.valid, em_pdf_hit, em_pdf_env)
        w_bsdf = mis_weight(bs_pdf, em_pdf)
        L_hit = emitters.eval_hit(scene, si_next, cfg)
        L_env = emitters.eval_env(scene, d, si.wavelengths, cfg)
        L = swhere(si_next.valid, L_hit, L_env)
        return (throughput * L * w_bsdf).to_array()

    j_emitter = jax.jit(emitter_eval_stage)

    def film_stage(rgb, jitter):
        image = jnp.zeros((H, W, cfg.n_image_channels), jnp.float32)
        wsum = jnp.zeros((), jnp.float32)
        image, wsum = film_mod.accumulate_pass(
            image, wsum, Spec.from_array(rgb), jitter, cfg)
        return film_mod.develop(image, wsum)

    j_film = jax.jit(film_stage)

    j_ray_test = jax.jit(lambda sr: scene_mod.ray_test(scene, sr))

    # ---- materialize realistic wavefronts ----------------------------------
    ray0, sampler0, jitter0 = raygen(0)
    so, sd, stm = jax.block_until_ready(jax.jit(presorted)(ray0))
    si1 = jax.block_until_ready(j_intersect_full(ray0))
    act1 = si1.valid
    tp1 = Spec.ones((n,), cfg.n_channels)
    u_nee, sampler0 = sampler0.next_1d()
    u2_nee, sampler0 = sampler0.next_2d()
    u1_b, sampler0 = sampler0.next_1d()
    u2_b, sampler0 = sampler0.next_2d()
    (contrib1, shadow1) = jax.block_until_ready(
        j_nee(si1, act1, tp1, u_nee, u2_nee))
    bs1, bw1, nray1 = jax.block_until_ready(j_bsdfsample(si1, u1_b, u2_b))
    si2 = jax.block_until_ready(j_intersect_full(nray1))
    rgb1 = jax.block_until_ready(
        j_emitter(si1, si2, bs1.pdf, nray1.d, tp1))
    # bounce-2 wavefront (from si2) for the second-bounce coherence level
    bs2, bw2, nray2 = jax.block_until_ready(j_bsdfsample(si2, u2_nee[0],
                                                         u2_b))
    _, shadow2 = jax.block_until_ready(
        j_nee(si2, si2.valid, tp1, u_nee, u2_nee))

    def vary(ray, r):
        # different seeds per rep: nudge directions so no two dispatches
        # are identical (the tunnel memoizes identical dispatches)
        eps = jnp.float32(1e-6) * (r + 1)
        from mitsuba2_tpu.core.vec import vnormalize
        return ray.replace(d=vnormalize(Vec3(ray.d.x + eps, ray.d.y,
                                             ray.d.z)))

    # ---- the ladder --------------------------------------------------------
    t = {}
    t["raygen"] = median_time(lambda r: j_raygen(jnp.uint32(r)))
    t["sort_bracket"] = median_time(lambda r: j_sort(vary(ray0, r)))
    t["kernel_closest_sorted"] = median_time(
        lambda r: j_kernel(Vec3(so.x + 1e-6 * (r + 1), so.y, so.z), sd,
                           stm))
    # primary rays in raw (spp, H, W) pixel order — is the presort
    # bracket worth its ~37 ms on the PRIMARY wavefront, whose pixel
    # order is already spatially coherent?
    tmax_inf = jnp.broadcast_to(jnp.asarray(jnp.inf, jnp.float32), (n,))
    t["kernel_closest_pixelorder"] = median_time(
        lambda r: j_kernel(vary(ray0, r).o, vary(ray0, r).d, tmax_inf))
    t["intersect_full_primary"] = median_time(
        lambda r: j_intersect_full(vary(ray0, r)))
    t["csi_only"] = None  # derived below
    t["nee_math"] = median_time(
        lambda r: j_nee(si1, act1, tp1, u_nee + 1e-6 * r, u2_nee))
    t["shadow_b1"] = median_time(lambda r: j_ray_test(vary(shadow1, r)))
    t["bsdf_sample"] = median_time(
        lambda r: j_bsdfsample(si1, u1_b + 1e-6 * r, u2_b))
    t["bounce_trace_b1"] = median_time(
        lambda r: j_intersect_full(vary(nray1, r)))
    t["shadow_b2"] = median_time(lambda r: j_ray_test(vary(shadow2, r)))
    t["bounce_trace_b2"] = median_time(
        lambda r: j_intersect_full(vary(nray2, r)))
    t["emitter_eval"] = median_time(
        lambda r: j_emitter(si1, si2, bs1.pdf + 1e-9 * r, nray1.d, tp1))
    t["film"] = median_time(lambda r: j_film(rgb1 + 1e-9 * r, jitter0))
    t["FULL_PASS"] = median_time(
        lambda r: _render_all_passes_jit(scene, cfg, r, 1))

    # csi = full primary intersect - (sort bracket + raw kernel)
    t["csi_only"] = (t["intersect_full_primary"] - t["sort_bracket"]
                     - t["kernel_closest_sorted"])

    # ---- report ------------------------------------------------------------
    full = t["FULL_PASS"]
    # model: raygen + primary intersect + per-bounce (nee + shadow +
    # bsdfsample + bounce trace + emitter eval) x2 + film
    model = (t["raygen"] + t["intersect_full_primary"]
             + t["nee_math"] * 2 + t["shadow_b1"] + t["shadow_b2"]
             + t["bsdf_sample"] * 2
             + t["bounce_trace_b1"] + t["bounce_trace_b2"]
             + t["emitter_eval"] * 2 + t["film"])
    print(f"\n{'stage':26s} {'ms':>9s} {'% of full':>9s}")
    for k, v in t.items():
        if v is None:
            continue
        print(f"{k:26s} {v * 1e3:9.2f} {100 * v / full:8.1f}%")
    print(f"{'SUM(model)':26s} {model * 1e3:9.2f} {100 * model / full:8.1f}%")
    print(f"residual (overlap/scan) {100 * (full - model) / full:8.1f}%")
    rays = n * (1 + 2 * (cfg.max_depth - 1))
    print(f"\nfull-pass rate: {rays / full / 1e6:.3f} Mrays/s "
          f"({rays / 1e6:.2f} M rays, {full * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()

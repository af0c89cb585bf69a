"""Benchmark: Mrays/s on the Cornell box + the BVH-bound mesh gallery.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever accelerator jax exposes (the driver runs it on one TPU
chip). Rays counted: primary + per-bounce (shadow + bounce) wavefront rays,
i.e. lanes * (1 + 2*(max_depth-1)) per pass — every lane pays lockstep
traversal cost, so this is the honest per-chip work metric. Compilation is
excluded (warmup passes).

Protocol (uniform across metrics, BASELINE.md): 2 warmups (the tunneled
runtime's first post-compile dispatches are erratically slow), then the
MEDIAN of 5 single-run timings, each with a DIFFERENT seed so no two
dispatches are identical (the tunneled runtime memoizes identical
dispatches — docs/TPU_TRAVERSAL.md). The old mean-of-2 gallery protocol
under-reported by ~30% (VERDICT round-2 weak #4).

Round-3 protocol fix (docs/TPU_TRAVERSAL.md "Timing hygiene"): one warmup
output is FETCHED to host before timing — without it the tunneled runtime
defers work and block_until_ready returns immediately. This makes the
Cornell numbers drop vs BENCH_r02 (488 -> ~366 Mrays/s fwd): the r02
Cornell phase ran before the process's first fetch, so part of its timing
was deferred-mode fantasy; the gallery metrics (measured after the first
fetch) were honest in both rounds and are directly comparable.

Metrics:
- cornell_box_fwd_mrays_per_s: 32-prim scene (brute-force intersector) —
  measures shading + wavefront machinery throughput.
- mesh_gallery_fwd_mrays_per_s: ~31k-tri scene (BVH traversal path) —
  measures the acceleration structure, the reference's kd-tree/OptiX
  territory.
- mesh_gallery_fwd_adjoint_mrays_per_s: forward + two-phase adjoint on
  the BVH-bound scene (BASELINE.md reports fwd and fwd+adjoint
  separately — VERDICT round-2 missing #6).
- cornell_box_fwd_adjoint_mrays_per_s: same on the Cornell box.
- cornell_reparam_mrays_per_s: forward with every-bounce reparameterized
  transport ON (config 5's integrator; K_AUX auxiliary traces per warped
  direction make this the heaviest per-ray configuration).
- mesh_gallery_491k_fwd_mrays_per_s: ~491k-tri gallery (subdiv=6) — the
  scale proof that the accel path holds beyond VMEM-resident tables.

MI_BENCH_BACKEND=<auto|pallas|bvh8|bvh8mxu|...> forces the intersection
backend (hardware sweeps); MI_MXU_LEAVES/MI_MXU_BLOCK/MI_CLUSTER_K knobs
pass through to the kernels.
"""
import json
import os
import signal
import sys
import time


def _watchdog(sig, frame):
    print("bench.py watchdog: TPU backend unresponsive (device init or "
          "dispatch hung) — the remote axon TPU can wedge after a "
          "device fault; re-run on a healthy chip", file=sys.stderr)
    os._exit(1)


def _emit(metric, value, unit="Mrays/s"):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        # no published reference numbers exist (BASELINE.md); ratio vs the
        # first recorded value of this bench once one exists
        "vs_baseline": 1.0,
    }), flush=True)


def _median_time(jax, run, warmups=2, reps=5):
    """2 seed-varied warmups then the median of `reps` seed-varied runs.

    Timing hygiene on the tunneled axon runtime (2026-08-19): until the
    process performs one device->host FETCH, block_until_ready returns
    immediately and bur-only timings are fantasy (docs/TPU_TRAVERSAL.md,
    "Timing hygiene"). One warmup output is fetched here to flip the
    stream to synchronous before anything is timed."""
    import numpy as _np
    for r in range(warmups):
        out = run(r)
        jax.block_until_ready(out)
        if r == 0:
            _ = _np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(warmups + r))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _rays_per_pass(cfg):
    lanes = cfg.width * cfg.height * cfg.spp_per_pass
    return lanes * (1 + 2 * (cfg.max_depth - 1))


def main():
    # fail fast instead of hanging the driver if the TPU runtime is wedged.
    # The alarm is RE-ARMED before each metric: first compiles of the big
    # programs legitimately take many minutes on the tunneled runtime, but
    # no single phase may stall longer than its budget.
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(1200)
    import jax
    import jax.numpy as jnp

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.diff.adjoint import render_l2_grad
    from mitsuba2_tpu.render.integrators import _render_all_passes_jit
    from mitsuba2_tpu.scene.presets import cornell_box, mesh_gallery

    from mitsuba2_tpu.utils import jaxcache
    jaxcache.configure(jax)

    forced = os.environ.get("MI_BENCH_BACKEND", "")
    if forced:
        from mitsuba2_tpu.scene import scene as scene_mod
        scene_mod.set_backend(forced)
    # MI_BENCH_SMOKE=1: tiny shapes, logic-only CI pass (numbers meaningless)
    smoke = os.environ.get("MI_BENCH_SMOKE", "") == "1"
    R, SPP = (32, 4) if smoke else (256, 64)

    # ---- 1) Cornell box, forward ------------------------------------------
    scene = cornell_box()
    config = mi.RenderConfig(width=R, height=R, spp=SPP,
                             spp_per_pass=SPP // 4,
                             max_depth=4, rr_depth=8)
    n_passes = config.spp // config.spp_per_pass

    dt = _median_time(jax, lambda r: _render_all_passes_jit(
        scene, config, r, n_passes))
    _emit("cornell_box_fwd_mrays_per_s",
          _rays_per_pass(config) * n_passes / dt / 1e6)

    # ---- 2) Mesh gallery (~31k tris), forward: the BVH-bound path ---------
    # each accel metric re-arms the alarm and is individually guarded so a
    # failure still lets the remaining metrics print
    gallery = None
    gcfg = mi.RenderConfig(width=R, height=R, spp=4 if smoke else SPP // 4,
                           spp_per_pass=4,
                           max_depth=3, rr_depth=8)
    g_passes = gcfg.spp // gcfg.spp_per_pass
    signal.alarm(1200)
    try:
        gallery = mesh_gallery(subdiv=4)
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            gallery, gcfg, r, g_passes))
        _emit("mesh_gallery_fwd_mrays_per_s",
              _rays_per_pass(gcfg) * g_passes / dt / 1e6)
    except Exception as e:  # pragma: no cover - defensive for the driver
        print(f"mesh_gallery metric failed: {e!r}", file=sys.stderr)

    # ---- 3) Mesh gallery, forward + adjoint (BVH-bound adjoint) -----------
    signal.alarm(1200)
    try:
        gtarget = jnp.zeros((gcfg.height, gcfg.width, 3), jnp.float32)
        dt = _median_time(jax, lambda r: render_l2_grad(
            gallery, gcfg, gtarget, seed=r))
        # forward pass + adjoint re-trace both traverse the full wavefront
        _emit("mesh_gallery_fwd_adjoint_mrays_per_s",
              2 * _rays_per_pass(gcfg) * g_passes / dt / 1e6)
    except Exception as e:  # pragma: no cover
        print(f"mesh_gallery adjoint metric failed: {e!r}", file=sys.stderr)

    # ---- 4) Cornell box, forward + adjoint --------------------------------
    signal.alarm(1200)
    target = jnp.zeros((config.height, config.width, 3), jnp.float32)
    dt = _median_time(jax, lambda r: render_l2_grad(
        scene, config, target, seed=r))
    _emit("cornell_box_fwd_adjoint_mrays_per_s",
          2 * _rays_per_pass(config) * n_passes / dt / 1e6)

    # ---- 5) Cornell box, reparameterized forward (config 5's transport) ---
    signal.alarm(1200)
    try:
        rcfg = config.replace(reparam=True, spp=4 if smoke else 16,
                              spp_per_pass=4)
        r_passes = rcfg.spp // rcfg.spp_per_pass
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            scene, rcfg, r, r_passes))
        _emit("cornell_reparam_mrays_per_s",
              _rays_per_pass(rcfg) * r_passes / dt / 1e6)
    except Exception as e:  # pragma: no cover
        print(f"cornell_reparam metric failed: {e!r}", file=sys.stderr)

    # ---- 6) ~491k-tri gallery (subdiv=6): the scale proof -----------------
    signal.alarm(1200)
    try:
        big = mesh_gallery(subdiv=3 if smoke else 6)
        bcfg = mi.RenderConfig(width=R, height=R, spp=4, spp_per_pass=4,
                               max_depth=3, rr_depth=8)
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            big, bcfg, r, 1))
        _emit("mesh_gallery_491k_fwd_mrays_per_s",
              _rays_per_pass(bcfg) / dt / 1e6)
    except Exception as e:  # pragma: no cover
        print(f"491k metric failed: {e!r}", file=sys.stderr)

    signal.alarm(0)


if __name__ == "__main__":
    main()

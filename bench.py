"""Benchmark: Mrays/s on the Cornell box + the BVH-bound mesh gallery.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever accelerator jax exposes (the driver runs it on one TPU
chip). Rays counted: primary + per-bounce (shadow + bounce) wavefront rays,
i.e. lanes * (1 + 2*(max_depth-1)) per pass — every lane pays lockstep
traversal cost, so this is the honest per-chip work metric. Compilation is
excluded (warmup pass).

Metrics:
- cornell_box_fwd_mrays_per_s: 32-prim scene (brute-force intersector) —
  measures shading + wavefront machinery throughput.
- mesh_gallery_fwd_mrays_per_s: ~31k-tri scene (BVH traversal path) —
  measures the acceleration structure, the reference's kd-tree/OptiX
  territory (VERDICT.md round-2 item 2).
- cornell_box_fwd_adjoint_mrays_per_s: forward + two-phase adjoint
  (BASELINE.md protocol reports forward and forward+adjoint separately).
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

    # ---- 1) Cornell box, forward ------------------------------------------
    scene = cornell_box()
    config = mi.RenderConfig(width=256, height=256, spp=64, spp_per_pass=16,
                             max_depth=4, rr_depth=8)
    n_lanes = config.width * config.height * config.spp_per_pass
    rays_per_pass = n_lanes * (1 + 2 * (config.max_depth - 1))
    n_passes = config.spp // config.spp_per_pass

    img, w = _render_all_passes_jit(scene, config, 0, n_passes)
    jax.block_until_ready((img, w))
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        img, w = _render_all_passes_jit(scene, config, r + 1, n_passes)
    jax.block_until_ready((img, w))
    dt = time.perf_counter() - t0
    _emit("cornell_box_fwd_mrays_per_s",
          rays_per_pass * n_passes * reps / dt / 1e6)

    # ---- 2) Mesh gallery (~31k tris), forward: the BVH-bound path ---------
    # wrapped so a failure here still lets the remaining metrics print
    signal.alarm(1200)
    try:
        _bench_gallery(jax, mi, _render_all_passes_jit, mesh_gallery)
    except Exception as e:  # pragma: no cover - defensive for the driver
        print(f"mesh_gallery metric failed: {e!r}", file=sys.stderr)

    # ---- 3) Cornell box, forward + adjoint --------------------------------
    signal.alarm(1200)
    target = jnp.zeros((config.height, config.width, 3), jnp.float32)
    # two warmups (the tunneled runtime's first post-compile dispatches
    # are erratically slow), then MEDIAN of 5 single-run timings — the
    # mean-of-2 protocol under-reported by ~30% vs mrays.py's
    # best-of-warm on the same chip (278 vs 386 Mrays/s, round 2)
    for r in range(2):
        out = render_l2_grad(scene, config, target, seed=r)
        jax.block_until_ready(out)
    times = []
    for r in range(5):
        t0 = time.perf_counter()
        out = render_l2_grad(scene, config, target, seed=r + 2)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    # forward pass + adjoint re-trace both traverse the full wavefront
    _emit("cornell_box_fwd_adjoint_mrays_per_s",
          2 * rays_per_pass * n_passes / dt / 1e6)

    signal.alarm(0)


def _bench_gallery(jax, mi, _render_all_passes_jit, mesh_gallery):
    import time
    gallery = mesh_gallery(subdiv=4)
    gcfg = mi.RenderConfig(width=256, height=256, spp=16, spp_per_pass=4,
                           max_depth=3, rr_depth=8)
    g_lanes = gcfg.width * gcfg.height * gcfg.spp_per_pass
    g_rays_pass = g_lanes * (1 + 2 * (gcfg.max_depth - 1))
    g_passes = gcfg.spp // gcfg.spp_per_pass

    img, w = _render_all_passes_jit(gallery, gcfg, 0, g_passes)
    jax.block_until_ready((img, w))
    t0 = time.perf_counter()
    g_reps = 2
    for r in range(g_reps):
        img, w = _render_all_passes_jit(gallery, gcfg, r + 1, g_passes)
    jax.block_until_ready((img, w))
    dt = time.perf_counter() - t0
    _emit("mesh_gallery_fwd_mrays_per_s",
          g_rays_pass * g_passes * g_reps / dt / 1e6)


if __name__ == "__main__":
    main()

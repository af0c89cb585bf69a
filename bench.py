"""Benchmark: Mrays/s on the Cornell box (BASELINE.md protocol).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever accelerator jax exposes (the driver runs it on one TPU
chip). Rays counted: primary + per-bounce (shadow + bounce) wavefront rays,
i.e. lanes * (1 + 2*(max_depth-1)) per pass — every lane pays lockstep
traversal cost, so this is the honest per-chip work metric. Compilation is
excluded (warmup pass); forward only (forward+adjoint reported once the
adjoint integrator lands).
"""
import json
import os
import signal
import sys
import time


def _watchdog(sig, frame):
    print("bench.py watchdog: TPU backend unresponsive (device init or "
          "dispatch hung >8 min) — the remote axon TPU can wedge after a "
          "device fault; re-run on a healthy chip", file=sys.stderr)
    os._exit(1)


def main():
    # fail fast instead of hanging the driver if the TPU runtime is wedged
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(480)
    import jax
    import jax.numpy as jnp

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import _render_all_passes_jit
    from mitsuba2_tpu.scene.presets import cornell_box

    scene = cornell_box()
    config = mi.RenderConfig(width=256, height=256, spp=64, spp_per_pass=16,
                             max_depth=4, rr_depth=8)

    n_lanes = config.width * config.height * config.spp_per_pass
    rays_per_pass = n_lanes * (1 + 2 * (config.max_depth - 1))
    n_passes = config.spp // config.spp_per_pass

    # warmup / compile (the whole spp-64 render is ONE dispatch: pass loop
    # is a lax.scan inside the program, so tunnel round-trips don't count
    # against device throughput)
    img, w = _render_all_passes_jit(scene, config, 0, n_passes)
    jax.block_until_ready((img, w))

    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        img, w = _render_all_passes_jit(scene, config, r + 1, n_passes)
    jax.block_until_ready((img, w))
    t1 = time.perf_counter()

    total_rays = rays_per_pass * n_passes * reps
    mrays = total_rays / (t1 - t0) / 1e6
    signal.alarm(0)
    print(json.dumps({
        "metric": "cornell_box_fwd_mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        # no published reference numbers exist (BASELINE.md); ratio vs the
        # first recorded value of this bench once one exists
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()

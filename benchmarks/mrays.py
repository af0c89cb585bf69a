"""Mrays/s benchmark: forward and forward+adjoint, per BASELINE.md.

Usage: python benchmarks/mrays.py [--width 256] [--spp 64] [--scene cornell]

Reports Mrays/s for (a) the forward render pass and (b) the adjoint
(render + backprop to scene parameters) — the BASELINE.json headline
metric "Mrays/s/chip, forward + adjoint, Cornell box". Rays counted as in
bench.py: lanes * (1 + 2*(max_depth-1)) per pass (primary + per-bounce
shadow + continuation rays; every lane pays lockstep traversal cost).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--spp-per-pass", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "veach"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.diff.adjoint import (_adjoint_all, _forward_all,
                                           _pass_seed)
    from mitsuba2_tpu.scene.presets import cornell_box, veach_mis

    scene = cornell_box() if args.scene == "cornell" else veach_mis()
    config = mi.RenderConfig(width=args.width, height=args.height,
                             spp=args.spp, spp_per_pass=args.spp_per_pass,
                             max_depth=args.max_depth, rr_depth=8)
    n_passes = config.spp // config.spp_per_pass
    lanes = config.width * config.height * config.spp_per_pass
    rays_per_pass = lanes * (1 + 2 * (config.max_depth - 1))

    results = {"scene": args.scene, "device": jax.devices()[0].platform,
               "width": args.width, "spp": args.spp,
               "max_depth": config.max_depth}

    # ---- forward (all passes fused into one dispatch) ---------------------
    out = _forward_all(scene, config, 0, n_passes)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        out = _forward_all(scene, config, r + 1, n_passes)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    results["forward_mrays_s"] = round(
        reps * rays_per_pass * n_passes / dt / 1e6, 2)

    # ---- forward + adjoint (fused dispatches) -------------------------------
    rcfg = config.replace(remat=True)
    ct = jnp.ones((config.height, config.width, rcfg.n_image_channels),
                  jnp.float32)
    # warm BOTH programs with the exact timed config (remat=True retraces)
    jax.block_until_ready(_forward_all(scene, rcfg, 0, n_passes))
    g = _adjoint_all(scene, rcfg, 0, n_passes, ct)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for r in range(reps):
        # the render_and_grad schedule end to end: forward accumulation +
        # adjoint sweep (each a single dispatch)
        out = _forward_all(scene, rcfg, r + 1, n_passes)
        g = _adjoint_all(scene, rcfg, r + 1, n_passes, ct)
        jax.block_until_ready((out, g))
    dt = time.perf_counter() - t0
    # adjoint re-traces the wavefront: count forward + fwd-of-vjp + bwd rays
    results["adjoint_mrays_s"] = round(
        3 * reps * rays_per_pass * n_passes / dt / 1e6, 2)
    results["adjoint_wall_s"] = round(dt / reps, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

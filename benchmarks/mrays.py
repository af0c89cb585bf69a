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
import time


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
    from mitsuba2_tpu.diff.adjoint import (_adjoint_pass, _forward_pass,
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

    # ---- forward ----------------------------------------------------------
    out = _forward_pass(scene, config, _pass_seed(0, 0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = None
    for p in range(n_passes):
        img, w = _forward_pass(scene, config, _pass_seed(0, p))
        acc = img if acc is None else acc + img
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    results["forward_mrays_s"] = round(rays_per_pass * n_passes / dt / 1e6, 2)

    # ---- forward + adjoint --------------------------------------------------
    rcfg = config.replace(remat=True)
    ct = jnp.ones((config.height, config.width, rcfg.n_image_channels),
                  jnp.float32)
    g = _adjoint_pass(scene, rcfg, _pass_seed(0, 0), ct)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for p in range(n_passes):
        # forward accumulation + one adjoint sweep per pass (the
        # render_and_grad schedule, measured end to end)
        img, w = _forward_pass(scene, rcfg, _pass_seed(0, p))
        g = _adjoint_pass(scene, rcfg, _pass_seed(0, p), ct)
    jax.block_until_ready((img, g))
    dt = time.perf_counter() - t0
    # adjoint re-traces the wavefront: count forward + backward rays (2x)
    results["adjoint_mrays_s"] = round(
        3 * rays_per_pass * n_passes / dt / 1e6, 2)
    results["adjoint_wall_s"] = round(dt, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

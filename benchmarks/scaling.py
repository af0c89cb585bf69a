"""Multi-chip scaling benchmark (BASELINE.md: >=80% efficiency target).

On a real pod slice this measures rays/s at 1 chip vs all chips through
the shard_map render path (dist/sharding.py). Off-pod it still runs on a
virtual CPU mesh (--force-cpu-mesh N) to validate the collective logic —
virtual-device numbers measure correctness, not ICI bandwidth.

Usage: python benchmarks/scaling.py [--force-cpu-mesh 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-cpu-mesh", type=int, default=0)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--spp", type=int, default=None,
                    help="default: 8 per device")
    ap.add_argument("--max-depth", type=int, default=4)
    args = ap.parse_args()

    if args.force_cpu_mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args.force_cpu_mesh}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.force_cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.dist.sharding import (_render_pass_sharded_jit,
                                            make_mesh)
    from mitsuba2_tpu.scene.presets import cornell_box

    devices = jax.devices()
    n_total = len(devices)
    scene = cornell_box()

    def rays_per_s(n_dev):
        spp = args.spp or 8 * n_dev
        config = mi.RenderConfig(width=args.width, height=args.width,
                                 spp=spp, spp_per_pass=spp,
                                 max_depth=args.max_depth, rr_depth=8)
        mesh = make_mesh(devices[:n_dev])
        out = _render_pass_sharded_jit(scene, config, jnp.uint32(0), mesh)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            out = _render_pass_sharded_jit(scene, config,
                                           jnp.uint32(r + 1), mesh)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        lanes = config.width * config.height * spp
        rays = lanes * (1 + 2 * (config.max_depth - 1))
        return rays / dt

    r1 = rays_per_s(1)
    rN = rays_per_s(n_total)
    eff = rN / (n_total * r1)
    print(json.dumps({
        "device": devices[0].platform, "n_devices": n_total,
        "mrays_s_1dev": round(r1 / 1e6, 2),
        "mrays_s_all": round(rN / 1e6, 2),
        "scaling_efficiency": round(eff, 3),
        "note": ("virtual CPU mesh: logic check only"
                 if args.force_cpu_mesh else "real devices"),
    }))


if __name__ == "__main__":
    main()

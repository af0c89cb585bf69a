"""Multi-chip inverse rendering — the BASELINE config-4/5 flagship path.

Shards the ray wavefront over a device mesh (`shard_map`), runs the full
two-phase radiative-backprop adjoint with gradient `psum` over ICI, and
optimizes the Cornell box's wall albedos toward a target render with
Adam. On a machine without multiple accelerators, run it on a virtual
8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_train.py --cpu

On a TPU pod slice, `jax.distributed.initialize()` (dist/multihost.py)
makes the same code span hosts. N-device sampling is bit-identical to
1-device sampling (deterministic lane offsets), so results are
mesh-size-invariant.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.diff.adjoint import diff_tables, with_tables
    from mitsuba2_tpu.dist.sharding import (make_mesh, render_sharded,
                                            train_step_sharded)
    from mitsuba2_tpu.scene.presets import cornell_box

    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} x {mesh.devices.flat[0].platform}")
    cfg = mi.RenderConfig(width=args.res, height=args.res, spp=args.spp,
                          spp_per_pass=args.spp, max_depth=3)

    target_scene = cornell_box()                    # true albedos
    target = render_sharded(target_scene, cfg.replace(seed=999), mesh)  # decorrelate MC noise from the training seeds

    # start from a gray box: reset the wall albedos (slot rgb columns)
    # but leave slot coefficients / kind columns intact
    t = diff_tables(target_scene)
    md = np.asarray(t["mat_data"]).copy()
    md[:, 0:3] = 0.5
    start = with_tables(target_scene,
                        {**t, "mat_data": jax.numpy.asarray(md)})

    scene, opt_state = start, None
    t0 = time.time()
    for step in range(args.steps):
        scene, opt_state, loss, _ = train_step_sharded(
            scene, cfg, target, seed=step, mesh=mesh, opt_state=opt_state,
            lr=0.08)
        if step % 4 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {float(loss):.5f}")
    print(f"{args.steps} sharded adjoint steps in {time.time()-t0:.1f}s")

    err0 = np.abs(np.asarray(diff_tables(start)["mat_data"][:, :3])
                  - np.asarray(diff_tables(target_scene)["mat_data"][:, :3])).mean()
    err1 = np.abs(np.asarray(diff_tables(scene)["mat_data"][:, :3])
                  - np.asarray(diff_tables(target_scene)["mat_data"][:, :3])).mean()
    print(f"albedo error: {err0:.3f} -> {err1:.3f} "
          f"({'recovered' if err1 < 0.3 * err0 else 'improving'})")


if __name__ == "__main__":
    main()

"""Neural occlusion oracle — OPTIONAL approximate shadow rays on the MXU.

Trains a small per-scene MLP (Neural Intersection Function, Fujieda et
al. 2023 — see PAPERS.md) against the exact any-hit oracle and renders
with it. Shadow queries become pure dense matmuls — the TPU's
full-throughput primitive — instead of BVH traversal; error is measured
and reported, and the feature is off unless you attach it:

    scene = scene.replace(shadow_nif=train_shadow_nif(scene))

Run: python examples/neural_occlusion.py [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core import io_bitmap
    from mitsuba2_tpu.render.integrators import render
    from mitsuba2_tpu.render.nif import accuracy, train_shadow_nif
    from mitsuba2_tpu.scene.presets import cornell_box

    scene = cornell_box()
    t0 = time.time()
    nif = train_shadow_nif(scene, steps=args.steps)
    acc = accuracy(nif, scene)
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s; "
          f"held-out agreement with the exact oracle: {acc:.1%}")

    cfg = mi.RenderConfig(width=args.res, height=args.res, spp=args.spp,
                          spp_per_pass=min(args.spp, 64), max_depth=4,
                          rr_depth=99)
    t0 = time.time()
    exact = np.asarray(render(scene, cfg))
    t_exact = time.time() - t0
    t0 = time.time()
    approx = np.asarray(render(scene.replace(shadow_nif=nif), cfg))
    t_nif = time.time() - t0
    rel = np.abs(approx - exact).mean() / exact.mean()
    print(f"render: exact {t_exact:.1f}s, neural-shadows {t_nif:.1f}s, "
          f"relative L1 error {rel:.1%}")
    io_bitmap.write("cbox_nif.exr", approx)
    io_bitmap.write("cbox_nif_diff.exr",
                    np.abs(approx - exact).astype(np.float32))
    print("wrote cbox_nif.exr, cbox_nif_diff.exr")


if __name__ == "__main__":
    main()

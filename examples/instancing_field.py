"""Shared-BLAS instancing example (shapegroup/instance — OptiX-IAS analog).

Renders a field of N instances of one displaced blob (geometry stored
ONCE; the two-level TLAS/BLAS traversal re-derives rays at instance
boundaries, docs/TPU_TRAVERSAL.md), and prints the memory ratio against
the flattened build.

Run: python examples/instancing_field.py [--n 64] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="instance count")
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--out", default="instanced_field.exr")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.scene.presets import instanced_field

    scene = instanced_field(n=args.n, subdiv=args.subdiv)
    blob_tris = 20 * 4 ** args.subdiv
    effective = args.n * blob_tris + 2
    print(f"{args.n} instances x {blob_tris} tris: "
          f"{scene.n_prims} stored prims resolve {effective} effective "
          f"({effective / scene.n_prims:.1f}x shared-BLAS memory win)")

    config = mi.RenderConfig(width=args.width, height=args.width,
                             spp=args.spp, spp_per_pass=min(args.spp, 16),
                             max_depth=3)
    t0 = time.time()
    img = mi.render(scene, config)
    img.block_until_ready()
    print(f"rendered {args.width}x{args.width} spp={args.spp} "
          f"in {time.time() - t0:.2f}s")
    mi.write_bitmap(args.out, np.asarray(img))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

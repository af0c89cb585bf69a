"""Forward rendering example — the docs' cbox quickstart counterpart.

Renders the Cornell box preset at increasing quality and writes EXRs.
Run: python examples/render_cbox.py [--tpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--out", default="cbox.exr")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (default: whatever JAX exposes)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core import io_bitmap
    from mitsuba2_tpu.render.integrators import render
    from mitsuba2_tpu.scene.presets import cornell_box

    scene = cornell_box()
    config = mi.RenderConfig(width=args.width, height=args.width,
                             spp=args.spp, spp_per_pass=min(args.spp, 64),
                             max_depth=8, rr_depth=5)
    t0 = time.time()
    img = render(scene, config)
    img.block_until_ready()
    print(f"rendered {args.width}x{args.width} spp={args.spp} "
          f"on {jax.devices()[0].platform} in {time.time()-t0:.2f}s")
    io_bitmap.write(args.out, np.asarray(img))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

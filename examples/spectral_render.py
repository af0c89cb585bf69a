"""Spectral rendering example — hero-wavelength transport + CIE develop.

Renders the Cornell box in `spectral` mode (4 hero wavelengths per
sample, srgb reflectance upsampling, table-exact CIE 1931 -> sRGB
develop) and compares it against the `rgb`-mode render: the two must
agree closely for this scene (all reflectances are smooth srgb lifts),
which is the classic sanity check for a spectral pipeline.

Also swaps the light's spectrum for a 2856 K blackbody (tungsten) to
show an effect RGB rendering cannot produce exactly.

Run: python examples/spectral_render.py [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core import io_bitmap
    from mitsuba2_tpu.render.integrators import render
    from mitsuba2_tpu.scene.presets import cornell_box

    scene = cornell_box()
    base = mi.RenderConfig(width=args.res, height=args.res, spp=args.spp,
                           spp_per_pass=min(args.spp, 64), max_depth=4)

    t0 = time.time()
    img_rgb = np.asarray(render(scene, base.replace(color_mode="rgb")))
    img_spec = np.asarray(render(scene, base.replace(color_mode="spectral")))
    print(f"rgb + spectral renders in {time.time()-t0:.1f}s")
    rel = (np.abs(img_spec - img_rgb).mean()
           / max(float(img_rgb.mean()), 1e-9))
    print(f"spectral vs rgb mean |diff| / mean = {rel:.3f} "
          "(small: srgb-upsampled reflectances round-trip)")

    # tungsten illuminant: only expressible spectrally
    warm = cornell_box(light_radiance={"type": "blackbody",
                                       "temperature": 2856.0,
                                       "scale": 12.0})
    img_warm = np.asarray(render(warm, base.replace(color_mode="spectral")))
    r, g, b = img_warm.reshape(-1, 3).mean(0)
    print(f"blackbody-lit balance r/g/b = {r:.3f}/{g:.3f}/{b:.3f} "
          "(warm: r > g > b)")
    io_bitmap.write("cbox_spectral.exr", img_spec)
    io_bitmap.write("cbox_tungsten.exr", img_warm)
    print("wrote cbox_spectral.exr, cbox_tungsten.exr")


if __name__ == "__main__":
    main()

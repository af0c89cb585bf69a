"""Polarized rendering example — Stokes AOVs and Malus's law.

Renders the Stokes-vector image of a glass plate viewed near Brewster's
angle (`stokes` integrator: src/integrators/stokes.cpp analog; Fresnel
reflection fully polarizes the beam there, so the degree of linear
polarization peaks at 1) and then demonstrates Malus's law with the
full multi-bounce polarized transport: two linear polarizers rotated
against each other attenuate by cos^2(theta).

Run: python examples/polarized_stokes.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core import io_bitmap
    from mitsuba2_tpu.render.stokes import render_stokes

    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene

    # glass plate near Brewster's angle under a constant environment:
    # Fresnel reflection strongly polarizes the reflected beam
    eta = 1.5
    th = np.arctan(eta)
    cam = Transform4.look_at(
        origin=[0, -3.0 * np.sin(th), 3.0 * np.cos(th)],
        target=[0, 0, 0], up=[0, 0, 1])
    plate = shapes.rectangle(bsdf={"type": "dielectric", "int_ior": eta})
    scene = build_scene(
        [plate], {"type": "perspective",
                  "to_world": np.asarray(cam.matrix), "fov": 25.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])

    cfg = mi.RenderConfig(width=args.res, height=args.res, spp=args.spp,
                          spp_per_pass=min(args.spp, 64), polarized=True)
    s = np.asarray(render_stokes(scene, cfg))   # (H, W, 4)
    dolp = np.sqrt(s[..., 1] ** 2 + s[..., 2] ** 2) / np.maximum(s[..., 0], 1e-6)
    print(f"S0 mean {s[..., 0].mean():.4f}; degree of linear polarization "
          f"max {dolp.max():.3f} (≈1 at Brewster's angle), "
          f"mean {dolp.mean():.3f}")
    io_bitmap.write("brewster_S0.exr",
                    np.repeat(s[..., 0:1], 3, -1).astype(np.float32))
    io_bitmap.write("brewster_dolp.exr",
                    np.repeat(dolp[..., None], 3, -1).astype(np.float32))
    print("wrote brewster_S0.exr, brewster_dolp.exr")

    # Malus's law through the full polarized path transport: unpolarized
    # source -> polarizer(0 deg) -> polarizer(theta) -> camera
    from mitsuba2_tpu.render.stokes import render_polarized

    def stack(theta):
        light = shapes.rectangle(
            bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
            emitter={"type": "area", "radiance": [2, 2, 2]}).transformed(
            np.asarray(Transform4.translate([0, 0, -1.0]).matrix))
        p1 = shapes.rectangle(bsdf={"type": "polarizer", "theta": 0.0}
                              ).transformed(
            np.asarray(Transform4.translate([0, 0, -0.4]).matrix))
        p2 = shapes.rectangle(bsdf={"type": "polarizer", "theta": theta}
                              ).transformed(
            np.asarray(Transform4.translate([0, 0, 0.2]).matrix))
        cam = Transform4.look_at(origin=[0, 0, 2.0], target=[0, 0, 0],
                                 up=[0, 1, 0])
        return build_scene([light, p1, p2],
                           {"type": "perspective",
                            "to_world": np.asarray(cam.matrix), "fov": 20.0})

    cfgm = mi.RenderConfig(width=24, height=24, spp=32, max_depth=6,
                           polarized=True)
    base = None
    for theta in (0.0, 30.0, 60.0, 90.0):
        img = np.asarray(render_polarized(stack(theta), cfgm))
        v = float(img[..., 0].mean()) if img.ndim == 4 else float(img.mean())
        if base is None:
            base = v
        expect = np.cos(np.deg2rad(theta)) ** 2
        print(f"polarizers at {theta:5.1f} deg: I/I0 = {v/base:.3f} "
              f"(Malus: {expect:.3f})")


if __name__ == "__main__":
    main()

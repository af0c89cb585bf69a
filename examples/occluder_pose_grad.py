"""Visibility (boundary) gradients via reparameterized transport.

The BASELINE config-5 workflow: translate an occluder casting a shadow
seen only through a SECOND path vertex, and recover d(loss)/d(translation)
— a pure visibility-discontinuity derivative that plain AD reads as zero
(the integrand moves only through the shadow edge). With
RenderConfig(reparam=True) the path integrator warps NEE/BSDF/camera
directions so the discontinuity is stationary (diff/reparam.py, the
reference's pathreparam branch / Loubet 2019), and AD recovers the
finite-difference value.

    python examples/occluder_pose_grad.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_occluder_scene():
    """The config-5 validation scene: floor + occluder + small area light
    (also used by benchmarks/reparam_kaux_sweep.py). Returns (scene,
    occ_rows) where occ_rows indexes the occluder's prim rows."""
    import jax.numpy as jnp
    import numpy as np

    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene

    # floor seen by the camera; occluder between floor and a small light
    floor = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0.8] * 3},
        id="floor").transformed(np.asarray(
            (Transform4.rotate([1, 0, 0], -90) @
             Transform4.scale([2, 2, 1])).matrix))
    occ = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0.0] * 3},
        id="occ").transformed(np.asarray(
            (Transform4.translate([0.6, 1.0, 0]) @
             Transform4.rotate([1, 0, 0], -90) @
             Transform4.scale([0.25, 0.25, 1])).matrix))
    light = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0] * 3},
        emitter={"type": "area", "radiance": [30.0] * 3},
        id="light").transformed(np.asarray(
            (Transform4.translate([0.25, 2.0, 0]) @
             Transform4.rotate([1, 0, 0], 90) @
             Transform4.scale([0.12, 0.12, 1])).matrix))
    cam = Transform4.look_at(origin=[0.15, 0.55, 0.0],
                             target=[0.25, 0.0, 0.0], up=[0, 0, 1])
    scene = build_scene([occ, floor, light], {
        "type": "perspective", "to_world": np.asarray(cam.matrix),
        "fov": 50.0})
    occ_rows = jnp.asarray(
        np.nonzero(np.asarray(scene.prim_shape) == 0)[0])
    return scene, occ_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import render

    scene, occ_rows = build_occluder_scene()

    cfg = mi.RenderConfig(width=24, height=24, spp=16, spp_per_pass=16,
                          max_depth=2)

    def loss(theta, reparam):
        from mitsuba2_tpu.scene.scene import refresh_mxu_feat
        shift = jnp.stack([theta, jnp.zeros_like(theta),
                           jnp.zeros_like(theta)])
        s = scene.replace(prim_p0=scene.prim_p0.at[occ_rows].add(shift))
        # derived rebuild: keep the MXU traversal tables in sync with the
        # moved vertices (scene.replace does not track them)
        s = refresh_mxu_feat(s)
        return jnp.mean(render(s, cfg.replace(reparam=reparam)))

    eps = 0.04
    fd = (float(loss(jnp.float32(eps), False)) -
          float(loss(jnp.float32(-eps), False))) / (2 * eps)
    ad_plain = float(jax.grad(loss)(jnp.float32(0.0), False))
    ad_rep = float(jax.grad(loss)(jnp.float32(0.0), True))

    print(f"finite differences (truth): {fd:+.4f}")
    print(f"plain AD (detached visibility): {ad_plain:+.4f}  <- misses it")
    print(f"reparameterized AD:            {ad_rep:+.4f}  <- recovers it")
    assert abs(ad_plain) < 0.25 * abs(fd)
    assert 0.4 * abs(fd) < abs(ad_rep) < 2.5 * abs(fd)
    print("ok")


if __name__ == "__main__":
    main()

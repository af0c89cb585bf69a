"""normalmap / bumpmap wrapper tests (src/bsdfs/{normalmap,bumpmap}.cpp):
a flat normal map is a no-op; tilted maps shade like tilted geometry."""
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene

CFG = mi.RenderConfig(width=16, height=16, spp=32, spp_per_pass=32,
                      max_depth=2)


def _plane(bsdf, light_dir=(0.6, 0, -0.8)):
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    return build_scene(
        [shapes.rectangle(bsdf=bsdf)],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 30.0},
        emitters=[{"type": "directional", "direction": list(light_dir),
                   "irradiance": [1.0] * 3}])


def test_flat_normalmap_is_identity():
    base = {"type": "diffuse", "reflectance": [0.7, 0.7, 0.7]}
    plain = np.asarray(render(_plane(base), CFG))
    flat = np.asarray(render(_plane(
        {"type": "normalmap", "normalmap": [0.5, 0.5, 1.0], "bsdf": base}),
        CFG))
    np.testing.assert_allclose(flat, plain, atol=1e-5)


def test_tilted_normalmap_changes_shading():
    """A normal tilted toward the light brightens a slanted-lit plane by
    the cosine ratio."""
    base = {"type": "diffuse", "reflectance": [0.7, 0.7, 0.7]}
    plain = np.asarray(render(_plane(base), CFG))
    # normal tilted toward -x (the light comes from +x side: dir (0.6,0,-0.8)
    # means light TRAVELS +x/-z, i.e. arrives from (-0.6, 0, 0.8))
    tilt = np.array([-0.45, 0.0, 0.89])
    enc = (tilt + 1) / 2
    tilted = np.asarray(render(_plane(
        {"type": "normalmap", "normalmap": enc.tolist(), "bsdf": base}), CFG))
    c_p, c_t = plain[8, 8].mean(), tilted[8, 8].mean()
    # cos with the incoming dir: plain n=(0,0,1): cos=0.8;
    # tilted: dot((-0.45,0,0.89),(-0.6,0,0.8)) = 0.982
    np.testing.assert_allclose(c_t / c_p, 0.982 / 0.8, rtol=0.05)


def test_bumpmap_checker_creates_variation():
    """A checkerboard height field must modulate shading across the plane
    (flat height -> no modulation)."""
    base = {"type": "diffuse", "reflectance": [0.7, 0.7, 0.7]}
    checker = {"type": "checkerboard", "color0": 0.0, "color1": 1.0,
               "to_uv": np.diag([4.0, 4.0, 1.0])}
    # NOTE: nearest-filtered checker has zero gradient except at edges; use
    # a smooth bitmap ramp instead for robust finite differences
    ramp = np.linspace(0, 1, 32, dtype=np.float32)[None, :].repeat(32, 0)
    bumped = np.asarray(render(_plane(
        {"type": "bumpmap", "scale": 0.2,
         "bumpmap": {"type": "bitmap", "data": ramp, "raw": True},
         "bsdf": base}), CFG))
    flat = np.asarray(render(_plane(
        {"type": "bumpmap", "scale": 0.2, "bumpmap": 0.5, "bsdf": base}),
        CFG))
    np.testing.assert_allclose(
        flat[8, 8], np.asarray(render(_plane(base), CFG))[8, 8], atol=1e-5)
    # the ramp bump tilts normals -> brightness differs from flat
    assert abs(bumped[8, 8].mean() - flat[8, 8].mean()) > 0.005

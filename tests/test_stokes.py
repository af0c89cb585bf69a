"""Stokes (polarized direct) integrator tests: diffuse scenes depolarize;
specular reflection at Brewster-like angles polarizes; S0 tracks radiance."""
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render.stokes import render_stokes
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene

CFG = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                      max_depth=2)


def test_diffuse_scene_unpolarized():
    from mitsuba2_tpu.scene.presets import cornell_box
    s = render_stokes(cornell_box(boxes=False), CFG)
    s = np.asarray(s)
    assert s[..., 0].max() > 0.01
    np.testing.assert_allclose(s[..., 1:], 0.0, atol=1e-6)


def test_dielectric_brewster_polarizes():
    """Glass plate viewed near Brewster's angle under a constant env: the
    reflected Stokes vector must be strongly polarized (|Q|/I large)."""
    eta = 1.5
    brewster = np.degrees(np.arctan(eta))  # ~56.3 deg
    # plate at origin (normal +z); camera placed at the Brewster angle
    dist = 3.0
    th = np.radians(brewster)
    origin = [0, -dist * np.sin(th), dist * np.cos(th)]
    cam = Transform4.look_at(origin=origin, target=[0, 0, 0], up=[0, 0, 1])
    plate = shapes.rectangle(bsdf={"type": "dielectric", "int_ior": eta})
    scene = build_scene(
        [plate],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 10.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    s = np.asarray(render_stokes(scene, CFG))
    c = s[8, 8]
    assert c[0] > 1e-4  # some reflected light
    dop = np.sqrt(c[1] ** 2 + c[2] ** 2 + c[3] ** 2) / c[0]
    assert dop > 0.9, f"degree of polarization {dop} too low at Brewster"


def test_conductor_partial_polarization():
    cam = Transform4.look_at(origin=[0, -2, 2], target=[0, 0, 0], up=[0, 0, 1])
    plate = shapes.rectangle(bsdf={"type": "conductor", "material": "Au"})
    scene = build_scene(
        [plate],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 20.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    s = np.asarray(render_stokes(scene, CFG))
    c = s[8, 8]
    assert c[0] > 0.1  # gold reflects strongly
    dop = np.sqrt(c[1] ** 2 + c[2] ** 2 + c[3] ** 2) / c[0]
    assert 0.02 < dop < 0.9  # partially polarized at 45 deg

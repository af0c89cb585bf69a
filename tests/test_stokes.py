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


# ---------------------------------------------------------------------------
# Full polarized path transport (render_polarized)
# ---------------------------------------------------------------------------

def _two_polarizer_scene(theta2):
    """Camera looking -z through two polarizer sheets at a constant env."""
    import numpy as np
    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene
    cam = Transform4.look_at(origin=[0, 0, 5], target=[0, 0, 0], up=[0, 1, 0])
    p1 = shapes.rectangle(bsdf={"type": "polarizer", "theta": 0.0}).transformed(
        np.diag([3.0, 3.0, 1.0, 1.0]) @ np.asarray(
            Transform4.translate([0, 0, 2]).matrix))
    p2 = shapes.rectangle(bsdf={"type": "polarizer", "theta": theta2}).transformed(
        np.diag([3.0, 3.0, 1.0, 1.0]) @ np.asarray(
            Transform4.translate([0, 0, 1]).matrix))
    return build_scene([p1, p2],
                       {"type": "perspective", "to_world": np.asarray(cam.matrix),
                        "fov": 20.0},
                       emitters=[{"type": "constant", "radiance": [1.0] * 3}])


def test_polarized_crossed_vs_parallel_polarizers():
    """Malus: parallel ideal polarizers pass 0.5 of unpolarized light,
    crossed polarizers pass nothing."""
    import numpy as np
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.stokes import render_polarized
    cfg = mi.RenderConfig(width=8, height=8, spp=16, spp_per_pass=16,
                          max_depth=4, rr_depth=99)
    s_par = np.asarray(render_polarized(_two_polarizer_scene(0.0), cfg))
    s_crs = np.asarray(render_polarized(_two_polarizer_scene(90.0), cfg))
    i_par = s_par[3:5, 3:5, :, 0].mean()
    i_crs = s_crs[3:5, 3:5, :, 0].mean()
    np.testing.assert_allclose(i_par, 0.5, atol=0.02)
    assert i_crs < 0.01 * max(i_par, 1e-6)


def test_polarized_malus_45deg():
    """45-degree second polarizer passes half of the polarized half."""
    import numpy as np
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.stokes import render_polarized
    cfg = mi.RenderConfig(width=8, height=8, spp=16, spp_per_pass=16,
                          max_depth=4, rr_depth=99)
    s45 = np.asarray(render_polarized(_two_polarizer_scene(45.0), cfg))
    np.testing.assert_allclose(s45[3:5, 3:5, :, 0].mean(), 0.25, atol=0.02)


def test_polarized_s0_matches_scalar_diffuse():
    """Unpolarized diffuse scene: S0 equals the scalar render's radiance
    (same transport, depolarizing materials)."""
    import numpy as np
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.render.integrators import render
    from mitsuba2_tpu.render.stokes import render_polarized
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    sc = build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [0.7] * 3})],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 45.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    cfg = mi.RenderConfig(width=16, height=16, spp=256, spp_per_pass=64,
                          max_depth=2, rr_depth=99)
    s = np.asarray(render_polarized(sc, cfg))
    img = np.asarray(render(sc, cfg))
    # S0 vs scalar: same integral, independent MC estimators
    np.testing.assert_allclose(s[4:12, 4:12, :, 0].mean(),
                               img[4:12, 4:12].mean(), rtol=0.03)
    # depolarized: Q,U,V ~ 0
    assert np.abs(s[..., 1:]).max() < 0.02


def test_polarized_conductor_reflection_polarizes():
    """Oblique reflection off gold polarizes the env light (|Q| > 0)."""
    import numpy as np
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.render.stokes import render_polarized
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene
    # camera looks at a gold mirror tilted 45 deg; reflection to the env
    cam = Transform4.look_at(origin=[0, -3, 0.3], target=[0, 0, 0.3],
                             up=[0, 0, 1])
    mirror = shapes.rectangle(bsdf={"type": "conductor", "material": "Au"})
    mirror = mirror.transformed(np.asarray(
        (Transform4.rotate([1, 0, 0], 45.0)).matrix))
    sc = build_scene([mirror],
                     {"type": "perspective", "to_world": np.asarray(cam.matrix),
                      "fov": 30.0},
                     emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    cfg = mi.RenderConfig(width=8, height=8, spp=16, spp_per_pass=16,
                          max_depth=3, rr_depth=99)
    s = np.asarray(render_polarized(sc, cfg))
    i0 = s[3:5, 3:5, :, 0].mean()
    q = np.abs(s[3:5, 3:5, :, 1]).mean()
    assert i0 > 0.3            # gold reflects most of the env
    assert q / i0 > 0.02       # measurably polarized at oblique incidence


def test_polarized_spectral_mode():
    """Spectral polarized transport: hero-wavelength Stokes integrates to a
    finite (H, W, 3, 4) sRGB Stokes image consistent with rgb mode."""
    import numpy as np
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.stokes import render_polarized
    from mitsuba2_tpu.scene.presets import cornell_box
    cfg = mi.RenderConfig(width=8, height=8, spp=64, spp_per_pass=32,
                          max_depth=3, rr_depth=99)
    s_rgb = np.asarray(render_polarized(cornell_box(), cfg))
    s_spec = np.asarray(render_polarized(
        cornell_box(), cfg.replace(color_mode="spectral")))
    assert s_rgb.shape == s_spec.shape == (8, 8, 3, 4)
    assert np.isfinite(s_spec).all()
    a, b = s_rgb[..., 0].mean(), s_spec[..., 0].mean()
    assert abs(a - b) < 0.35 * max(a, b)  # independent MC estimators

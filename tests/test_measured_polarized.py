"""measured_polarized: tabulated Mueller polarization structure
(src/bsdfs/measured_polarized.cpp counterpart; VERDICT.md round-2 item 8).

The intensity path is the plain measured machinery; the pBSDF-style
per-cell Mueller table rides MeasuredData.mueller into the Stokes
integrator. Validation: a measured_polarized capture baked from the
rough-gold analytic model must produce the same radiometry AND a
comparable polarization signature as the pure analytic conductor.
"""
import numpy as np
import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render.stokes import render_stokes
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.render import ior
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene

CFG = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                      max_depth=2, polarized=True)

ROUGH_GOLD = {"type": "roughconductor", "material": "Au", "alpha": 0.2}
AU_ETA = complex(0.3749, 2.3857)  # green-channel complex IOR (ior.py)


def _plate_scene(bsdf):
    cam = Transform4.look_at(origin=[0, -2, 2], target=[0, 0, 0],
                             up=[0, 0, 1])
    plate = shapes.rectangle(bsdf=bsdf)
    return build_scene(
        [plate],
        {"type": "perspective", "to_world": np.asarray(cam.matrix),
         "fov": 20.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])


def _measured_pol_desc():
    return {"type": "measured_polarized", "bake": ROUGH_GOLD,
            "pbake_eta": AU_ETA, "n_ti": 16, "n_to": 32, "n_phi": 32}


def test_intensity_matches_analytic_render():
    """s0 / scalar radiometry of the polarized capture == analytic model."""
    cfg = mi.RenderConfig(width=16, height=16, spp=32, spp_per_pass=32,
                          max_depth=2)
    img_ref = np.asarray(render(_plate_scene(ROUGH_GOLD), cfg, seed=1))
    img_mes = np.asarray(render(_plate_scene(_measured_pol_desc()), cfg,
                                seed=1))
    sel = img_ref.max(-1) > 0.02
    rel = np.abs(img_mes[sel] - img_ref[sel]) / (img_ref[sel] + 0.02)
    assert np.median(rel) < 0.15, np.median(rel)


def test_polarization_signature_matches_conductor():
    """The tabulated Mueller structure must reproduce the conductor's
    partial polarization at oblique reflection (full polarized transport,
    where MeasuredData.mueller is consumed)."""
    from mitsuba2_tpu.render.stokes import render_polarized
    cfg = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                          max_depth=2, rr_depth=99)
    s_mes = np.asarray(render_polarized(_plate_scene(_measured_pol_desc()),
                                        cfg))
    s_ana = np.asarray(render_polarized(
        _plate_scene({"type": "conductor", "material": "Au"}), cfg))
    c_m = s_mes[7:10, 7:10].mean((0, 1, 2))   # avg over pixels + channels
    c_a = s_ana[7:10, 7:10].mean((0, 1, 2))
    assert c_m[0] > 0.02
    dop_m = np.sqrt((c_m[1:] ** 2).sum()) / c_m[0]
    dop_a = np.sqrt((c_a[1:] ** 2).sum()) / c_a[0]
    assert dop_m > 0.01, dop_m  # polarizes at all
    # rough tabulated capture vs smooth analytic: same ballpark + sign
    assert 0.25 * dop_a < dop_m < 4.0 * dop_a, (dop_m, dop_a)
    assert np.sign(c_m[1]) == np.sign(c_a[1])


def test_unpolarized_measured_unaffected():
    """A plain `measured` material in the same scene build must still work
    (mixed staging: mueller present for one entry, None for another)."""
    cam = Transform4.look_at(origin=[0, -2, 2], target=[0, 0, 0],
                             up=[0, 0, 1])
    p1 = shapes.rectangle(bsdf=_measured_pol_desc(), id="a")
    p2 = shapes.rectangle(bsdf={"type": "measured", "bake": ROUGH_GOLD,
                                "n_ti": 16, "n_to": 32, "n_phi": 32},
                          id="b").transformed(np.asarray(
                              Transform4.translate([0, 0, -0.5]).matrix))
    scene = build_scene(
        [p1, p2],
        {"type": "perspective", "to_world": np.asarray(cam.matrix),
         "fov": 20.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    assert scene.measured.mueller is not None
    img = render(scene, mi.RenderConfig(width=8, height=8, spp=4,
                                        spp_per_pass=4, max_depth=2))
    assert np.isfinite(np.asarray(img)).all()

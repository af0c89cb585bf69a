"""depth / aov / direct / moment integrator variants
(src/integrators/{depth,aov,direct,moment}.cpp analogs)."""
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.render.integrators import (render, render_aovs,
                                             render_direct,
                                             render_with_variance)
from mitsuba2_tpu.scene.presets import cornell_box

CFG = mi.RenderConfig(width=16, height=16, spp=8, spp_per_pass=8, max_depth=2)


def test_aov_depth_and_normals():
    scene = cornell_box(boxes=False)
    aovs = render_aovs(scene, CFG, aovs=("depth", "sh_normal", "position",
                                         "uv", "shape_index"))
    d = np.asarray(aovs["depth"])[..., 0]
    assert d.shape == (16, 16)
    # camera at z=-1.39 looking at the box: all pixels hit, depth in ~[1.8,3]
    assert (d > 1.0).all() and (d < 4.0).all()
    # center pixel sees the back wall: depth ~2.39, normal -z
    np.testing.assert_allclose(d[8, 8], 2.39, atol=0.05)
    n = np.asarray(aovs["sh_normal"])[8, 8]
    np.testing.assert_allclose(n, [0, 0, -1], atol=0.05)
    p = np.asarray(aovs["position"])[8, 8]
    np.testing.assert_allclose(p[2], 1.0, atol=0.02)  # back wall z=1
    s = np.asarray(aovs["shape_index"])[..., 0]
    assert len(np.unique(s)) >= 4  # several walls visible


def test_direct_equals_depth2_path():
    scene = cornell_box(boxes=False)
    a = np.asarray(render_direct(scene, CFG.replace(max_depth=5)))
    b = np.asarray(render(scene, CFG.replace(max_depth=2)))
    np.testing.assert_array_equal(a, b)


def test_moment_variance():
    scene = cornell_box(boxes=False)
    cfg = CFG.replace(spp=32, spp_per_pass=8)
    mean, var = render_with_variance(scene, cfg)
    mean, var = np.asarray(mean), np.asarray(var)
    assert (var >= 0).all()
    assert var.max() > 0  # MC noise exists
    # variance magnitude sane for typical pixels (light pixels are heavy-
    # tailed; use the median)
    bright = mean.mean()
    assert np.sqrt(np.median(var)) < bright
    np.testing.assert_allclose(mean.mean(),
                               np.asarray(render(scene, cfg)).mean(), rtol=0.05)


def test_render_any_dispatch():
    """integrators.render_any routes every integrator family the XML can
    declare (the PluginManager-instantiation analog)."""
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import render_any
    from mitsuba2_tpu.scene.presets import cornell_box

    scene = cornell_box(boxes=False)
    cfg = mi.RenderConfig(width=8, height=8, spp=4, spp_per_pass=2,
                          max_depth=3)
    img = np.asarray(render_any(scene, cfg.replace(integrator="direct")))
    assert img.shape == (8, 8, 3)
    d = np.asarray(render_any(scene, cfg.replace(integrator="depth")))
    assert d.shape == (8, 8, 1) and d.max() > 0
    mean, var = render_any(scene, cfg.replace(integrator="moment"))
    assert np.asarray(mean).shape == (8, 8, 3) and np.asarray(var).min() >= 0
    s = np.asarray(render_any(scene, cfg.replace(integrator="stokes")))
    assert s.shape == (8, 8, 4)
    out = render_any(scene, cfg.replace(integrator="aov",
                                        aovs=("depth", "uv")))
    assert set(out) == {"image", "depth", "uv"}
    assert np.asarray(out["uv"]).shape == (8, 8, 2)


def test_xml_integrator_types():
    """The loader records every integrator type (direct/depth/aov/moment/
    stokes were silently falling back to path)."""
    from mitsuba2_tpu.scene import loader
    xml = """<scene version="2.0.0">
      <integrator type="aov">
        <string name="aovs" value="dd:depth, nn:sh_normal"/>
        <integrator type="path"><integer name="max_depth" value="5"/></integrator>
      </integrator>
      <sensor type="perspective"/>
      <shape type="sphere"/>
    </scene>"""
    _, cfg = loader.load_string(xml)
    assert cfg.integrator == "aov"
    assert cfg.aovs == ("depth", "sh_normal")
    assert cfg.aov_child == "path" and cfg.max_depth == 5
    _, cfg2 = loader.load_string(xml.replace(
        '<integrator type="aov">', '<integrator type="moment">')
        .replace('<string name="aovs" value="dd:depth, nn:sh_normal"/>', ""))
    assert cfg2.integrator == "moment"


def test_render_any_thinlens_aov():
    """Aperture-sampling sensors (thinlens/irradiancemeter) must work
    through render_aovs/render_any — regression: u_lens=None crashed."""
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import render_any
    from mitsuba2_tpu.scene.presets import kitchen_sink
    cfg = mi.RenderConfig(width=8, height=8, spp=4, spp_per_pass=4)
    d = np.asarray(render_any(kitchen_sink(), cfg.replace(integrator="depth")))
    assert d.shape == (8, 8, 1) and float(d.max()) > 0


def test_wrapper_integrator_guards():
    """aov-in-aov is rejected; unknown XML integrators fall back to path;
    moment's nested child properties are honored."""
    import pytest

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.scene import loader
    with pytest.raises(ValueError, match="aov child"):
        mi.RenderConfig(integrator="aov", aov_child="aov")
    xml = """<scene version="2.0.0"><integrator type="ptracer"/>
      <sensor type="perspective"/><shape type="sphere"/></scene>"""
    _, cfg = loader.load_string(xml)
    assert cfg.integrator == "path"
    xml2 = """<scene version="2.0.0">
      <integrator type="moment"><integrator type="path">
        <integer name="max_depth" value="5"/></integrator></integrator>
      <sensor type="perspective"/><shape type="sphere"/></scene>"""
    _, cfg2 = loader.load_string(xml2)
    assert cfg2.integrator == "moment" and cfg2.max_depth == 5


def test_variant_matrix_smoke():
    """The reference compiles a variant matrix; here every (integrator x
    color_mode x polarized) combination must trace and produce finite
    output on a scene with media + textures (kitchen_sink). Smoke-level:
    tiny film, 2 spp."""
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import render_any
    from mitsuba2_tpu.scene.presets import kitchen_sink

    scene = kitchen_sink()
    base = mi.RenderConfig(width=8, height=8, spp=2, spp_per_pass=2,
                           max_depth=3, rr_depth=99)
    for integrator in ("path", "volpathmis"):
        for mode in ("mono", "spectral"):
            for pol in (False, True):
                cfg = base.replace(integrator=integrator, color_mode=mode,
                                   polarized=pol)
                img = np.asarray(render_any(scene, cfg))
                assert np.isfinite(img).all(), (integrator, mode, pol)
                assert img.max() > 0, (integrator, mode, pol)
    # reparameterized spectral path (config-5-style combination)
    cfg = base.replace(reparam=True, color_mode="spectral")
    img = np.asarray(render_any(scene, cfg))
    assert np.isfinite(img).all() and img.max() > 0

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

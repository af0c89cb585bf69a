"""Ray differentials -> uv partials -> mip-filtered texture lookups.

Covers VERDICT.md round-2 item 5: RayDifferential
(core/geometry.py), Sensor::sample_ray_differential (render/sensors.py),
si.duv_dx/duv_dy (scene.compute_surface_interaction), and texture-LOD
filtering (render/texture.py mip pyramid). Reference anchors:
include/mitsuba/core/ray.h::RayDifferential,
src/sensors/perspective.cpp::sample_ray_differential,
include/mitsuba/render/interaction.h::compute_uv_partials.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.core.vec import Vec2
from mitsuba2_tpu.render import sensors, texture as texture_mod
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene


def _checker_plane_scene(reps: float = 24.0):
    """A long textured floor viewed at a grazing angle — the classic
    texture-aliasing torture view."""
    v = np.asarray([[-8, 0, -1], [8, 0, -1], [8, 0, 31], [-8, 0, 31]],
                   np.float32)
    f = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)  # normal +y
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    checker = {"type": "checkerboard",
               "color0": [0.05, 0.05, 0.05], "color1": [0.95, 0.95, 0.95],
               "to_uv": np.diag([reps, reps, 1.0]).astype(np.float32)}
    floor = shapes.mesh(v, f, uvs=uvs,
                        bsdf={"type": "diffuse", "reflectance": checker},
                        id="floor")
    cam = Transform4.look_at(origin=[0, 0.7, -0.5], target=[0, 0.0, 8.0],
                             up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix),
              "fov": 45.0}
    return build_scene([floor], sensor,
                       emitters=[{"type": "constant", "radiance": [1.0] * 3}])


def test_sample_ray_differential_offsets():
    scene = _checker_plane_scene()
    n = 16
    uv = Vec2(jnp.linspace(0.2, 0.8, n), jnp.full((n,), 0.5))
    rd = sensors.sample_ray_differential(scene, uv, None, film_width=64)
    assert rd.has_differentials
    # offset dirs differ from the main dir by about one pixel's angle
    dd = jnp.sqrt((rd.d_x.x - rd.d.x) ** 2 + (rd.d_x.y - rd.d.y) ** 2 +
                  (rd.d_x.z - rd.d.z) ** 2)
    assert float(dd.min()) > 1e-4 and float(dd.max()) < 0.1
    half = rd.scale_differential(0.5)
    dd2 = jnp.sqrt((half.d_x.x - half.d.x) ** 2 + (half.d_x.y - half.d.y) ** 2 +
                   (half.d_x.z - half.d.z) ** 2)
    np.testing.assert_allclose(np.asarray(dd2), 0.5 * np.asarray(dd),
                               rtol=1e-5)


def test_uv_partials_scale_with_distance():
    """Far hits on a grazing plane must have much larger uv footprints."""
    from mitsuba2_tpu.scene import scene as scene_mod
    scene = _checker_plane_scene()
    n = 8
    # rows of the film: top rows see far floor, bottom rows near floor
    uv = Vec2(jnp.full((n,), 0.5), jnp.linspace(0.45, 0.95, n))
    rd = sensors.sample_ray_differential(scene, uv, None, film_width=64)
    si = scene_mod.ray_intersect(scene, rd)
    assert si.duv_dx is not None
    mag = np.asarray(jnp.sqrt(si.duv_dx.x ** 2 + si.duv_dx.y ** 2))
    valid = np.asarray(si.valid)
    assert valid.all()
    # uv.y grows toward the bottom of the film = closer floor -> smaller duv
    assert mag[0] > 4 * mag[-1], mag


def test_mip_pyramid_averages():
    """Deep mip levels converge to the texture mean (energy preservation)."""
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3)).astype(np.float32)
    tb = texture_mod.TextureBuild(img, texture_mod.WRAP_REPEAT,
                                  texture_mod.FILTER_BILINEAR,
                                  np.array([1, 0, 0, 0, 1, 0], np.float32))
    atlas = texture_mod.pack_atlas([tb])
    assert atlas.mips is not None
    # deepest level = 1x1 = the mean
    deep = np.asarray(atlas.mips[atlas.level_offsets[-1]:])
    np.testing.assert_allclose(deep[0], img.mean((0, 1)), rtol=1e-5)
    # huge footprint -> eval returns ~the mean
    n = 4
    uvq = Vec2(jnp.asarray([0.1, 0.3, 0.6, 0.9]), jnp.asarray([0.2, 0.5, 0.7, 0.9]))
    big = Vec2(jnp.full((n,), 4.0), jnp.zeros((n,)))
    out = texture_mod.eval_rgb(atlas, jnp.zeros(n, jnp.int32), uvq,
                               duv=(big, big))
    for c in range(3):
        np.testing.assert_allclose(np.asarray(out.ch[c]),
                                   img.mean((0, 1))[c], rtol=1e-3)


def test_checkerboard_glancing_alias_reduction():
    """The VERDICT acceptance test: with ray differentials the far half of
    a grazing checker floor converges to the checker mean; point sampling
    aliases (pixel values stay near the extremes)."""
    scene = _checker_plane_scene(reps=48.0)
    cfg = mi.RenderConfig(width=64, height=64, spp=1, spp_per_pass=1,
                          max_depth=2, seed=0)
    img_f = render(scene, cfg)             # filtered (differentials active)
    scene_nod = scene.replace(
        textures=scene.textures.replace(mips=None))  # disable filtering
    img_p = render(scene_nod, cfg)

    # far floor rows: just below the horizon (the camera looks slightly
    # down; sky occupies roughly the top 28 rows at this geometry)
    far_f = np.asarray(img_f[30:40, :, 0]).ravel()
    far_p = np.asarray(img_p[30:40, :, 0]).ravel()
    assert far_p.mean() > 1e-3  # sanity: these rows do hit the lit floor
    # deviation from the local mean: filtered must be dramatically tighter
    dev_f = np.abs(far_f - far_f.mean()).mean()
    dev_p = np.abs(far_p - far_p.mean()).mean()
    assert dev_f < 0.5 * dev_p, (dev_f, dev_p)


def test_texture_grads_flow_through_mips():
    """Texture-LOD filtering keeps the diff path intact: gradients w.r.t.
    texels through a filtered lookup are nonzero and match FD."""
    rng = np.random.default_rng(1)
    img = rng.random((16, 16, 3)).astype(np.float32)
    tb = texture_mod.TextureBuild(img, texture_mod.WRAP_REPEAT,
                                  texture_mod.FILTER_BILINEAR,
                                  np.array([1, 0, 0, 0, 1, 0], np.float32))
    atlas = texture_mod.pack_atlas([tb])
    uvq = Vec2(jnp.asarray([0.4]), jnp.asarray([0.6]))
    duv = (Vec2(jnp.asarray([0.2]), jnp.asarray([0.0])),
           Vec2(jnp.asarray([0.0]), jnp.asarray([0.2])))

    def f(data):
        a = atlas.replace(data=data,
                          mips=texture_mod.build_mips(data, atlas.info))
        return texture_mod.eval_rgb(a, jnp.zeros(1, jnp.int32), uvq,
                                    duv=duv).ch[0][0]

    g = jax.grad(f)(atlas.data)
    assert float(jnp.abs(g).sum()) > 0
    # FD check on the largest-grad texel
    gi = np.unravel_index(int(jnp.argmax(jnp.abs(g))), g.shape)
    eps = 1e-2
    dp = atlas.data.at[gi].add(eps)
    dm = atlas.data.at[gi].add(-eps)
    fd = (f(dp) - f(dm)) / (2 * eps)
    np.testing.assert_allclose(float(g[gi]), float(fd), rtol=2e-2)

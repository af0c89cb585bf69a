"""Texture layer tests: bilinear/nearest lookup, wrap modes, checkerboard
semantics, textured-material rendering, and texel gradients (the
reference's bitmap.cpp / checkerboard.cpp behavior)."""
import jax
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render import texture as T
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene


def make_atlas(data, wrap="repeat", filt="bilinear"):
    tb = T.build_texture({"type": "bitmap", "data": data,
                          "wrap_mode": wrap, "filter_type": filt, "raw": True})
    return T.pack_atlas([tb])


def test_bilinear_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(7, 5, 3)).astype(np.float32)
    atlas = make_atlas(img, wrap="clamp")
    # sample exactly at texel centers -> exact texel values
    ys, xs = np.meshgrid(np.arange(7), np.arange(5), indexing="ij")
    uv = np.stack([(xs.ravel() + 0.5) / 5, (ys.ravel() + 0.5) / 7], -1)
    out = T.eval_rgb(atlas, jnp.zeros(35, jnp.int32), jnp.asarray(uv, jnp.float32)).to_array()
    np.testing.assert_allclose(np.asarray(out), img.reshape(-1, 3), rtol=1e-5)
    # halfway between two horizontal texel centers -> mean of the two
    uv2 = jnp.asarray([[(1.0) / 5, 0.5 / 7]], jnp.float32)
    out2 = T.eval_rgb(atlas, jnp.zeros(1, jnp.int32), uv2).to_array()
    np.testing.assert_allclose(np.asarray(out2)[0], (img[0, 0] + img[0, 1]) / 2,
                               rtol=1e-5)


def test_wrap_modes():
    img = np.arange(4, dtype=np.float32).reshape(1, 4, 1)
    img = np.repeat(img, 3, axis=-1)
    uv_out = jnp.asarray([[1.125, 0.5]], jnp.float32)  # past the right edge
    tid = jnp.zeros(1, jnp.int32)
    # repeat: u=1.125 == u=0.125 -> texel 0
    rep = T.eval_rgb(make_atlas(img, "repeat", "nearest"), tid, uv_out).to_array()
    assert np.asarray(rep)[0, 0] == 0.0
    # clamp: -> last texel (3)
    clp = T.eval_rgb(make_atlas(img, "clamp", "nearest"), tid, uv_out).to_array()
    assert np.asarray(clp)[0, 0] == 3.0
    # mirror: u=1.125 reflects to 0.875 -> texel 3
    mir = T.eval_rgb(make_atlas(img, "mirror", "nearest"), tid, uv_out).to_array()
    assert np.asarray(mir)[0, 0] == 3.0


def test_checkerboard_quadrants():
    tb = T.build_texture({"type": "checkerboard", "color0": [1, 0, 0],
                          "color1": [0, 1, 0]})
    atlas = T.pack_atlas([tb])
    tid = jnp.zeros(4, jnp.int32)
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]],
                     jnp.float32)
    out = np.asarray(T.eval_rgb(atlas, tid, uv).to_array())
    np.testing.assert_allclose(out[0], [1, 0, 0])  # (lo, lo) -> color0
    np.testing.assert_allclose(out[3], [1, 0, 0])  # (hi, hi) -> color0
    np.testing.assert_allclose(out[1], [0, 1, 0])
    np.testing.assert_allclose(out[2], [0, 1, 0])


def _textured_plane_scene(tex_desc):
    """Camera on +z looking at the front (+z normal) of a textured z=0
    rectangle, lit by a constant environment."""
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    plane = shapes.rectangle(bsdf={"type": "diffuse", "reflectance": tex_desc})
    return build_scene(
        [plane],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 45.0},
        emitters=[{"type": "constant", "radiance": [1.0, 1.0, 1.0]}])


def test_textured_render_shows_texture():
    scene = _textured_plane_scene({"type": "checkerboard",
                                   "color0": [0.9, 0.1, 0.1],
                                   "color1": [0.1, 0.9, 0.1]})
    cfg = mi.RenderConfig(width=32, height=32, spp=16, spp_per_pass=16,
                          max_depth=2)
    img = np.asarray(render(scene, cfg))
    center = img[16, 16]
    # plane spans the view; center region should be clearly colored
    assert center.max() > 0.05
    # red and green regions both present somewhere
    assert (img[..., 0] > img[..., 1] * 2).any()
    assert (img[..., 1] > img[..., 0] * 2).any()


def test_texel_gradients_flow():
    img = np.full((4, 4, 3), 0.5, np.float32)
    scene = _textured_plane_scene({"type": "bitmap", "data": img, "raw": True})
    cfg = mi.RenderConfig(width=8, height=8, spp=4, spp_per_pass=4, max_depth=2)

    def loss(tex_data):
        s = scene.replace(textures=scene.textures.replace(data=tex_data))
        im = render(s, cfg)
        return jnp.mean(im)

    g = jax.grad(loss)(scene.textures.data)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (g > 0).any(), "brightening a texel should brighten the image"


def test_spectral_textured_matches_rgb_roughly():
    scene = _textured_plane_scene({"type": "checkerboard",
                                   "color0": [0.8, 0.3, 0.2],
                                   "color1": [0.2, 0.3, 0.8]})
    cfg_rgb = mi.RenderConfig(width=16, height=16, spp=32, spp_per_pass=32,
                              max_depth=2, color_mode="rgb")
    cfg_spec = cfg_rgb.replace(color_mode="spectral")
    img_rgb = np.asarray(render(scene, cfg_rgb))
    img_spec = np.asarray(render(scene, cfg_spec))
    # spectral upsampling + hero-wavelength MC: loose agreement
    mask = img_rgb.max(-1) > 0.05
    assert np.abs(img_spec - img_rgb)[mask].mean() < 0.08


def test_textured_roughness_checkerboard():
    """rough* BSDFs accept a texture for `alpha` (the reference's
    spatially-varying roughness): a checkerboard-alpha render must equal
    the uniform-alpha render of the matching cell value at EVERY pixel
    (same seed => identical rays; alpha is the only difference)."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene
    from mitsuba2_tpu.render.integrators import render

    def make(alpha):
        rect = shapes.rectangle(bsdf={"type": "roughconductor",
                                      "alpha": alpha, "material": "Al"})
        light = shapes.rectangle(
            bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
            emitter={"type": "area", "radiance": [8, 8, 8]}).transformed(
            np.asarray((Transform4.translate([0.9, 0.9, 1.6])
                        @ Transform4.rotate([1, 0, 0], 180.0)
                        @ Transform4.scale([0.15, 0.15, 1.0])).matrix))
        cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                                 up=[0, 1, 0])
        return build_scene([rect, light],
                           {"type": "perspective",
                            "to_world": np.asarray(cam.matrix), "fov": 35.0})

    cfg = mi.RenderConfig(width=32, height=32, spp=16, max_depth=2, seed=7)
    checker = {"type": "checkerboard", "color0": [0.04] * 3,
               "color1": [0.45] * 3}
    a = np.asarray(render(make(checker), cfg))
    b = np.asarray(render(make(0.04), cfg))
    c = np.asarray(render(make(0.45), cfg))
    close_b = np.isclose(a, b, rtol=1e-4, atol=1e-5).all(-1)
    close_c = np.isclose(a, c, rtol=1e-4, atol=1e-5).all(-1)
    assert (close_b | close_c).all()
    assert close_b.any() and close_c.any()      # both cells present
    assert not np.allclose(b, c)                # roughness matters

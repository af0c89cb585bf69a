"""Gradient correctness: AD vs central finite differences.

Mirrors the reference's autodiff tests (SURVEY.md §4: FD-vs-AD allclose on
small scenes). With a fixed seed the renderer is a deterministic function
of its parameters, and for parameters that do not steer sampling decisions
(albedo, emitter radiance) FD and AD agree to near machine precision."""
import jax
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.diff import scene_with
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene.presets import cornell_box

CFG = mi.RenderConfig(width=12, height=12, spp=8, spp_per_pass=8, max_depth=3,
                      rr_depth=99)


def fd_grad(f, x, eps=2e-3):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx.flat[i] = eps
        g.flat[i] = (float(f(jnp.asarray(x + dx, jnp.float32))) -
                     float(f(jnp.asarray(x - dx, jnp.float32)))) / (2 * eps)
    return g


def _check(name, value, rtol=0.05, atol=1e-4):
    scene = cornell_box(boxes=False)

    def loss(v):
        img = render(scene_with(scene, {name: v}), CFG)
        return jnp.mean(img)

    ad = np.asarray(jax.grad(loss)(jnp.asarray(value, jnp.float32)))
    fd = fd_grad(loss, value)
    assert np.isfinite(ad).all()
    np.testing.assert_allclose(ad, fd, rtol=rtol, atol=atol)
    assert np.abs(ad).max() > 1e-6, f"gradient of {name} is dead"


def test_albedo_grad_matches_fd():
    _check("left.bsdf.reflectance", [0.6, 0.1, 0.1])


def test_emitter_radiance_grad_matches_fd():
    _check("light.emitter.radiance", [18.4, 15.6, 8.0], rtol=0.05, atol=1e-5)


def test_albedo_grad_matches_fd_spectral():
    scene = cornell_box(boxes=False)
    cfg = CFG.replace(color_mode="spectral")

    def loss(v):
        img = render(scene_with(scene, {"left.bsdf.reflectance": v}), cfg)
        return jnp.mean(img)

    v0 = [0.6, 0.1, 0.1]
    ad = np.asarray(jax.grad(loss)(jnp.asarray(v0, jnp.float32)))
    fd = fd_grad(loss, v0, eps=5e-3)
    assert np.isfinite(ad).all()
    # lattice-interp coefficients are piecewise-trilinear: FD across lattice
    # cell boundaries is noisier, keep a looser tolerance
    np.testing.assert_allclose(ad, fd, rtol=0.15, atol=1e-3)


def test_roughness_texture_gradients_match_fd():
    """Differentiable spatially-varying roughness: d(loss)/d(alpha-texel)
    through the roughness-texture slot matches finite differences (a
    capability beyond the reference, whose textured alpha was not a
    first-class diff parameter)."""
    import jax
    import jax.numpy as jnp

    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.diff.adjoint import diff_tables, with_tables
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene

    atex = np.full((4, 4, 3), 0.2, np.float32)
    rect = shapes.rectangle(
        bsdf={"type": "roughconductor", "material": "Al",
              "alpha": {"type": "bitmap", "data": atex, "raw": True}})
    light = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
        emitter={"type": "area", "radiance": [8, 8, 8]}).transformed(
        np.asarray((Transform4.translate([0.9, 0.9, 1.6])
                    @ Transform4.rotate([1, 0, 0], 180.0)
                    @ Transform4.scale([0.15, 0.15, 1.0])).matrix))
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                             up=[0, 1, 0])
    scene = build_scene([rect, light],
                        {"type": "perspective",
                         "to_world": np.asarray(cam.matrix), "fov": 35.0})
    cfg = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                          max_depth=2, seed=5)
    t = diff_tables(scene)

    def f(tex):
        img = render(with_tables(scene, {**t, "tex_data": tex}), cfg)
        return jnp.mean(img ** 2)

    g_sum = float(jnp.sum(jax.grad(f)(t["tex_data"])))
    eps = 1e-3
    fd = (float(f(t["tex_data"] + eps)) - float(f(t["tex_data"] - eps))) \
        / (2 * eps)
    np.testing.assert_allclose(g_sum, fd, rtol=2e-2)

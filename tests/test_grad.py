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

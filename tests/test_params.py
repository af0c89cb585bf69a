"""ParameterMap / traverse tests (mitsuba.python.util.traverse semantics)
and optimizer sanity (autodiff.py::{SGD, Adam})."""
import jax
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.diff import Adam, SGD, scene_with, traverse
from mitsuba2_tpu.diff.optimizers import adam_init, adam_step
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.render.spectra import eval_spectrum_slot
from mitsuba2_tpu.scene.presets import cornell_box

CFG = mi.RenderConfig(width=16, height=16, spp=8, spp_per_pass=8, max_depth=2)


def test_traverse_names():
    scene = cornell_box()
    params = traverse(scene)
    names = set(params.keys())
    assert "floor.bsdf.reflectance" in names
    assert "left.bsdf.reflectance" in names
    assert "light.emitter.radiance" in names
    # values readable and correctly shaped
    assert params["floor.bsdf.reflectance"].shape == (3,)
    np.testing.assert_allclose(np.asarray(params["left.bsdf.reflectance"]),
                               [0.611, 0.0555, 0.062], rtol=1e-5)


def test_keep_filters():
    params = traverse(cornell_box())
    kept = params.keep(r"reflectance")
    assert all("reflectance" in k for k in kept.keys())
    assert len(kept) > 0
    assert "light.emitter.radiance" not in kept


def test_update_changes_render():
    scene = cornell_box(boxes=False)
    img0 = np.asarray(render(scene, CFG))
    s2 = scene_with(scene, {"left.bsdf.reflectance": jnp.asarray([0.0, 0.0, 1.0])})
    img1 = np.asarray(render(s2, CFG))
    assert not np.allclose(img0, img1)
    # unchanged param -> unchanged render (bit-exact: same seeds)
    s3 = scene_with(scene, {})
    np.testing.assert_array_equal(img0, np.asarray(render(s3, CFG)))


def test_slot_update_consistent_in_spectral_mode():
    """Device-side slot rebuild must approximate the host fit: evaluating the
    updated slot in spectral mode should reproduce the target RGB."""
    from mitsuba2_tpu.core import spectrum as sp
    scene = cornell_box(boxes=False)
    target = jnp.asarray([0.2, 0.6, 0.3])
    s2 = scene_with(scene, {"floor.bsdf.reflectance": target})
    row = s2.mat_data[int(s2.shape_mat[0])]
    # quadrature over the visible range: slot -> RGB round trip
    wl = jnp.linspace(sp.WAVELENGTH_MIN, sp.WAVELENGTH_MAX, 128)
    from mitsuba2_tpu.core.spec import Spec
    refl = np.asarray(eval_spectrum_slot(
        jnp.broadcast_to(row[0:8], (128, 8)), Spec((wl,)), "spectral").ch[0])
    rgb = sp._spectrum_to_rgb_host(np.interp(sp._FIT_WL, np.asarray(wl), refl))
    np.testing.assert_allclose(rgb, np.asarray(target), atol=0.03)


def test_sgd_and_adam_descend_quadratic():
    target = jnp.asarray([1.0, -2.0, 0.5])

    def loss(p):
        return jnp.sum((p["x"] - target) ** 2)

    for opt in (SGD({"x": jnp.zeros(3)}, lr=0.1),
                Adam({"x": jnp.zeros(3)}, lr=0.2)):
        for _ in range(200):
            g = jax.grad(loss)(opt.params)
            opt.step(g)
        np.testing.assert_allclose(np.asarray(opt.params["x"]),
                                   np.asarray(target), atol=1e-2)


def test_optimize_albedo_recovers_target():
    """invert_cbox workflow in miniature: recover the left wall's albedo
    from a target image (mitsuba2 docs inverse-rendering example)."""
    scene = cornell_box(boxes=False)
    target_albedo = jnp.asarray([0.1, 0.2, 0.8])
    target_img = render(scene_with(scene, {"left.bsdf.reflectance": target_albedo}),
                        CFG)

    @jax.jit
    def step(theta, opt_state):
        def loss_fn(th):
            img = render(scene_with(scene, {"left.bsdf.reflectance": th["a"]}),
                         CFG)
            return jnp.mean((img - target_img) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(theta)
        theta, opt_state = adam_step(theta, g, opt_state, lr=0.05)
        return theta, opt_state, loss

    theta = {"a": jnp.asarray([0.5, 0.5, 0.5])}
    opt_state = adam_init(theta)
    for _ in range(60):
        theta, opt_state, loss = step(theta, opt_state)
    np.testing.assert_allclose(np.asarray(theta["a"]),
                               np.asarray(target_albedo), atol=0.08)

"""Adjoint (radiative-backprop-style) integrator tests: the pass-level
two-phase gradient must match plain end-to-end jax.grad exactly (same
estimator, different memory schedule)."""
import jax
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.diff import render_l2_grad
from mitsuba2_tpu.diff.adjoint import diff_tables, with_tables
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene.presets import cornell_box

CFG = mi.RenderConfig(width=12, height=12, spp=16, spp_per_pass=4,
                      max_depth=3, rr_depth=99)


def _reference_grad(scene, config, target, seed=0):
    """End-to-end autodiff through the full multi-pass render (the memory-
    hungry baseline the adjoint schedule must reproduce)."""
    def loss_fn(tables):
        img = render(with_tables(scene, tables), config, seed=seed)
        return jnp.mean((img - target) ** 2)
    return jax.grad(loss_fn)(diff_tables(scene))


def test_adjoint_matches_end_to_end_grad():
    scene = cornell_box(boxes=False)
    target = jnp.zeros((12, 12, 3), jnp.float32)
    image, loss, grads = render_l2_grad(scene, CFG, target, seed=0)
    ref = _reference_grad(scene, CFG, target, seed=0)
    # same seeds, same estimator -> near-identical gradients (fp reassoc only)
    for k in grads:
        a, b = np.asarray(grads[k]), np.asarray(ref[k])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # the forward image also matches the plain renderer
    np.testing.assert_allclose(np.asarray(image),
                               np.asarray(render(scene, CFG, seed=0)),
                               rtol=1e-5)
    assert float(loss) > 0


def test_adjoint_optimization_recovers_albedo():
    """Full invert-cbox loop through the adjoint path."""
    from mitsuba2_tpu.diff import scene_with
    from mitsuba2_tpu.diff.optimizers import adam_init, adam_step
    scene = cornell_box(boxes=False)
    target_scene = scene_with(scene,
                              {"left.bsdf.reflectance": jnp.asarray([0.1, 0.7, 0.2])})
    target = render(target_scene, CFG, seed=1)

    theta = {"a": jnp.asarray([0.5, 0.5, 0.5])}
    state = adam_init(theta)
    for it in range(40):
        s = scene_with(scene, {"left.bsdf.reflectance": theta["a"]})
        img, loss, grads = render_l2_grad(s, CFG, target, seed=1)
        # pull the 3 relevant components out of the mat_data gradient via
        # the recorded parameter path (name, table, row, c0, c1, kind)
        entry = [p for p in s.param_paths if p[0] == "left.bsdf.reflectance"][0]
        g_a = grads["mat_data"][entry[2], entry[3]:entry[4]]
        theta, state = adam_step(theta, {"a": g_a}, state, lr=0.1)
    np.testing.assert_allclose(np.asarray(theta["a"]), [0.1, 0.7, 0.2],
                               atol=0.15)

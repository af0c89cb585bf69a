"""The `_double` variant (VERDICT.md round-2 item 9): RenderConfig(dtype=
"float64") upcasts the scene and rides JAX type promotion through shading,
giving a high-precision forward for FD gradient oracles.
"""
import jax
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.diff import adjoint as adjoint_mod
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene.presets import cornell_box


def test_double_render_runs_and_matches_f32():
    scene = cornell_box(boxes=False)
    cfg32 = mi.RenderConfig(width=24, height=24, spp=8, spp_per_pass=8,
                            max_depth=2)
    img32 = render(scene, cfg32, seed=1)
    assert img32.dtype == jnp.float32
    with jax.enable_x64(True):
        img64 = render(scene, cfg32.replace(dtype="float64"), seed=1)
        assert img64.dtype == jnp.float64
    # same sample decisions (same PCG32 streams), higher precision:
    # images agree to f32 roundoff
    np.testing.assert_allclose(np.asarray(img64), np.asarray(img32),
                               rtol=2e-4, atol=2e-5)


def test_double_requires_x64():
    scene = cornell_box(boxes=False)
    cfg = mi.RenderConfig(width=8, height=8, spp=1, spp_per_pass=1,
                          max_depth=2, dtype="float64")
    try:
        render(scene, cfg, seed=0)
        assert False, "expected RuntimeError without x64"
    except RuntimeError as e:
        assert "enable_x64" in str(e)


def test_fd_vs_ad_in_double_tightened():
    """FD oracle in f64: central differences on an emitter radiance entry
    match the adjoint gradient to ~1e-6 relative — roughly 4 orders tighter
    than the f32 FD tests can support (common random numbers + f64 kills
    both the perturbation rounding and the accumulation noise)."""
    scene = cornell_box(boxes=False)
    cfg = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                          max_depth=2, dtype="float64")
    target = jnp.zeros((16, 16, 3))

    with jax.enable_x64(True):
        up = (lambda a: a.astype(jnp.float64)
              if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
              else a)
        scene64 = jax.tree.map(up, scene)
        # AD gradient of mean(img^2) w.r.t. the emitter radiance table
        image, loss, grads = adjoint_mod.render_l2_grad(scene64, cfg, target,
                                                        seed=3)
        g_em = np.asarray(grads["emitter_data"])
        assert g_em.dtype == np.float64
        r, c = np.unravel_index(np.abs(g_em).argmax(), g_em.shape)

        eps = 1e-4

        def loss_at(delta):
            s = scene64.replace(
                emitter_data=scene64.emitter_data.at[r, c].add(delta))
            img = render(s, cfg, seed=3)
            return float(jnp.mean(img ** 2))

        fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    assert abs(g_em[r, c]) > 0
    np.testing.assert_allclose(g_em[r, c], fd, rtol=1e-6)

"""BASELINE config 5: the reparameterized integrator on sharded ray
batches (SURVEY §2.6 P5 + §3.3 M5). Reparam warps NEE/BSDF/camera
directions per lane; under `shard_map` each device owns an spp shard
with deterministic lane offsets, so the sharded render and its
gradients must reproduce the single-device ones exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.dist.sharding import (make_mesh, render_and_grad_sharded,
                                        render_sharded)
from mitsuba2_tpu.scene.presets import cornell_box

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh")


def test_reparam_render_sharded_matches_single():
    scene = cornell_box()
    cfg = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                          max_depth=2, reparam=True)
    single = np.asarray(mi.render(scene, cfg, seed=5))
    shard = np.asarray(render_sharded(scene, cfg, make_mesh(), seed=5))
    np.testing.assert_allclose(shard, single, rtol=1e-4, atol=1e-5)


def test_reparam_grads_sharded_match_single():
    """Sharded adjoint gradients with reparam on == single-device
    render_and_grad gradients (the config-5 train-step composition)."""
    scene = cornell_box()
    cfg = mi.RenderConfig(width=12, height=12, spp=8, spp_per_pass=8,
                          max_depth=2, reparam=True)
    target = jnp.zeros((12, 12, 3), jnp.float32)

    def loss_fn(img):
        return jnp.mean((img - target) ** 2)

    img_s, loss_s, grads_s = mi.render_and_grad(scene, cfg, loss_fn, seed=3)
    img_m, loss_m, grads_m = render_and_grad_sharded(
        scene, cfg, loss_fn, make_mesh(), seed=3)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-4)
    for k in grads_s:
        np.testing.assert_allclose(np.asarray(grads_m[k]),
                                   np.asarray(grads_s[k]),
                                   rtol=1e-3, atol=1e-6, err_msg=k)

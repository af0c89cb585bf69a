"""render_torch: gradients must flow into torch tensors and match jax.grad
(parity with mitsuba.python.autodiff.render_torch)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import mitsuba2_tpu as mi
from mitsuba2_tpu.diff.torch_interop import render_torch
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene.presets import cornell_box

CFG = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                      max_depth=3, rr_depth=99)


def test_torch_render_matches_jax_value():
    scene = cornell_box()
    t_md = torch.tensor(np.asarray(scene.mat_data))
    img_t = render_torch(scene, CFG, {"mat_data": t_md}, seed=5)
    img_j = np.asarray(render(scene, CFG, seed=5))
    np.testing.assert_allclose(img_t.numpy(), img_j, rtol=1e-5, atol=1e-6)


def test_torch_backward_matches_jax_grad():
    scene = cornell_box()
    t_md = torch.tensor(np.asarray(scene.mat_data), requires_grad=True)
    img = render_torch(scene, CFG, {"mat_data": t_md}, seed=5)
    loss = img.mean()
    loss.backward()
    g_torch = t_md.grad.numpy()

    cfg = CFG.replace(remat=True)
    g_jax = np.asarray(jax.grad(
        lambda md: jnp.mean(render(scene.replace(mat_data=md), cfg, seed=5))
    )(scene.mat_data))
    np.testing.assert_allclose(g_torch, g_jax, rtol=1e-4, atol=1e-7)


def test_torch_optimizer_descends():
    """Two Adam steps on the floor albedo reduce an L2 loss (invert_cbox
    smoke test through the torch path)."""
    scene = cornell_box()
    target = torch.zeros(16, 16, 3)  # darker than the render -> albedo drops
    t_md = torch.tensor(np.asarray(scene.mat_data), requires_grad=True)
    opt = torch.optim.Adam([t_md], lr=5e-2)
    losses = []
    for it in range(4):
        opt.zero_grad()
        # fixed seed: deterministic loss landscape (MC noise would swamp a
        # few optimizer steps)
        img = render_torch(scene, CFG, {"mat_data": t_md}, seed=11)
        loss = torch.nn.functional.mse_loss(img, target)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert losses[-1] < losses[0]

"""PyTorch interop: differentiable rendering inside a torch autograd graph.

TPU-native rebuild of mitsuba2's `mitsuba.python.autodiff.render_torch`
(src/python/python/autodiff.py): the render becomes a torch.autograd
Function whose backward runs the JAX adjoint (pass-level radiative-backprop
schedule, diff/adjoint.py) and hands the parameter gradients back to torch.

Usage (the invert_cbox-style optimization loop, but with torch optimizers):

    params = {"mat_data": torch.tensor(np.asarray(scene.mat_data),
                                       requires_grad=True)}
    img = render_torch(scene, config, params, seed=1)   # torch (H, W, C)
    loss = torch.nn.functional.mse_loss(img, target)
    loss.backward()                                     # grads on params

Only the tables present in `params` receive gradients; everything else in
the scene pytree stays fixed. Transfers go through numpy (host) — fine for
optimization loops where the render dominates.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from .adjoint import diff_tables, with_tables

try:
    import torch
    _HAVE_TORCH = True
except ImportError:  # pragma: no cover - torch is baked into this env
    _HAVE_TORCH = False


def _require_torch():
    if not _HAVE_TORCH:
        raise RuntimeError("render_torch requires PyTorch")


def render_torch(scene, config: RenderConfig,
                 params: Dict[str, "torch.Tensor"], seed: int = None):
    """Differentiable render returning a torch tensor.

    `params`: name -> torch tensor for any subset of diff_tables(scene)
    keys ("mat_data", "emitter_data", "tex_data", "env_image",
    "env_scale"). Gradients flow to tensors with requires_grad."""
    _require_torch()
    if seed is None:
        seed = config.seed

    names = tuple(sorted(params.keys()))
    valid = set(diff_tables(scene).keys())
    unknown = set(names) - valid
    if unknown:
        raise ValueError(f"unknown param tables {sorted(unknown)}; "
                         f"valid: {sorted(valid)}")

    class _Render(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *tensors):
            tables = diff_tables(scene)
            for n, t in zip(names, tensors):
                tables[n] = jnp.asarray(t.detach().cpu().numpy())

            def f(tb):
                from ..render.integrators import render
                return render(with_tables(scene, tb),
                              config.replace(remat=True), seed)

            img, vjp_fn = jax.vjp(f, tables)
            ctx.vjp_fn = vjp_fn
            return torch.from_numpy(np.asarray(img))

        @staticmethod
        def backward(ctx, grad_img):
            ct = jnp.asarray(grad_img.detach().cpu().numpy())
            grads = ctx.vjp_fn(ct)[0]
            return tuple(torch.from_numpy(np.asarray(grads[n]))
                         for n in names)

    return _Render.apply(*(params[n] for n in names))

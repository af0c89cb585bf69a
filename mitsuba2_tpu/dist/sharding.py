"""Multi-chip / multi-host scale-out — the new layer the reference lacks.

Mitsuba 2 has no distributed backend (SURVEY.md §2.6: parallelism is SIMD
packets + TBB threads + one GPU). This module adds the TPU-native layer:
a 1-D device mesh over the pod slice, the ray wavefront sharded across
chips along the spp axis (pure data parallelism: the scene pytree is
replicated in HBM, zero inter-chip traffic during tracing), and two
collectives:

- film accumulation: `psum` of per-device partial images over ICI
- scene-parameter gradients: `psum` inside the backward pass (placed by
  XLA to overlap the adjoint sweep)

Per-device PCG32 streams are decorrelated by folding the device index into
the base seed, so an N-device render is deterministic for fixed (seed, N).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import RenderConfig
from ..render import film as film_mod
from ..render.integrators import render_pass


def make_mesh(devices=None, axis: str = "d") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def render_pass_sharded(scene, config: RenderConfig, seed, mesh: Mesh
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pass with spp_per_pass split across the mesh; returns the
    replicated (H, W, C) partial image + weight (film psum'd over ICI)."""
    n_dev = mesh.devices.size
    assert config.spp_per_pass % n_dev == 0, \
        f"spp_per_pass={config.spp_per_pass} not divisible by {n_dev} devices"
    local_cfg = config.replace(spp_per_pass=config.spp_per_pass // n_dev)

    def body(seed_arr):
        didx = jax.lax.axis_index("d").astype(jnp.uint32)
        # device-decorrelated seed (distinct PCG32 stream block per chip)
        seed_d = seed_arr[0] ^ (didx * jnp.uint32(0x632BE59B) + jnp.uint32(1))
        img, w = render_pass(scene, local_cfg, seed_d)
        img = jax.lax.psum(img, "d")
        w = jax.lax.psum(w, "d")
        return img, w

    seed_arr = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), (n_dev,))
    fn = shard_map(body, mesh=mesh, in_specs=(P("d"),),
                   out_specs=(P(), P()), check_vma=False)
    return fn(seed_arr)


@partial(jax.jit, static_argnames=("config", "mesh"))
def _render_pass_sharded_jit(scene, config, seed, mesh):
    return render_pass_sharded(scene, config, seed, mesh)


def render_sharded(scene, config: RenderConfig, mesh: Mesh = None,
                   seed: int = None) -> jnp.ndarray:
    """Full sharded render: host loop over jitted sharded passes."""
    if mesh is None:
        mesh = make_mesh()
    if seed is None:
        seed = config.seed
    sppc = min(config.spp_per_pass, config.spp)
    n_dev = mesh.devices.size
    sppc = max(n_dev, (sppc // n_dev) * n_dev)
    config = config.replace(spp_per_pass=sppc)
    n_passes = (config.spp + sppc - 1) // sppc
    image = wsum = None
    for p in range(n_passes):
        img_p, w_p = _render_pass_sharded_jit(
            scene, config, jnp.uint32((seed * 0x9E3779B1 + p) & 0xFFFFFFFF), mesh)
        image = img_p if image is None else image + img_p
        wsum = w_p if wsum is None else wsum + w_p
    return film_mod.develop(image, wsum)


def train_step_sharded(scene, config: RenderConfig, target, seed, mesh: Mesh,
                       lr: float = 0.05):
    """One differentiable-rendering optimization step over the mesh.

    The flagship multi-chip path (BASELINE.json north star): render sharded
    by spp, L2 loss vs `target`, gradients w.r.t. the scene's material and
    emitter tables psum'd over ICI (XLA overlaps the collective with the
    remaining adjoint computation), SGD update on the replicated params.
    Returns (new_scene, loss).
    """
    n_dev = mesh.devices.size
    local_cfg = config.replace(spp_per_pass=max(config.spp_per_pass // n_dev, 1))

    def body(scene_in, seed_arr, target_in):
        didx = jax.lax.axis_index("d").astype(jnp.uint32)
        seed_d = seed_arr[0] ^ (didx * jnp.uint32(0x632BE59B) + jnp.uint32(1))

        def loss_fn(params):
            s = scene_in.replace(mat_data=params["mat_data"],
                                 emitter_data=params["emitter_data"])
            img, w = render_pass(s, local_cfg, seed_d)
            img = jax.lax.psum(img, "d")
            w = jax.lax.psum(w, "d")
            img = film_mod.develop(img, w)
            return jnp.mean((img - target_in) ** 2)

        params = {"mat_data": scene_in.mat_data,
                  "emitter_data": scene_in.emitter_data}
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Gradient all-reduce over ICI. The loss already saw psum'd images,
        # so per-device grads match up to MC noise in the film; mean them.
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "d"), grads)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    seed_arr = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), (n_dev,))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P("d"), P()),
                   out_specs=(P(), P()), check_vma=False)
    new_params, loss = fn(scene, seed_arr, target)
    new_scene = scene.replace(mat_data=new_params["mat_data"],
                              emitter_data=new_params["emitter_data"])
    return new_scene, loss

"""Multi-chip / multi-host scale-out — the new layer the reference lacks.

Mitsuba 2 has no distributed backend (SURVEY.md §2.6: parallelism is SIMD
packets + TBB threads + one GPU). This module adds the TPU-native layer:
a 1-D device mesh over the pod slice, the ray wavefront sharded across
chips along the spp axis (pure data parallelism: the scene pytree is
replicated in HBM, zero inter-chip traffic during tracing), and two
collectives:

- film accumulation: `psum` of per-device partial images over ICI
- scene-parameter gradients: `psum` inside the adjoint sweep (placed by
  XLA to overlap the remaining backward computation)

DETERMINISM CONTRACT: devices draw from the SAME global lane/seed space —
device d renders samples [d*spp/D, (d+1)*spp/D) of each pass via
`render_pass(..., lane_offset=d * local_lanes)`. With the `independent`
sampler an N-device render therefore computes bit-identical per-sample
values to the single-device render; only the film summation order differs
(fp-associativity noise ~1e-6). tests/test_sharding.py asserts this.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import RenderConfig
from ..diff import adjoint as adjoint_mod
from ..diff import optimizers as opt_mod
from ..render import film as film_mod
from ..render.integrators import render_pass


def make_mesh(devices=None, axis: str = "d") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _split_config(config: RenderConfig, n_dev: int) -> RenderConfig:
    assert config.spp_per_pass % n_dev == 0, \
        f"spp_per_pass={config.spp_per_pass} not divisible by {n_dev} devices"
    return config.replace(spp_per_pass=config.spp_per_pass // n_dev)


def _lane_offset(local_cfg: RenderConfig):
    """This device's offset into the pass's global lane space."""
    didx = jax.lax.axis_index("d").astype(jnp.uint32)
    n_local = local_cfg.spp_per_pass * local_cfg.height * local_cfg.width
    return didx * jnp.uint32(n_local)


def render_pass_sharded(scene, config: RenderConfig, seed, mesh: Mesh
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pass with spp_per_pass split across the mesh; returns the
    replicated (H, W, C) partial image + weight (film psum'd over ICI)."""
    n_dev = mesh.devices.size
    local_cfg = _split_config(config, n_dev)

    def body(seed_arr):
        img, w = render_pass(scene, local_cfg, seed_arr[0],
                             lane_offset=_lane_offset(local_cfg))
        return jax.lax.psum(img, "d"), jax.lax.psum(w, "d")

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


# ---------------------------------------------------------------------------
# The flagship multi-chip differentiable path: the two-phase radiative-
# backprop adjoint (diff/adjoint.py) composed with the mesh.
# ---------------------------------------------------------------------------

def render_and_grad_sharded(scene, config: RenderConfig,
                            loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                            mesh: Mesh, seed: int = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """`diff/adjoint.render_and_grad` under shard_map.

    Phase 1 (forward, tape-free) and phase 2 (per-pass vjp re-trace) both
    run with the wavefront sharded over the mesh's spp axis; the film is
    psum'd before develop (every device sees the same full image, so the
    adjoint image deltaL is replicated for free), and parameter gradients
    are psum'd at the end of the adjoint scan — XLA schedules the grad
    collective to overlap the remaining backward work. Memory per device:
    one local pass's rematerialized tape.

    Returns (image, loss, grads) with grads matching diff_tables(scene);
    all outputs replicated.
    """
    if seed is None:
        seed = config.seed
    n_dev = mesh.devices.size
    sppc = min(config.spp_per_pass, config.spp)
    config = config.replace(spp_per_pass=sppc, remat=True)
    n_passes = (config.spp + sppc - 1) // sppc
    local_cfg = _split_config(config, n_dev)
    H, W = config.height, config.width
    seed = jnp.asarray(seed).astype(jnp.uint32)
    pass_seeds = adjoint_mod._pass_seeds(seed, n_passes)

    def body(scene_in, seed_arr):
        offset = _lane_offset(local_cfg)

        # ---- phase 1: forward accumulation (local scan + film psum) -------
        def fwd_body(acc, s):
            img_p, w_p = render_pass(scene_in, local_cfg, s,
                                     lane_offset=offset)
            return (acc[0] + img_p, acc[1] + w_p), None

        img0 = jnp.zeros((H, W, config.n_image_channels), config.float_dtype)
        w0 = jnp.zeros((H, W) if config.rfilter != "box" else (), config.float_dtype)
        (img, w), _ = jax.lax.scan(fwd_body, (img0, w0), seed_arr)
        img = jax.lax.psum(img, "d")
        w = jax.lax.psum(w, "d")
        image = film_mod.develop(img, w)

        # ---- adjoint image (replicated: same full image on every chip) ----
        loss, dL_dimage = jax.value_and_grad(loss_fn)(image)
        if jnp.ndim(w) == 0:
            ct_image = dL_dimage / jnp.maximum(w, 1e-8)
        else:
            ct_image = dL_dimage / jnp.maximum(w, 1e-8)[..., None]

        # ---- phase 2: adjoint re-trace (local scan + grad psum) -----------
        tables0 = adjoint_mod.diff_tables(scene_in)

        def adj_body(grads, s):
            def f(tb):
                img_p, _ = render_pass(
                    adjoint_mod.with_tables(scene_in, tb), local_cfg, s,
                    lane_offset=offset)
                return img_p

            _, vjp_fn = jax.vjp(f, tables0)
            g_p = vjp_fn(ct_image)[0]
            return jax.tree.map(jnp.add, grads, g_p), None

        zeros = jax.tree.map(jnp.zeros_like, tables0)
        grads, _ = jax.lax.scan(adj_body, zeros, seed_arr)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "d"), grads)
        return image, loss, grads

    # pass seeds are identical on every device; shard a dummy axis so the
    # body sees a per-device slice of shape (n_passes,)
    seeds_all = jnp.broadcast_to(pass_seeds, (n_dev, n_passes))
    fn = shard_map(body, mesh=mesh, in_specs=(P(), P("d")),
                   out_specs=(P(), P(), P()), check_vma=False)
    image, loss, grads = fn(scene, seeds_all)
    return image, loss, grads


@partial(jax.jit, static_argnames=("config", "mesh"))
def _train_step_adjoint_jit(scene, config, target, seed, opt_state, mesh,
                            lr):
    image, loss, grads = render_and_grad_sharded(
        scene, config, lambda im: jnp.mean((im - target) ** 2), mesh, seed)
    tables = adjoint_mod.diff_tables(scene)
    new_tables, opt_state = opt_mod.adam_step(tables, grads, opt_state, lr)
    return adjoint_mod.with_tables(scene, new_tables), opt_state, loss, image


def train_step_sharded(scene, config: RenderConfig, target, seed,
                       mesh: Mesh, opt_state=None, lr: float = 0.05):
    """One multi-chip inverse-rendering step (BASELINE config-4 flagship):
    full adjoint (all diff tables: materials, emitters, textures, envmap)
    + Adam, gradients psum'd over ICI inside the adjoint.

    Returns (new_scene, opt_state, loss, image). Pass opt_state back in;
    None initializes Adam."""
    if opt_state is None:
        opt_state = opt_mod.adam_init(adjoint_mod.diff_tables(scene))
    return _train_step_adjoint_jit(scene, config, target,
                                   jnp.asarray(seed).astype(jnp.uint32),
                                   opt_state, mesh, lr)

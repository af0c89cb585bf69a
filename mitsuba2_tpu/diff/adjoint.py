"""Adjoint (radiative-backprop-style) differentiable rendering.

TPU-native rebuild of the reference's differentiable-rendering entry
(src/python/python/autodiff.py::render + the Radiative Backpropagation
follow-up, Nimier-David 2020, which upstream shipped on a branch). The
reference's enoki tape records every arithmetic op of the forward render
and replays it backward — O(wavefront x depth) tape memory. Radiative
backprop instead re-traces paths in the backward sweep, propagating the
adjoint radiance dLoss/dImage and scatter-adding into scene parameters.

The XLA-native formulation used here has the same structure and memory
behavior, in two nested pieces:

1. PASS-LEVEL two-phase schedule (`render_and_grad`): phase 1 renders all
   spp passes WITHOUT a tape and computes the adjoint image deltaL =
   dLoss/dImage once; phase 2 re-traces each pass under jax.vjp with
   deltaL as the cotangent, accumulating parameter gradients pass by pass.
   Peak memory = ONE pass's tape, independent of total spp.
2. BOUNCE-LEVEL rematerialization (config.remat -> jax.checkpoint around
   each bounce in integrators._path_bounce): the pass tape itself shrinks
   from O(wavefront x depth) to O(wavefront); the backward sweep re-runs
   each bounce — radiative backprop's "replay the path" step. The replay
   is SELECTIVE (round 5): traversal outputs are tagged
   checkpoint_name("trace") and the checkpoint policy is
   save_only_these_names("trace"), so the replay recomputes shading
   arithmetic but reads the sorted Pallas traversal results (detached
   under AD anyway) from ~25 f32/lane/bounce of storage instead of
   re-tracing. Measured: forward+adjoint = 2.03x a forward pass (was
   2.73x), docs/TPU_TRAVERSAL.md "The adjoint, decomposed".

Intersections are detached (stop_gradient on hit geometry happens
naturally: prim gathers are integer-indexed), so gradients flow through
shading/texture/emission only — matching the reference's gpu_autodiff
behavior (SURVEY.md §3.3). Visibility gradients are the reparameterized
integrator's job (diff/reparam.py).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..render import film as film_mod
from ..render.integrators import render_pass


def diff_tables(scene) -> Dict[str, jnp.ndarray]:
    """The differentiable-leaf sub-pytree of a scene (the gradient
    targets: material table, emitter table, texture atlas, envmap
    image/scale, and — on scenes with participating media — the medium
    coefficient table and heterogeneous density grid, the reference's
    smoke-density-recovery workflow)."""
    t = {"mat_data": scene.mat_data, "emitter_data": scene.emitter_data}
    if scene.textures is not None:
        t["tex_data"] = scene.textures.data
    if scene.envmap is not None:
        t["env_image"] = scene.envmap.image
        t["env_scale"] = scene.envmap.scale
    if scene.has_media:
        t["med_data"] = scene.med_data
        if scene.medium_grid is not None:
            t["med_grid"] = scene.medium_grid.data
    return t


def with_tables(scene, tables: Dict[str, jnp.ndarray]):
    """Functionally install diff tables back into the scene pytree."""
    scene = scene.replace(mat_data=tables["mat_data"],
                          emitter_data=tables["emitter_data"])
    if "med_data" in tables:
        scene = scene.replace(med_data=tables["med_data"])
    if "med_grid" in tables:
        scene = scene.replace(
            medium_grid=scene.medium_grid.replace(
                data=tables["med_grid"]))
    if "tex_data" in tables:
        tex = scene.textures.replace(data=tables["tex_data"])
        if tex.mips is not None:
            # derived rebuild: the mip pyramid is a differentiable function
            # of the texels, so texture gradients flow through every level
            from ..render import texture as texture_mod
            tex = tex.replace(mips=texture_mod.build_mips(tex.data, tex.info))
        scene = scene.replace(textures=tex)
    if "env_image" in tables:
        scene = scene.replace(
            envmap=scene.envmap.replace(image=tables["env_image"],
                                        scale=tables["env_scale"]))
    return scene


def _pass_seed(seed: int, p: int):
    return jnp.uint32((seed * 0x9E3779B1 + p) & 0xFFFFFFFF)


def _pass_seeds(seed, n_passes):
    return (jnp.uint32(seed) * jnp.uint32(0x9E3779B1) +
            jnp.arange(n_passes, dtype=jnp.uint32))


@partial(jax.jit, static_argnames=("config",))
def _forward_pass(scene, config, seed_p):
    return render_pass(scene, config, seed_p)


@partial(jax.jit, static_argnames=("config", "n_passes"))
def _forward_all(scene, config, seed, n_passes):
    """Phase 1, all passes in ONE dispatch (remote-dispatch latency would
    otherwise dominate; see integrators._render_all_passes_jit)."""
    def body(acc, s):
        img_p, w_p = render_pass(scene, config, s)
        return (acc[0] + img_p, acc[1] + w_p), None

    H, W = config.height, config.width
    img0 = jnp.zeros((H, W, config.n_image_channels), config.float_dtype)
    w0 = jnp.zeros((H, W) if config.rfilter != "box" else (), config.float_dtype)
    (image, wsum), _ = jax.lax.scan(body, (img0, w0),
                                    _pass_seeds(seed, n_passes))
    return image, wsum


@partial(jax.jit, static_argnames=("config",))
def _adjoint_pass(scene, config, seed_p, ct_image):
    """Re-trace one pass under vjp with the adjoint image as cotangent.

    ct_image = dLoss/d(pass image sum); the filter-weight output gets a
    zero cotangent (weights do not depend on scene parameters)."""
    tables = diff_tables(scene)

    def f(tb):
        img_p, w_p = render_pass(with_tables(scene, tb), config, seed_p)
        return img_p

    _, vjp_fn = jax.vjp(f, tables)
    return vjp_fn(ct_image)[0]


@partial(jax.jit, static_argnames=("config", "n_passes"))
def _adjoint_all(scene, config, seed, n_passes, ct_image):
    """Phase 2, all adjoint passes in ONE dispatch: scan re-traces each
    pass under vjp and accumulates parameter gradients. Memory stays ONE
    pass's (rematerialized) tape — the scan carry is just the gradient
    pytree."""
    tables0 = diff_tables(scene)

    def body(grads, s):
        def f(tb):
            img_p, w_p = render_pass(with_tables(scene, tb), config, s)
            return img_p

        _, vjp_fn = jax.vjp(f, tables0)
        g_p = vjp_fn(ct_image)[0]
        return jax.tree.map(jnp.add, grads, g_p), None

    zeros = jax.tree.map(jnp.zeros_like, tables0)
    grads, _ = jax.lax.scan(body, zeros, _pass_seeds(seed, n_passes))
    return grads


def render_and_grad(scene, config: RenderConfig,
                    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                    seed: int = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Differentiable render with pass-level adjoint accumulation.

    Returns (image, loss, grads) where grads matches diff_tables(scene).
    Memory: one pass's (rematerialized) tape, for any spp.
    """
    if seed is None:
        seed = config.seed
    config = config.replace(remat=True)
    sppc = min(config.spp_per_pass, config.spp)
    config = config.replace(spp_per_pass=sppc)
    n_passes = (config.spp + sppc - 1) // sppc

    # ---- phase 1: forward accumulation (tape-free, one dispatch) -----------
    image_sum, wsum = _forward_all(scene, config, seed & 0xFFFFFFFF, n_passes)
    image = film_mod.develop(image_sum, wsum)

    # ---- adjoint image (deltaL in radiative-backprop terms) ----------------
    loss, dL_dimage = jax.value_and_grad(loss_fn)(image)
    # d develop / d img_p = 1 / wsum (weights are theta-independent)
    if jnp.ndim(wsum) == 0:
        ct_image = dL_dimage / jnp.maximum(wsum, 1e-8)
    else:
        ct_image = dL_dimage / jnp.maximum(wsum, 1e-8)[..., None]

    # ---- phase 2: adjoint passes (one dispatch) ----------------------------
    grads = _adjoint_all(scene, config, seed & 0xFFFFFFFF, n_passes, ct_image)

    return image, loss, grads


def render_l2_grad(scene, config: RenderConfig, target, seed: int = None):
    """Convenience: L2 loss against a target image (the invert_cbox loop)."""
    return render_and_grad(
        scene, config, lambda img: jnp.mean((img - target) ** 2), seed)

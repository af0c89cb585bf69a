"""Neural occlusion oracle — an OPTIONAL, APPROXIMATE shadow-ray
intersector (off by default; nothing uses it unless attached).

Implements the idea of "Neural Intersection Function" (Fujieda et al.,
arXiv 2306.07191, listed in PAPERS.md): replace any-hit BVH traversal
for shadow rays with a small per-scene MLP. On TPU this trades the
traversal kernel's scalar node walk for pure dense matmuls — the one
primitive the hardware runs at full speed (MXU) — at the cost of a
documented approximation error. The reference has no counterpart; this
is a capability extension, NOT part of any parity/benchmark path.

Design (self-contained, pure jnp — no Pallas, CPU-validatable):
- Query = an NEE shadow segment (surface point a -> emitter point b).
- Features: both endpoints normalized to the scene bbox, sinusoidally
  encoded at `n_freq` octaves (the paper's grid features play this
  role), plus the unit direction: 6*(2*n_freq) + 3 dims.
- Model: 2 hidden layers, width `width`, ReLU, logit output.
  occluded = sigmoid(logit) > 0.5.
- Training: segments sampled exactly NEE-shaped — origins area-sampled
  on scene geometry (offset along the normal like the integrator's
  shadow rays), endpoints area-sampled on emitting prims; labels from
  the exact `ray_test` oracle. Adam + binary cross-entropy.

Use:
    nif = train_shadow_nif(scene, steps=2000)       # once per scene
    occ = nif_ray_test(nif, o, d, maxt)             # jit-able
    scene_n = scene.replace(shadow_nif=nif)         # opt-in: NEE shadow
                                                    # rays use the oracle
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.vec import Vec3


@struct.dataclass
class ShadowNIF:
    """MLP parameters + the scene-bbox normalization it was trained with."""
    w0: jnp.ndarray
    b0: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray
    bb_min: jnp.ndarray   # (3,)
    bb_inv: jnp.ndarray   # (3,) 1 / extent
    n_freq: int = struct.field(pytree_node=False, default=4)


def _encode(nif: ShadowNIF, ax, ay, az, bx, by, bz, dx, dy, dz):
    """Segment -> feature matrix (N, F): sin/cos octaves of both
    normalized endpoints + the unit direction."""
    feats = [dx, dy, dz]
    for (px, py, pz) in ((ax, ay, az), (bx, by, bz)):
        nx = (px - nif.bb_min[0]) * nif.bb_inv[0]
        ny = (py - nif.bb_min[1]) * nif.bb_inv[1]
        nz = (pz - nif.bb_min[2]) * nif.bb_inv[2]
        for k in range(nif.n_freq):
            f = (2.0 ** k) * jnp.pi
            for c in (nx, ny, nz):
                feats.append(jnp.sin(f * c))
                feats.append(jnp.cos(f * c))
    return jnp.stack(feats, axis=-1)


def _logits(nif: ShadowNIF, feats):
    h = jnp.maximum(feats @ nif.w0 + nif.b0, 0.0)
    h = jnp.maximum(h @ nif.w1 + nif.b1, 0.0)
    return (h @ nif.w2 + nif.b2)[..., 0]


def nif_ray_test(nif: ShadowNIF, ray_o: Vec3, ray_d: Vec3, t_max
                 ) -> jnp.ndarray:
    """Approximate Scene::ray_test for shadow segments: endpoint b is
    o + d * t_max (NEE passes the emitter distance as maxt)."""
    t = jnp.minimum(t_max, 1e6)  # guard inf endpoints (env shadow rays)
    bx = ray_o.x + ray_d.x * t
    by = ray_o.y + ray_d.y * t
    bz = ray_o.z + ray_d.z * t
    feats = _encode(nif, ray_o.x, ray_o.y, ray_o.z, bx, by, bz,
                    ray_d.x, ray_d.y, ray_d.z)
    return _logits(nif, feats) > 0.0


def _sample_segments(scene, key, n):
    """NEE-shaped training segments + oracle labels (host-driven)."""
    from ..kernels import traverse_jnp

    k1, k2, k3, k4 = jax.random.split(key, 4)
    P = scene.prim_p0.shape[0]

    def area_sample(kp, ku, prim_mask_weight):
        # area-weighted prim pick + uniform point on the prim (triangles;
        # sphere prims use their bbox center — good enough for training)
        w = np.asarray(scene.prim_area) * prim_mask_weight
        w = w / max(w.sum(), 1e-20)
        idx = jax.random.choice(kp, P, (n,), p=jnp.asarray(w))
        u = jax.random.uniform(ku, (n, 2))
        s = jnp.sqrt(u[:, 0])
        b0 = 1.0 - s
        b1 = u[:, 1] * s
        p0 = scene.prim_p0[idx]
        e1 = scene.prim_e1[idx]
        e2 = scene.prim_e2[idx]
        p = p0 + e1 * b0[:, None] + e2 * b1[:, None]
        n_g = jnp.cross(e1, e2)
        n_g = n_g / jnp.maximum(
            jnp.linalg.norm(n_g, axis=-1, keepdims=True), 1e-20)
        return p, n_g

    emit_w = (np.asarray(scene.shape_emitter)[np.asarray(scene.prim_shape)]
              >= 0).astype(np.float32)
    surf_p, surf_n = area_sample(k1, k2, np.ones(P, np.float32))
    # flip the offset normal toward a random side (shadow rays leave both)
    side = jnp.where(jax.random.uniform(k3, (n,)) < 0.5, 1.0, -1.0)
    surf_p = surf_p + surf_n * (side * 1e-3)[:, None]
    if emit_w.sum() > 0:
        emit_p, _ = area_sample(k4, jax.random.fold_in(k4, 1), emit_w)
    else:  # no area emitters: train on random box points (env shadows)
        emit_p = (jax.random.uniform(k4, (n, 3))
                  * (1.0 / jnp.maximum(scene_bb_inv(scene), 1e-9))
                  + scene_bb_min(scene))
    d = emit_p - surf_p
    dist = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
    d = d / dist[:, None]
    o = Vec3(surf_p[:, 0], surf_p[:, 1], surf_p[:, 2])
    dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
    maxt = dist * (1.0 - 1e-3)
    occ = traverse_jnp.ray_test(scene, o, dv, maxt)
    return o, dv, maxt, occ


def scene_bb_min(scene):
    return scene.bvh_min[0]


def scene_bb_inv(scene):
    ext = jnp.maximum(scene.bvh_max[0] - scene.bvh_min[0], 1e-6)
    return 1.0 / ext


def init_nif(scene, width: int = 64, n_freq: int = 4, seed: int = 0
             ) -> ShadowNIF:
    F = 3 + 6 * 2 * n_freq
    rng = np.random.default_rng(seed)

    def glorot(fan_in, fan_out):
        s = np.sqrt(6.0 / (fan_in + fan_out))
        return jnp.asarray(rng.uniform(-s, s, (fan_in, fan_out)), jnp.float32)

    return ShadowNIF(
        w0=glorot(F, width), b0=jnp.zeros(width),
        w1=glorot(width, width), b1=jnp.zeros(width),
        w2=glorot(width, 1), b2=jnp.zeros(1),
        bb_min=scene_bb_min(scene), bb_inv=scene_bb_inv(scene),
        n_freq=n_freq)


def make_dataset(scene, n: int = 262144, seed: int = 0):
    """Pregenerate (features-source arrays, labels) with a few big oracle
    calls — training then never touches the exact intersector again."""
    chunks = []
    key = jax.random.PRNGKey(seed)
    per = 65536
    for _ in range((n + per - 1) // per):
        key, sub = jax.random.split(key)
        chunks.append(_sample_segments(scene, sub, per))
    o = Vec3(*(jnp.concatenate([jnp.asarray(getattr(c[0], ax))
                                for c in chunks])[:n]
               for ax in ("x", "y", "z")))
    d = Vec3(*(jnp.concatenate([jnp.asarray(getattr(c[1], ax))
                                for c in chunks])[:n]
               for ax in ("x", "y", "z")))
    maxt = jnp.concatenate([c[2] for c in chunks])[:n]
    occ = jnp.concatenate([c[3] for c in chunks])[:n]
    return o, d, maxt, occ


def train_shadow_nif(scene, steps: int = 3000, batch: int = 8192,
                     lr: float = 2e-3, width: int = 128, n_freq: int = 6,
                     seed: int = 0, dataset_size: int = 262144,
                     log_every: int = 0) -> ShadowNIF:
    """Fit the oracle to this scene. Returns the trained ShadowNIF.

    The dataset is generated once (exact-oracle labels); training is a
    single jitted lax.scan over minibatches (epochs wrap around)."""
    if getattr(scene, "has_instances", False):
        raise ValueError("shadow-NIF training samples the packed prim "
                         "tables, which are instance-local on shared-BLAS "
                         "instanced scenes; flatten the instances "
                         "(shapes.instance(..., flatten=True)) to train")
    from ..diff import optimizers as opt_mod

    nif = init_nif(scene, width=width, n_freq=n_freq, seed=seed)
    o, d, maxt, occ = make_dataset(scene, dataset_size, seed)
    t = jnp.minimum(maxt, 1e6)
    feats = _encode(nif, o.x, o.y, o.z,
                    o.x + d.x * t, o.y + d.y * t, o.z + d.z * t,
                    d.x, d.y, d.z)
    labels = occ.astype(jnp.float32)
    n = feats.shape[0]

    params = {"w0": nif.w0, "b0": nif.b0, "w1": nif.w1, "b1": nif.b1,
              "w2": nif.w2, "b2": nif.b2}
    state = opt_mod.adam_init(params)

    def loss_fn(p, f, y):
        cand = nif.replace(**p)
        logit = _logits(cand, f)
        return jnp.mean(jnp.maximum(logit, 0) - logit * y
                        + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    @jax.jit
    def train(params, state, feats, labels):
        def body(carry, s):
            p, st = carry
            i0 = (s * batch) % (n - batch + 1)
            f = jax.lax.dynamic_slice_in_dim(feats, i0, batch)
            y = jax.lax.dynamic_slice_in_dim(labels, i0, batch)
            loss, g = jax.value_and_grad(loss_fn)(p, f, y)
            p, st = opt_mod.adam_step(p, g, st, lr)
            return (p, st), loss

        (params, state), losses = jax.lax.scan(
            body, (params, state), jnp.arange(steps))
        return params, losses

    params, losses = train(params, state, feats, labels)
    if log_every:
        ls = np.asarray(losses)
        for s in range(0, steps, log_every):
            print(f"nif step {s}: bce {ls[s]:.4f}")
    return nif.replace(**params)


def accuracy(nif: ShadowNIF, scene, n: int = 20000, seed: int = 99
             ) -> float:
    """Held-out agreement with the exact oracle on NEE-shaped segments."""
    o, d, maxt, occ = _sample_segments(scene, jax.random.PRNGKey(seed), n)
    pred = nif_ray_test(nif, o, d, maxt)
    return float(jnp.mean(pred == occ))

"""Gather-free brute-force intersection for small scenes.

For scenes with few primitives (the Cornell-box class), BVH traversal is a
pessimization on TPU: the skip-link walk is a long `while_loop` of per-lane
gathers, while testing EVERY prim against every lane is pure broadcast
vector math (prim data is a scalar dynamic-slice broadcast to all lanes —
zero gathers, zero data-dependent control flow). The reference's analog is
Embree's early-out for trivial scenes; here the win is much larger because
the VPU pays lockstep cost for divergent traversal anyway.

Selected statically at trace time by scene.n_prims (see scene.ray_intersect).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import math as m

PRIM_TRI = 0
MAX_BRUTE_PRIMS = 192  # above this, use the BVH traversal


def _intersect_one(scene, i, ray_o, ray_d):
    """Intersect all lanes against prim i (host-unrolled: i is static)."""
    p0 = scene.prim_p0[i]
    e1 = scene.prim_e1[i]
    e2 = scene.prim_e2[i]

    # Möller–Trumbore
    pvec = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, jnp.inf, det)
    tvec = ray_o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv_det
    t_tri = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit_tri = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t_tri > 0.0)
    t_tri = jnp.where(hit_tri, t_tri, jnp.inf)

    if not scene.has_spheres:  # static specialization: all-triangle scene
        return t_tri, u, v

    # Sphere
    is_tri = scene.prim_type[i] == PRIM_TRI
    r = e1[..., 0]
    oc = ray_o - p0
    A = jnp.sum(ray_d * ray_d, axis=-1)
    B = 2.0 * jnp.sum(oc * ray_d, axis=-1)
    C = jnp.sum(oc * oc, axis=-1) - r * r
    valid_q, t0, t1 = m.solve_quadratic(A, B, C)
    t_sph = jnp.where(t0 > 0.0, t0, t1)
    t_sph = jnp.where(valid_q & (t_sph > 0.0), t_sph, jnp.inf)

    t = jnp.where(is_tri, t_tri, t_sph)
    return t, jnp.where(is_tri, u, 0.0), jnp.where(is_tri, v, 0.0)


def ray_intersect_brute(scene, ray_o, ray_d, t_max) -> Tuple[jnp.ndarray, ...]:
    """Closest hit by testing every prim. Returns (t, prim_idx, u, v)."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    N = ray_o.shape[0]
    P = scene.n_prims
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    prim = jnp.full(N, -1, jnp.int32)
    bu = jnp.zeros(N, jnp.float32)
    bv = jnp.zeros(N, jnp.float32)

    # fori_loop keeps the traced program small (P iterations of a scalar
    # dynamic-slice broadcast, zero gathers); compiles fast, runs at VPU rate
    def body(i, carry):
        t_best, prim, bu, bv = carry
        t, u, v = _intersect_one(scene, i, ray_o, ray_d)
        closer = t < t_best
        return (jnp.where(closer, t, t_best),
                jnp.where(closer, i, prim),
                jnp.where(closer, u, bu),
                jnp.where(closer, v, bv))

    t_best, prim, bu, bv = jax.lax.fori_loop(0, P, body,
                                             (t_best, prim, bu, bv))
    return jnp.where(prim >= 0, t_best, jnp.inf), prim, bu, bv


def ray_test_brute(scene, ray_o, ray_d, t_max) -> jnp.ndarray:
    """Any hit by testing every prim."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    N = ray_o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    def body(i, occluded):
        t, _, _ = _intersect_one(scene, i, ray_o, ray_d)
        return occluded | (t <= t_max)

    return jax.lax.fori_loop(0, scene.n_prims, body, jnp.zeros(N, bool))

"""Reference BVH traversal + primitive intersection in pure jnp.

This is the oracle for the Pallas traversal kernel (SURVEY.md §4 oracle
laddering) and the fallback on CPU. It replaces mitsuba2's kd-tree/Embree/
OptiX acceleration paths (include/mitsuba/render/kdtree.h,
src/librender/scene_optix.inl) with a TPU-friendly design: all lanes walk
the threaded (skip-link) BVH in lockstep inside one `lax.while_loop`; leaf
visits test a fixed LEAF_K prim slots masked by the leaf count. Primitive
types: 0 = triangle (Möller–Trumbore, matching Mesh::ray_intersect_triangle
semantics), 1 = sphere (stable quadratic).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..scene.bvh import LEAF_K

PRIM_TRI = 0
PRIM_SPHERE = 1


def intersect_prims(prim_idx, ray_o, ray_d, scene, t_max):
    """Intersect rays against gathered prims. prim_idx: (..., ) int32.

    Returns (t, u, v) with t = inf on miss. Degenerate/negative indices are
    clamped for the gather and masked out.
    """
    idx = jnp.maximum(prim_idx, 0)
    p0 = scene.prim_p0[idx]
    e1 = scene.prim_e1[idx]
    e2 = scene.prim_e2[idx]
    ptype = scene.prim_type[idx]

    # --- Möller–Trumbore (mesh.h::ray_intersect_triangle) -------------------
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

    # --- Sphere (stable quadratic; shapes/sphere.cpp) ------------------------
    c = p0
    r = e1[..., 0]
    oc = ray_o - c
    A = jnp.sum(ray_d * ray_d, axis=-1)
    B = 2.0 * jnp.sum(oc * ray_d, axis=-1)
    C = jnp.sum(oc * oc, axis=-1) - r * r
    valid_q, t0, t1 = m.solve_quadratic(A, B, C)
    t_sph = jnp.where(t0 > 0.0, t0, t1)
    t_sph = jnp.where(valid_q & (t_sph > 0.0), t_sph, jnp.inf)

    is_tri = ptype == PRIM_TRI
    t = jnp.where(is_tri, t_tri, t_sph)
    t = jnp.where((prim_idx >= 0) & (t <= t_max), t, jnp.inf)
    uu = jnp.where(is_tri, u, 0.0)
    vv = jnp.where(is_tri, v, 0.0)
    return t, uu, vv


def ray_intersect_preliminary(scene, ray_o, ray_d, t_max):
    """Closest-hit traversal. Inputs (N,3)/(N,). Returns (t, prim_idx, u, v).

    DETACHED under AD: all inputs are stop_gradient'ed so the traversal's
    `lax.while_loop` never carries tangents (it cannot be transposed). This
    matches the reference's design point — OptiX intersections carry no
    gradients (SURVEY.md §3.3 "KEY LIMITATION"); geometry derivatives are
    recovered differentiably in compute_surface_interaction (which re-derives
    hit positions from prim data + barycentrics), and visibility gradients
    come from the reparameterized integrator (diff/reparam.py).
    """
    sg = jax.lax.stop_gradient
    if hasattr(ray_o, "x"):  # planar Vec3 boundary -> packed rows
        ray_o = ray_o.to_array()
        ray_d = ray_d.to_array()
    return _ray_intersect_impl(sg(scene), sg(ray_o), sg(ray_d), sg(t_max))


def _ray_intersect_impl(scene, ray_o, ray_d, t_max) -> Tuple[jnp.ndarray, ...]:
    N = ray_o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-20,
                            jnp.where(ray_d >= 0, 1e-20, -1e-20), ray_d)

    def cond(state):
        node, t_hit, best, bu, bv = state
        return jnp.any(node >= 0)

    def body(state):
        node, t_hit, best, bu, bv = state
        active = node >= 0
        nid = jnp.maximum(node, 0)
        leaf_start = scene.bvh_leaf_start[nid]
        leaf_count = scene.bvh_leaf_count[nid]
        miss_link = scene.bvh_miss[nid]
        is_leaf = leaf_start >= 0

        # Inner node: slab test against current best t
        bb_min = scene.bvh_min[nid]
        bb_max = scene.bvh_max[nid]
        t0 = (bb_min - ray_o) * inv_d
        t1 = (bb_max - ray_o) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (tmin <= tmax) & (tmax > 0.0) & (tmin < t_hit)

        # Leaf: test LEAF_K prim slots
        new_t, new_best, new_u, new_v = t_hit, best, bu, bv
        for k in range(LEAF_K):
            pidx = jnp.where(is_leaf & (k < leaf_count), leaf_start + k, -1)
            tk, uk, vk = intersect_prims(pidx, ray_o, ray_d, scene, new_t)
            closer = active & (tk < new_t)
            new_t = jnp.where(closer, tk, new_t)
            new_best = jnp.where(closer, jnp.maximum(pidx, 0), new_best)
            new_u = jnp.where(closer, uk, new_u)
            new_v = jnp.where(closer, vk, new_v)

        next_node = jnp.where(is_leaf | ~box_hit, miss_link, node + 1)
        next_node = jnp.where(active, next_node, node)
        return next_node, new_t, new_best, new_u, new_v

    init = (jnp.zeros(N, jnp.int32),
            jnp.asarray(t_max, jnp.float32) * jnp.ones(N, jnp.float32),
            jnp.full(N, -1, jnp.int32),
            jnp.zeros(N, jnp.float32), jnp.zeros(N, jnp.float32))
    node, t_hit, best, bu, bv = jax.lax.while_loop(cond, body, init)
    t_out = jnp.where(best >= 0, t_hit, jnp.inf)
    return t_out, best, bu, bv


def ray_test(scene, ray_o, ray_d, t_max) -> jnp.ndarray:
    """Any-hit (shadow) traversal with early lane termination. Detached
    under AD like ray_intersect_preliminary (boolean output anyway)."""
    sg = jax.lax.stop_gradient
    if hasattr(ray_o, "x"):
        ray_o = ray_o.to_array()
        ray_d = ray_d.to_array()
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    N = ray_o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-20,
                            jnp.where(ray_d >= 0, 1e-20, -1e-20), ray_d)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    def cond(state):
        node, occluded = state
        return jnp.any((node >= 0) & ~occluded)

    def body(state):
        node, occluded = state
        active = (node >= 0) & ~occluded
        nid = jnp.maximum(node, 0)
        leaf_start = scene.bvh_leaf_start[nid]
        leaf_count = scene.bvh_leaf_count[nid]
        miss_link = scene.bvh_miss[nid]
        is_leaf = leaf_start >= 0

        bb_min = scene.bvh_min[nid]
        bb_max = scene.bvh_max[nid]
        t0 = (bb_min - ray_o) * inv_d
        t1 = (bb_max - ray_o) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (tmin <= tmax) & (tmax > 0.0) & (tmin < t_max)

        hit_any = jnp.zeros_like(occluded)
        for k in range(LEAF_K):
            pidx = jnp.where(is_leaf & (k < leaf_count), leaf_start + k, -1)
            tk, _, _ = intersect_prims(pidx, ray_o, ray_d, scene, t_max)
            hit_any = hit_any | (active & jnp.isfinite(tk))

        occluded = occluded | hit_any
        next_node = jnp.where(is_leaf | ~box_hit, miss_link, node + 1)
        next_node = jnp.where(active, next_node, node)
        next_node = jnp.where(occluded, -1, next_node)
        return next_node, occluded

    init = (jnp.zeros(N, jnp.int32), jnp.zeros(N, bool))
    _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded

"""Per-lane BVH traversal + primitive intersection in pure jnp.

This is the oracle for the Pallas traversal kernel (SURVEY.md §4 oracle
laddering) AND the production big-scene path on TPU for incoherent
wavefronts: all lanes walk the threaded (skip-link) BVH in lockstep inside
one `lax.while_loop`; each lane carries its own node cursor, so the step
count is bounded by the longest single-lane walk (keep wavefronts Morton-
sorted via kernels/compact.py to align walk lengths). It replaces
mitsuba2's kd-tree/Embree/OptiX acceleration paths
(include/mitsuba/render/kdtree.h, src/librender/scene_optix.inl).

All math is COMPONENT-PLANAR with 1-D table gathers — the measured TPU
layout rules of core/vec.py and kernels/gather.py. Leaf visits test a
fixed LEAF_K prim slots masked by the leaf count. Primitive types:
0 = triangle (Möller–Trumbore, matching Mesh::ray_intersect_triangle
semantics), 1 = sphere (stable quadratic).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..scene.bvh import LEAF_K
from . import gather as gth

PRIM_TRI = 0
PRIM_SPHERE = 1


def _components(v):
    if hasattr(v, "x"):  # planar Vec3
        return v.x, v.y, v.z
    return v[..., 0], v[..., 1], v[..., 2]


def _intersect_planar(scene, pidx, ox, oy, oz, dx, dy, dz, t_max):
    """Intersect rays against gathered prims (planar). pidx: (N,) int32;
    negative indices are masked out. Returns (t, u, v), t = inf on miss."""
    idx = jnp.maximum(pidx, 0)
    p0x, p0y, p0z = gth.rows3(scene.prim_p0, idx)
    e1x, e1y, e1z = gth.rows3(scene.prim_e1, idx)
    e2x, e2y, e2z = gth.rows3(scene.prim_e2, idx)

    # --- Möller–Trumbore (mesh.h::ray_intersect_triangle) -------------------
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, jnp.inf, det)
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit_tri = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t_tri > 0.0)
    t_tri = jnp.where(hit_tri, t_tri, jnp.inf)

    if scene.has_spheres:
        # --- Sphere (center p0, radius e1.x); stable quadratic --------------
        r = e1x
        A = dx * dx + dy * dy + dz * dz
        B = 2.0 * (tvx * dx + tvy * dy + tvz * dz)
        C = tvx * tvx + tvy * tvy + tvz * tvz - r * r
        disc = B * B - 4.0 * A * C
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        qq = -0.5 * (B + jnp.sign(B) * sq)
        t0 = jnp.where(jnp.abs(A) > 1e-20, qq / A, jnp.inf)
        t1 = jnp.where(jnp.abs(qq) > 1e-20, C / qq, jnp.inf)
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        t_sph = jnp.where(lo > 0.0, lo, hi)
        t_sph = jnp.where(ok & (t_sph > 0.0), t_sph, jnp.inf)
        is_tri = gth.scalar(scene.prim_type, idx) == PRIM_TRI
        t = jnp.where(is_tri, t_tri, t_sph)
        u = jnp.where(is_tri, u, 0.0)
        v = jnp.where(is_tri, v, 0.0)
    else:
        t = t_tri

    t = jnp.where((pidx >= 0) & (t <= t_max), t, jnp.inf)
    return t, u, v


# Backwards-compatible packed-row API used by a few tests
def intersect_prims(prim_idx, ray_o, ray_d, scene, t_max):
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    return _intersect_planar(scene, prim_idx, ox, oy, oz, dx, dy, dz, t_max)


def _node_fetch(scene, nid):
    leaf_start = gth.scalar(scene.bvh_leaf_start, nid)
    leaf_count = gth.scalar(scene.bvh_leaf_count, nid)
    miss_link = gth.scalar(scene.bvh_miss, nid)
    bnx, bny, bnz = gth.rows3(scene.bvh_min, nid)
    bxx, bxy, bxz = gth.rows3(scene.bvh_max, nid)
    return leaf_start, leaf_count, miss_link, (bnx, bny, bnz), (bxx, bxy, bxz)


def _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, t_best):
    t0x = (bmin[0] - ox) * ix
    t1x = (bmax[0] - ox) * ix
    t0y = (bmin[1] - oy) * iy
    t1y = (bmax[1] - oy) * iy
    t0z = (bmin[2] - oz) * iz
    t1z = (bmax[2] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return (tmin <= tmax) & (tmax > 0.0) & (tmin < t_best)


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                           jnp.where(d >= 0, 1e-20, -1e-20), d)


def ray_intersect_preliminary(scene, ray_o, ray_d, t_max):
    """Closest-hit traversal. Returns (t, prim_idx, u, v).

    DETACHED under AD: all inputs are stop_gradient'ed so the traversal's
    `lax.while_loop` never carries tangents (it cannot be transposed). This
    matches the reference's design point — OptiX intersections carry no
    gradients (SURVEY.md §3.3 "KEY LIMITATION"); geometry derivatives are
    recovered differentiably in compute_surface_interaction (which re-derives
    hit positions from prim data + barycentrics), and visibility gradients
    come from the reparameterized integrator (diff/reparam.py).
    """
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    N = jnp.shape(oz)[0]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    # The while cond reads only SCALAR carry entries: a vector reduction
    # inside cond is the prime suspect for the XLA:TPU device fault this
    # walker used to trigger (the reduction now happens in the body and is
    # carried as a scalar).
    def cond(state):
        return state[0]

    def body(state):
        _, node, t_hit, best, bu, bv = state
        active = node >= 0
        nid = jnp.maximum(node, 0)
        leaf_start, leaf_count, miss_link, bmin, bmax = _node_fetch(scene, nid)
        is_leaf = leaf_start >= 0

        box_hit = _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, t_hit)

        # Leaf: test LEAF_K prim slots
        new_t, new_best, new_u, new_v = t_hit, best, bu, bv
        for k in range(LEAF_K):
            pidx = jnp.where(is_leaf & (k < leaf_count), leaf_start + k, -1)
            tk, uk, vk = _intersect_planar(scene, pidx, ox, oy, oz,
                                           dx, dy, dz, new_t)
            closer = active & (tk < new_t)
            new_t = jnp.where(closer, tk, new_t)
            new_best = jnp.where(closer, jnp.maximum(pidx, 0), new_best)
            new_u = jnp.where(closer, uk, new_u)
            new_v = jnp.where(closer, vk, new_v)

        next_node = jnp.where(is_leaf | ~box_hit, miss_link, node + 1)
        next_node = jnp.where(active, next_node, node)
        return (jnp.any(next_node >= 0), next_node,
                new_t, new_best, new_u, new_v)

    init = (jnp.asarray(True), jnp.zeros(N, jnp.int32),
            jnp.asarray(t_max, jnp.float32) * jnp.ones(N, jnp.float32),
            jnp.full(N, -1, jnp.int32),
            jnp.zeros(N, jnp.float32), jnp.zeros(N, jnp.float32))
    _, node, t_hit, best, bu, bv = jax.lax.while_loop(cond, body, init)
    t_out = jnp.where(best >= 0, t_hit, jnp.inf)
    return t_out, best, bu, bv


def ray_test(scene, ray_o, ray_d, t_max) -> jnp.ndarray:
    """Any-hit (shadow) traversal with early lane termination. Detached
    under AD like ray_intersect_preliminary (boolean output anyway)."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    N = jnp.shape(oz)[0]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    def cond(state):
        return state[0]  # scalar-only cond (see ray_intersect_preliminary)

    def body(state):
        _, node, occluded = state
        active = (node >= 0) & ~occluded
        nid = jnp.maximum(node, 0)
        leaf_start, leaf_count, miss_link, bmin, bmax = _node_fetch(scene, nid)
        is_leaf = leaf_start >= 0

        box_hit = _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, t_max)

        hit_any = jnp.zeros_like(occluded)
        for k in range(LEAF_K):
            pidx = jnp.where(is_leaf & (k < leaf_count), leaf_start + k, -1)
            tk, _, _ = _intersect_planar(scene, pidx, ox, oy, oz,
                                         dx, dy, dz, t_max)
            hit_any = hit_any | (active & jnp.isfinite(tk))

        occluded = occluded | hit_any
        next_node = jnp.where(is_leaf | ~box_hit, miss_link, node + 1)
        next_node = jnp.where(active, next_node, node)
        next_node = jnp.where(occluded, -1, next_node)
        return jnp.any(next_node >= 0), next_node, occluded

    init = (jnp.asarray(True), jnp.zeros(N, jnp.int32), jnp.zeros(N, bool))
    _, _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded

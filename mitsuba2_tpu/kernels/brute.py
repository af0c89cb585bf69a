"""Gather-free brute-force intersection for small scenes.

For scenes with few primitives (the Cornell-box class), BVH traversal is a
pessimization on TPU: the skip-link walk is a long `while_loop` of per-lane
gathers, while testing EVERY prim against every lane is pure broadcast
vector math (prim data is a scalar dynamic-slice broadcast to all lanes —
zero gathers, zero data-dependent control flow). The reference's analog is
Embree's early-out for trivial scenes; here the win is much larger because
the VPU pays lockstep cost for divergent traversal anyway.

LAYOUT NOTE (measured 3.7x): all arithmetic is COMPONENT-PLANAR — rays are
split into x/y/z (N,) arrays up front. TPU tiles the trailing two dims as
(8 sublanes x 128 lanes); an (N, 3) array pads its minor dim 3 -> 128, so
vector math on (N, 3) wastes ~40x lanes. The split transposes once and the
P-iteration prim loop amortizes it.

Selected statically at trace time by scene.n_prims (see scene.ray_intersect).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

PRIM_TRI = 0
MAX_BRUTE_PRIMS = 192  # above this, use the BVH traversal


def _split(v):
    if hasattr(v, "x"):  # planar Vec3
        return v.x, v.y, v.z
    return v[..., 0], v[..., 1], v[..., 2]


def _intersect_one_planar(scene, i, ox, oy, oz, dx, dy, dz):
    """Intersect all lanes against prim i (planar math; i may be dynamic)."""
    p0x, p0y, p0z = _split(scene.prim_p0[i])
    e1x, e1y, e1z = _split(scene.prim_e1[i])
    e2x, e2y, e2z = _split(scene.prim_e2[i])

    # Möller–Trumbore
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

    if not scene.has_spheres:  # static specialization: all-triangle scene
        return t_tri, u, v

    # Sphere (center p0, radius e1.x); stable quadratic
    is_tri = scene.prim_type[i] == PRIM_TRI
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

    t = jnp.where(is_tri, t_tri, t_sph)
    return t, jnp.where(is_tri, u, 0.0), jnp.where(is_tri, v, 0.0)


def _no_instances(scene):
    if getattr(scene, "has_instances", False):
        raise ValueError("brute force cannot intersect shared-BLAS "
                         "instanced scenes (prim tables are "
                         "instance-local)")


def ray_intersect_brute(scene, ray_o, ray_d, t_max) -> Tuple[jnp.ndarray, ...]:
    """Closest hit by testing every prim. Returns (t, prim_idx, u, v)."""
    _no_instances(scene)
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    ox, oy, oz = _split(ray_o)
    dx, dy, dz = _split(ray_d)
    N = jnp.shape(oz)[0]
    P = scene.n_prims
    fdt = scene.prim_p0.dtype  # f64 under the _double variant (config.py)
    t_best = jnp.broadcast_to(jnp.asarray(t_max, fdt), (N,))
    prim = jnp.full(N, -1, jnp.int32)
    bu = jnp.zeros(N, fdt)
    bv = jnp.zeros(N, fdt)

    # fori_loop over prims: iterations pipeline with other kernels on this
    # runtime; a fully unrolled single fusion measured SLOWER (register
    # pressure / long critical path)
    def body(i, carry):
        t_best, prim, bu, bv = carry
        t, u, v = _intersect_one_planar(scene, i, ox, oy, oz, dx, dy, dz)
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
    _no_instances(scene)
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    ox, oy, oz = _split(ray_o)
    dx, dy, dz = _split(ray_d)
    N = jnp.shape(oz)[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    def body(i, occluded):
        t, _, _ = _intersect_one_planar(scene, i, ox, oy, oz, dx, dy, dz)
        # isfinite guard: t = inf on miss and t_max may be inf too
        return occluded | (jnp.isfinite(t) & (t <= t_max))

    return jax.lax.fori_loop(0, scene.n_prims, body, jnp.zeros(N, bool))

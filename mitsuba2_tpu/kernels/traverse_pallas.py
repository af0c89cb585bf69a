"""Pallas TPU packet-traversal kernel for the threaded BVH.

The TPU-native replacement for the reference's acceleration backends
(OptiX RT cores in scene_optix.inl, Embree/kd-tree on CPU) — SURVEY.md
§7.3 hard part #1. The design is BLOCK-SYNCHRONOUS PACKET TRAVERSAL,
the TPU-shaped reincarnation of mitsuba2's SIMD packet variant (Enoki
`Packet<float,16>`, §2.6 P1) rather than a per-lane SIMT walk:

- each grid step owns a block of 8x128 = 1024 rays (one f32 VPU tile);
- ONE scalar node cursor walks the skip-link BVH for the whole block
  (scalar loads from VMEM; the while_loop is scalar control flow);
- the AABB slab test runs vectorized across all 1024 lanes; the block
  descends if ANY lane hits (lane vote);
- leaf prims stream in as scalars and are tested against all lanes with
  Möller-Trumbore / sphere quadratics on the VPU.

Coherent packets (primary rays, shadow rays to one emitter) prune like a
scalar BVH; fully incoherent packets degrade toward brute force — the
caller sorts/compacts the wavefront to keep packets coherent
(kernels/compact.py). The pure-jnp per-lane walker (traverse_jnp.py) is
the oracle; `interpret=True` runs this kernel on CPU for CI.

Memory layout (host-packed once per scene, cached by id):
    node_f: (B, 8)  f32  [min.xyz, max.xyz, 0, 0]
    node_i: (B, 4)  i32  [leaf_start, leaf_count, miss, 0]
    prim_f: (P, 12) f32  [p0.xyz, e1.xyz, e2.xyz, type, 0, 0]
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh import CLUSTER_K, LEAF_K

_SUB, _LANE = 8, 128
# Rays per scalar-kernel grid step (multiple of 128; default one (8, 128)
# f32 tile). The walk model (benchmarks/walk_model.py) shows the block's
# union of visited nodes is nearly scale-free, so wider blocks amortize the
# scalar node walk over more lanes (~3x fewer steps/ray at 4096) at the
# cost of proportionally more VPU work per step — a hardware sweep knob.
BLOCK = int(os.environ.get("MI_PACKET_BLOCK", "1024"))
assert BLOCK > 0 and BLOCK % _LANE == 0, \
    f"MI_PACKET_BLOCK={BLOCK}: must be a positive multiple of {_LANE}"


def _pack_tables(scene):
    """SceneData BVH/prim arrays -> kernel tables (traced, fuses to copies).

    node_i rows: [leaf_start, leaf_count, miss, 0] (canonical order).
    link_i rows: [hit8[0..7], miss8[0..7]] — the per-octant ordered threaded
    links (scene/bvh.py::build_octant_links); the closest-hit kernel walks
    the order of the block's majority direction octant so the near child is
    visited first and the shrinking per-lane t_best culls far subtrees."""
    B = scene.bvh_min.shape[0]
    P = scene.prim_p0.shape[0]
    node_f = jnp.concatenate(
        [scene.bvh_min, scene.bvh_max, jnp.zeros((B, 2), jnp.float32)], -1)
    node_i = jnp.stack(
        [scene.bvh_leaf_start, scene.bvh_leaf_count, scene.bvh_miss,
         jnp.zeros(B, jnp.int32)], -1)
    if getattr(scene, "bvh_hit8", None) is not None:
        link_i = jnp.concatenate(
            [scene.bvh_hit8.reshape(B, 8), scene.bvh_miss8.reshape(B, 8)], -1)
    else:  # legacy scene: canonical order for every octant
        nxt = jnp.arange(B, dtype=jnp.int32) + 1
        hit = jnp.where(scene.bvh_leaf_start >= 0, scene.bvh_miss, nxt)
        link_i = jnp.concatenate(
            [jnp.tile(hit[:, None], (1, 8)),
             jnp.tile(scene.bvh_miss[:, None], (1, 8))], -1)
    prim_f = jnp.concatenate(
        [scene.prim_p0, scene.prim_e1, scene.prim_e2,
         scene.prim_type.astype(jnp.float32)[:, None],
         jnp.zeros((P, 2), jnp.float32)], -1)
    return node_f, node_i, link_i, prim_f


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                           jnp.where(d >= 0, 1e-20, -1e-20), d)


def _octant_vote(dxv, dyv, dzv):
    """Majority direction octant of the block (per-axis vote): with the
    wavefront sorted by (position, octant) all lanes agree; mixed blocks
    still get a usable order (correctness is octant-independent — only
    the culling efficiency varies)."""
    half = jnp.float32(dxv.size) * 0.5
    return ((jnp.sum((dxv < 0).astype(jnp.float32)) > half).astype(jnp.int32)
            | ((jnp.sum((dyv < 0).astype(jnp.float32)) > half)
               .astype(jnp.int32) << 1)
            | ((jnp.sum((dzv < 0).astype(jnp.float32)) > half)
               .astype(jnp.int32) << 2))


def _link_picker(octv):
    """Select this block's octant columns from a (1, 16) link row with
    STATIC indices only: Mosaic miscompiles dynamic scalar indexing
    (li[0, octv] read garbage on real TPU -> unterminated walk, chip
    wedge), and lax.dynamic_slice on values has no TC lowering."""
    def pick(li):
        hit = li[0, 0]
        miss = li[0, 8]
        for k in range(1, 8):
            sel = octv == k
            hit = jnp.where(sel, li[0, k], hit)
            miss = jnp.where(sel, li[0, 8 + k], miss)
        return hit, miss
    return pick


def _mxu_ray_features(oxv, oyv, ozv, dxv, dyv, dzv):
    """The (16, B) ray-feature matrix R = [d, o x d, o, 1, 0...] of the
    Möller–Trumbore bilinear forms, rays flattened onto the lane axis
    (probed reshape (8,128)->(1,1024): supported by this Mosaic).

    Callers pass RECENTRED origins o' = o - c (c = the visited cluster's
    centroid, node_f cols 8:11; the feature planes are host-built about
    the same c). The plane form's dot products scale with |o - ref|
    while its results scale with t, so with raw origins the bf16-split
    error floor is amplified by ~|o|/t (the round-2 red test: 2.3e-3 rel
    t on 0.2% of lanes). A hit inside the cluster has |o - c| <= t + r_c,
    bounding the amplification at ~(1 + r_c/t)."""
    msub = oxv.shape[0]

    def row(a):
        return a.reshape(1, msub * _LANE)

    mxv = oyv * dzv - ozv * dyv
    myv = ozv * dxv - oxv * dzv
    mzv = oxv * dyv - oyv * dxv
    rt = jnp.concatenate(
        [row(dxv), row(dyv), row(dzv), row(mxv), row(myv), row(mzv),
         row(oxv), row(oyv), row(ozv),
         jnp.ones((1, msub * _LANE), jnp.float32),
         jnp.zeros((6, msub * _LANE), jnp.float32)], axis=0)
    return rt


def _mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv):
    """Hoisted per-visit recentring: rt(c) = rt0 - (cx Ax + cy Ay + cz Az).

    _mxu_ray_features rebuilt the full (16, B) feature matrix (a 16-row
    concatenate + cross products) at EVERY cluster visit — measured
    ~15 us/visit on hardware (2026-08-19; the dense-sweep probe without
    the rebuild runs the whole visit at the ~2 us loop floor). The
    recentred features are LINEAR in the centroid c:
        m' = (o - c) x d = o x d - c x d,   o' = o - c
    so build rt0 = rt(c=0) and the three coefficient matrices once per
    kernel instance, and each visit is three broadcast-FMA passes:
        Ax: row4 = -dz, row5 = +dy, row6 = 1
        Ay: row3 = +dz, row5 = -dx, row7 = 1
        Az: row3 = -dy, row4 = +dx, row8 = 1
    (rows: [d.xyz | (oxd).xyz | o.xyz | 1 | 0*6])."""
    msub = oxv.shape[0]
    B = msub * _LANE

    def row(a):
        return a.reshape(1, B)

    z1 = jnp.zeros((1, B), jnp.float32)
    one = jnp.ones((1, B), jnp.float32)
    z7 = jnp.zeros((7, B), jnp.float32)
    rt0 = _mxu_ray_features(oxv, oyv, ozv, dxv, dyv, dzv)
    rdx, rdy, rdz = row(dxv), row(dyv), row(dzv)
    ax = jnp.concatenate([z1, z1, z1, z1, -rdz, rdy, one, z1, z1, z7], 0)
    ay = jnp.concatenate([z1, z1, z1, rdz, z1, -rdx, z1, one, z1, z7], 0)
    az = jnp.concatenate([z1, z1, z1, -rdy, rdx, z1, z1, z1, one, z7], 0)
    return rt0, ax, ay, az


def _mxu_rt_at(rt_parts, ccx, ccy, ccz):
    rt0, ax, ay, az = rt_parts
    return rt0 - (ccx * ax + ccy * ay + ccz * az)


def _slab(nf, ox, oy, oz, ix, iy, iz, t_best):
    """Vectorized AABB slab test of one node against the lane block."""
    t0x = (nf[0, 0] - ox) * ix
    t1x = (nf[0, 3] - ox) * ix
    t0y = (nf[0, 1] - oy) * iy
    t1y = (nf[0, 4] - oy) * iy
    t0z = (nf[0, 2] - oz) * iz
    t1z = (nf[0, 5] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return (tmin <= tmax) & (tmax > 0.0) & (tmin < t_best)


def _prim_test(pr, ox, oy, oz, dx, dy, dz):
    """One prim (scalar row (1, 12)) vs the lane block.

    Returns (t, u, v) with t = +inf where missed. Triangle: Möller-Trumbore
    (mesh.h::ray_intersect_triangle); sphere: stable quadratic."""
    p0x, p0y, p0z = pr[0, 0], pr[0, 1], pr[0, 2]
    e1x, e1y, e1z = pr[0, 3], pr[0, 4], pr[0, 5]
    e2x, e2y, e2z = pr[0, 6], pr[0, 7], pr[0, 8]
    is_tri = pr[0, 9] == 0.0

    # --- triangle -----------------------------------------------------------
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit_tri = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t_tri > 0.0) & \
        (inv_det != 0.0)

    # --- sphere (center p0, radius e1.x) -------------------------------------
    r = e1x
    ocx, ocy, ocz = ox - p0x, oy - p0y, oz - p0z
    A = dx * dx + dy * dy + dz * dz
    Bq = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
    Cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = Bq * Bq - 4.0 * A * Cq
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # numerically stable roots
    qq = -0.5 * (Bq + jnp.sign(Bq) * sq)
    t0 = jnp.where(jnp.abs(A) > 1e-20, qq / A, jnp.inf)
    t1 = jnp.where(jnp.abs(qq) > 1e-20, Cq / qq, jnp.inf)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t_sph = jnp.where(lo > 0.0, lo, hi)
    hit_sph = ok & (t_sph > 0.0)

    t = jnp.where(is_tri,
                  jnp.where(hit_tri, t_tri, jnp.inf),
                  jnp.where(hit_sph, t_sph, jnp.inf))
    return t, jnp.where(is_tri, u, 0.0), jnp.where(is_tri, v, 0.0)


def _closest_hit_kernel(node_f, node_i, link_i, prim_f,
                        ox, oy, oz, dx, dy, dz, tmax,
                        t_out, prim_out, u_out, v_out):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    _pick_links = _link_picker(_octant_vote(dxv, dyv, dzv))
    # Fuel: a correct threaded walk visits each node at most once; the cap
    # makes an unterminated loop (e.g. corrupted links) structurally
    # impossible — a runaway device loop wedges the whole chip for hours.
    fuel_cap = node_f.shape[0] + 64

    def cond(state):
        node, fuel, _, _, _, _ = state
        return (node >= 0) & (fuel < fuel_cap)

    def body(state):
        node, fuel, t_best, best, bu, bv = state
        nf = node_f[pl.ds(node, 1), :]
        ni = node_i[pl.ds(node, 1), :]
        leaf_start = ni[0, 0]
        leaf_count = ni[0, 1]
        hit_link, miss_link = _pick_links(link_i[pl.ds(node, 1), :])
        is_leaf = leaf_start >= 0

        hit_any = jnp.any(_slab(nf, oxv, oyv, ozv, ixv, iyv, izv, t_best))

        def leaf_tests(args):
            t_best, best, bu, bv = args
            for k in range(LEAF_K):
                pr = prim_f[pl.ds(leaf_start + k, 1), :]
                tk, uk, vk = _prim_test(pr, oxv, oyv, ozv, dxv, dyv, dzv)
                closer = (k < leaf_count) & (tk < t_best)
                t_best = jnp.where(closer, tk, t_best)
                best = jnp.where(closer, leaf_start + k, best)
                bu = jnp.where(closer, uk, bu)
                bv = jnp.where(closer, vk, bv)
            return t_best, best, bu, bv

        t_best, best, bu, bv = jax.lax.cond(
            is_leaf & hit_any, leaf_tests, lambda a: a,
            (t_best, best, bu, bv))

        nxt = jnp.where(is_leaf | jnp.logical_not(hit_any),
                        miss_link, hit_link)
        return nxt, fuel + 1, t_best, best, bu, bv

    msub = oxv.shape[0]   # BLOCK // _LANE sublanes per ray block
    init = (jnp.int32(0), jnp.int32(0), tmax[:],
            jnp.full((msub, _LANE), -1, jnp.int32),
            jnp.zeros((msub, _LANE), jnp.float32),
            jnp.zeros((msub, _LANE), jnp.float32))
    _, _, t_best, best, bu, bv = jax.lax.while_loop(cond, body, init)
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best
    u_out[:] = bu
    v_out[:] = bv


def _any_hit_kernel(node_f, node_i, prim_f,
                    ox, oy, oz, dx, dy, dz, tmax, occ_out):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmv = tmax[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)

    fuel_cap = node_f.shape[0] + 64  # see closest-hit kernel fuel note

    # occupancy carried as f32 0/1: Mosaic mis-lowers unrolled i1-vector
    # accumulation chains (vector<8x128x32xi1> internal failure on real TPU)
    def cond(state):
        node, fuel, occ_f = state
        return (node >= 0) & (fuel < fuel_cap) & (jnp.min(occ_f) < 1.0)

    def body(state):
        node, fuel, occ_f = state
        nf = node_f[pl.ds(node, 1), :]
        ni = node_i[pl.ds(node, 1), :]
        leaf_start = ni[0, 0]
        leaf_count = ni[0, 1]
        miss = ni[0, 2]
        is_leaf = leaf_start >= 0

        alive = occ_f < 1.0
        hit_any = jnp.any(_slab(nf, oxv, oyv, ozv, ixv, iyv, izv, tmv) & alive)

        def leaf_tests(occ_f):
            for k in range(LEAF_K):
                pr = prim_f[pl.ds(leaf_start + k, 1), :]
                tk, _, _ = _prim_test(pr, oxv, oyv, ozv, dxv, dyv, dzv)
                # isfinite guard: tk = inf on miss and tmv may be inf too
                hit = (k < leaf_count) & jnp.isfinite(tk) & (tk <= tmv)
                occ_f = jnp.maximum(occ_f, jnp.where(hit, 1.0, 0.0))
            return occ_f

        occ_f = jax.lax.cond(is_leaf & hit_any, leaf_tests,
                             lambda o: o, occ_f)
        nxt = jnp.where(is_leaf | jnp.logical_not(hit_any), miss, node + 1)
        return nxt, fuel + 1, occ_f

    init = (jnp.int32(0), jnp.int32(0),
            jnp.zeros(oxv.shape, jnp.float32))
    _, _, occ_f = jax.lax.while_loop(cond, body, init)
    occ_out[:] = (occ_f >= 1.0).astype(jnp.int32)


# ===========================================================================
# MXU leaf path: the node walk stops at CLUSTER_K-prim cluster roots
# (scene/bvh.py::cluster_cut) and tests the whole cluster as FOUR matmuls
# on the matrix unit. Möller–Trumbore separates into bilinear forms over a
# 16-dim ray feature vector R = [d, o x d, o, 1, 0...] and per-triangle
# feature rows (docs/TPU_TRAVERSAL.md "levers"):
#     det   = -d.n                 rows [-n, 0, 0, 0]
#     u_num =  (o x d).e2 + d.(p0 x e2)   rows [p0 x e2, e2, 0, 0]
#     v_num = -(o x d).e1 - d.(p0 x e1)   rows [-(p0 x e1), -e1, 0, 0]
#     t_num =  o.n - p0.n          rows [0, 0, n, -(p0.n)]
# so one cluster visit = one dot((4*128,16),(16,1024)) over DMA-streamed
# feature rows + a vectorized epilogue, replacing 128 scalar-streamed VPU
# prim tests. Spheres are not expressible as the bilinear form — scenes
# with spheres use the scalar kernel (dispatch guard).
# ===========================================================================

# CLUSTER_K imported from scene/bvh.py (MI_CLUSTER_K env override).
# Module switch (tests compare both paths). Default ON since the
# 2026-08-19 hardware validation (benchmarks/mxu_hw_seq.sh): phase 2b
# on-TPU correctness PASS (hit masks + prim ids equal vs the scalar
# kernel, occlusion equal), phase 3 sorted gallery 5.9-6.7 Mrays/s
# coherent closest vs 3.0 scalar (2.0-2.2x), 1.17 vs 0.81 incoherent.
# MI_MXU_LEAVES=0 restores the scalar-leaf packet kernel.
MXU_LEAVES = os.environ.get("MI_MXU_LEAVES", "1").lower() in ("1", "true")
# Rays per MXU kernel grid step (multiple of 128). Bigger blocks amortize
# the scalar walk + per-visit DMA over more rays, at the cost of a larger
# block union of visited nodes. Hardware sweep (2026-08-19, sorted
# gallery, CK=128): block 1024 -> 5.92 Mrays/s, 4096 -> 6.67, 8192 ->
# did not dispatch within the watchdog; CK=256@4096 traded -6% closest
# for +17% anyhit — closest dominates render wall time, so 4096/128 it is.
MXU_BLOCK = int(os.environ.get("MI_MXU_BLOCK", "4096"))
assert MXU_BLOCK > 0 and MXU_BLOCK % _LANE == 0, \
    f"MI_MXU_BLOCK={MXU_BLOCK}: must be a positive multiple of {_LANE}"
# 8192 SILENTLY MISCOMPILES on this Mosaic (2026-08-19: the walk loop
# exits immediately -> "1600 Mrays/s" of wrong results; suspect the
# (msub, 128)->(1, msub*128) relayout above 32 sublanes). Hard-fail
# rather than return garbage.
assert MXU_BLOCK <= 4096, \
    f"MI_MXU_BLOCK={MXU_BLOCK}: >4096 miscompiles (see comment)"
# MXU dot precision for the cluster plane tests. The visit cost is MXU
# OUTPUT-bound ((4K, lanes) tiles x bf16 passes; the 16-deep contraction
# already pays for 128), so passes are the direct lever, all measured on
# hardware (benchmarks/mxu_hw_check.py, 30k-tri gallery):
#   highest  Mosaic bf16x6 — exact vs the scalar kernel (rel t 4e-4)
#   x4       manual 4-pass bf16 split: the full ahbh+ahbl+albh+albl
#            expansion (bf16 x bf16 products are EXACT in f32, so the
#            only residual is f32 accumulation, ~2^-22 x cancellation
#            amplification — matched to the f32 edge-test oracle's own
#            floor); 4/6 the highest cost
#   x3       3-pass split dropping the albl term (~2^-18 x amplification;
#            with cluster recentring the amplification is ~(1 + r_c/t),
#            so this holds 1e-4 rel except near-grazing hits) — Mosaic
#            has NO HIGH lowering, so the expansion is hand-rolled
#   default  bf16x1 — 2x cheaper again but WRONG on real scenes (6% prim
#            disagreement, occlusion mask errors); kept for experiments
#   cat3/cat4 same products as x3/x4 in ONE dot: the split operands are
#            CONCATENATED along the contraction dim (depth 48/64 — still
#            one 128-deep MXU pass per output tile), so the pass count
#            drops 3x/4x and the two (4K, B) accumulation adds vanish.
#            The sum is accumulated inside the MXU in f32 instead of as
#            explicit adds — same error budget.
# Default cat3 (2026-08-19 hardware sweep, sorted gallery 262k rays):
#   x3   7.53 coh closest / 23.1 coh any / 1.20 inc closest / 1.63 inc any
#   cat3 10.93           / 24.3         / 2.21              / 3.05
#   cat4 10.05           / 23.1         / 2.17              / 3.01
# cat3 = identical products to x3 in one MXU pass; hardware-validated
# (mxu_hw_check: prim agree 1.0, occ equal, same t envelope).
MXU_PRECISION = os.environ.get("MI_MXU_PRECISION", "cat3")
assert MXU_PRECISION in ("highest", "x4", "x3", "cat3", "cat4",
                         "default"), MXU_PRECISION
# Per-visit lane-group culling. probe_mxu_cost (2026-08-20, N_ITERS=16k):
# a full visit costs ~6.0 us/iter of which the (CK, B) Möller–Trumbore
# epilogue is ~4.5 us (full1 5.96 vs dot1 1.45) — VPU elementwise work
# that scales with B and is mostly WASTED: a cluster demanded by a few
# percent of the block's lanes still pays all B. MXU_SPLIT divides the
# block's sublane rows into Q groups; each group runs its dot + epilogue
# under its own lax.cond gated on "any of MY lanes hit the cluster
# slab". The presort puts cluster demand in contiguous lane runs, so
# whole groups skip. Q > 1 adds Q scalar branches per visit (cheap next
# to 4.5 us) and changes nothing numerically — each lane sees the same
# tests, just conditionally skipped when it could not hit.
# DEFAULT 4 from the 2026-08-20 end-to-end A/B (gallery fwd render
# 5.70 -> 5.97 Mrays/s, 491k-tri 1.15 -> 1.35): production wavefronts
# (bounce/shadow mixtures) gain +5-17%; the only measured loss is on
# purely-coherent synthetic primary wavefronts at the kernel level
# (10.85 -> 9.78 coh closest), which end-to-end renders never see in
# isolation. Kernel-level tables: docs/TPU_TRAVERSAL.md round-4 section.
MXU_SPLIT = int(os.environ.get("MI_MXU_SPLIT", "4"))
assert MXU_SPLIT in (1, 2, 4, 8), f"MI_MXU_SPLIT={MXU_SPLIT}: 1|2|4|8"


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _mxu_dot(feat, rt_pair):
    """(4K, 16-contracted) cluster plane dot at MXU_PRECISION.

    rt_pair is (rt, rt_lo): for x3 the ray-feature matrix is split ONCE
    outside the walk loop; feat (the DMA'd scratch value) is split per
    visit (tiny: (16, 4K)). DEFAULT-precision Mosaic dots round operands
    to bf16, which is exact on the hi halves — so the three passes
    compute ah*bh + ah*bl + al*bh, dropping only the 2^-18 al*bl term."""
    rt, rt_lo = rt_pair
    dn = (((0,), (0,)), ((), ()))
    if MXU_PRECISION == "highest":
        return jax.lax.dot_general(feat, rt, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    if MXU_PRECISION == "default":
        return jax.lax.dot_general(feat, rt, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    f_hi, f_lo = _bf16_split(feat)
    p = jax.lax.Precision.DEFAULT
    if MXU_PRECISION in ("cat3", "cat4"):
        fs = [f_hi, f_hi, f_lo]
        rs = [rt, rt_lo, rt]
        if MXU_PRECISION == "cat4":
            fs.append(f_lo)
            rs.append(rt_lo)
        return jax.lax.dot_general(
            jnp.concatenate(fs, 0), jnp.concatenate(rs, 0), dn,
            preferred_element_type=jnp.float32, precision=p)
    acc = (jax.lax.dot_general(f_hi, rt, dn,
                               preferred_element_type=jnp.float32,
                               precision=p)
           + jax.lax.dot_general(f_hi, rt_lo, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=p)
           + jax.lax.dot_general(f_lo, rt, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=p))
    if MXU_PRECISION == "x4":
        acc = acc + jax.lax.dot_general(f_lo, rt_lo, dn,
                                        preferred_element_type=jnp.float32,
                                        precision=p)
    return acc


def _rt_split(rt):
    if MXU_PRECISION in ("x3", "x4", "cat3", "cat4"):
        hi, lo = _bf16_split(rt)
        return hi, lo
    return rt, rt


def _mxu_cluster_closest(feat_s, base, ccx, ccy, ccz, rt_parts,
                         t_best, best):
    """One MXU cluster visit (closest hit): recentred ray features, the
    4-plane matmul over the DMA'd scratch, and the winner epilogue.
    Shared by the threaded cut-tree walk (_closest_hit_mxu_kernel) and
    the composed BVH8-walk kernel (_closest_hit_bvh8mxu_kernel).
    Returns updated (t_best, best(SLOT ids)). Barycentrics are NOT
    tracked: compute_surface_interaction re-solves exact f32
    Möller–Trumbore from the gathered verts (scene/scene.py), so per
    visit we save the u/v winner extraction (two masked min-reduces +
    selects on (CK, B) tiles) — per-iteration vector work must hide
    under the ~2 us scalar while-loop floor (probe_walk_latency.py)."""
    msub, lanes = t_best.shape
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK
    BIG = jnp.int32(1 << 30)

    def row(a):
        return a.reshape(1, msub * lanes)

    # ray features RECENTRED at the visited cluster's centroid (the
    # planes in feat are host-built about the same point) — bounds the
    # bf16-split cancellation amplification at ~(1 + r_c/t). Hoisted
    # form: three broadcast-FMA passes over the prebuilt rt0/Ax/Ay/Az
    # (_mxu_rt_parts) — rebuilding the feature matrix per visit cost
    # ~15 us/visit on hardware.
    rt = _mxu_rt_at(rt_parts, ccx, ccy, ccz)
    rt_pair = _rt_split(rt)
    # precision: see MXU_PRECISION — the visit cost is pass-count-bound
    res = _mxu_dot(feat_s[:], rt_pair)                       # (4*CK, B)
    det = res[0 * CK:1 * CK]
    unum = res[1 * CK:2 * CK]
    vnum = res[2 * CK:3 * CK]
    tnum = res[3 * CK:4 * CK]
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    u = unum * inv
    v = vnum * inv
    t = tnum * inv
    tb = row(t_best)
    ok = ((inv != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) &
          (t > 0.0) & (t < tb))
    t_m = jnp.where(ok, t, jnp.inf)
    t_c = jnp.min(t_m, axis=0, keepdims=True)                # (1, B)
    win = ok & (t_m <= t_c)
    # implicit ids: row k of this cluster is slot base + k (within a
    # cluster slots ascend with global prim id, so min-slot ties break
    # exactly like the old min-pid rule)
    pids = base + jax.lax.broadcasted_iota(
        jnp.int32, (CK, t.shape[1]), 0)                      # (CK, B)
    prim_c = jnp.min(jnp.where(win, pids, BIG), axis=0, keepdims=True)
    closer = t_c < tb
    nt = jnp.where(closer, t_c, tb).reshape(msub, lanes)
    nbest = jnp.where(closer, prim_c, row(best)).reshape(msub, lanes)
    return nt, nbest


def _mxu_cluster_anyhit(feat_s, ccx, ccy, ccz, rt_parts, tmv, occ_f):
    """One MXU cluster visit (any-hit). Padded slots have all-zero
    feature rows -> det == 0 -> never counted as hits."""
    msub, lanes = occ_f.shape
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK

    def row(a):
        return a.reshape(1, msub * lanes)

    rt = _mxu_rt_at(rt_parts, ccx, ccy, ccz)
    rt_pair = _rt_split(rt)
    res = _mxu_dot(feat_s[:], rt_pair)                       # (4*CK, B)
    det = res[0 * CK:1 * CK]
    unum = res[1 * CK:2 * CK]
    vnum = res[2 * CK:3 * CK]
    tnum = res[3 * CK:4 * CK]
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    u = unum * inv
    v = vnum * inv
    t = tnum * inv
    tb = row(tmv)
    ok = ((inv != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) &
          (t > 0.0) & (t <= tb))
    hit = jnp.max(jnp.where(ok, 1.0, 0.0), axis=0, keepdims=True)
    return jnp.maximum(occ_f, hit.reshape(msub, lanes))


def _split_cluster_closest(feat_s, base, ccx, ccy, ccz, rt_parts,
                           hmask, pred, t_best, best):
    """Cluster visit with MXU_SPLIT-way lane-group culling (closest hit).

    hmask: (msub, 128) per-lane cluster-slab hits; pred: scalar gate
    (walk active & node is a cluster). Each of the Q sublane-row groups
    runs _mxu_cluster_closest on ITS column slice of the ray matrices
    under pred & any(hmask[group]) — groups none of whose lanes can hit
    skip the dot + the (CK, B/Q) epilogue entirely."""
    msub = t_best.shape[0]
    Q = MXU_SPLIT
    # groups below 8 sublanes hit a Mosaic relayout hole ((m*128,) ->
    # (m,128) shape cast fails to infer for m < 8, measured 2026-08-20)
    if Q == 1 or msub % Q != 0 or msub // Q < 8:
        return jax.lax.cond(
            pred & jnp.any(hmask),
            lambda a: _mxu_cluster_closest(feat_s, base, ccx, ccy, ccz,
                                           rt_parts, a[0], a[1]),
            lambda a: a, (t_best, best))
    m = msub // Q
    bq = m * _LANE
    outs_t, outs_b = [], []
    for q in range(Q):
        rp = tuple(a[:, q * bq:(q + 1) * bq] for a in rt_parts)
        hq = jnp.any(hmask[q * m:(q + 1) * m])
        tq, bb = jax.lax.cond(
            pred & hq,
            lambda a, rp=rp: _mxu_cluster_closest(
                feat_s, base, ccx, ccy, ccz, rp, a[0], a[1]),
            lambda a: a,
            (t_best[q * m:(q + 1) * m], best[q * m:(q + 1) * m]))
        outs_t.append(tq)
        outs_b.append(bb)
    return jnp.concatenate(outs_t, 0), jnp.concatenate(outs_b, 0)


def _split_cluster_anyhit(feat_s, ccx, ccy, ccz, rt_parts,
                          hmask, pred, tmv, occ_f):
    """Cluster visit with MXU_SPLIT-way lane-group culling (any hit).
    hmask must already include the per-lane alive (not-yet-occluded)
    bit so fully-occluded groups skip too."""
    msub = occ_f.shape[0]
    Q = MXU_SPLIT
    if Q == 1 or msub % Q != 0 or msub // Q < 8:  # see closest-hit note
        return jax.lax.cond(
            pred & jnp.any(hmask),
            lambda a: _mxu_cluster_anyhit(feat_s, ccx, ccy, ccz,
                                          rt_parts, tmv, a),
            lambda a: a, occ_f)
    m = msub // Q
    bq = m * _LANE
    outs = []
    for q in range(Q):
        rp = tuple(a[:, q * bq:(q + 1) * bq] for a in rt_parts)
        hq = jnp.any(hmask[q * m:(q + 1) * m])
        tm_q = tmv[q * m:(q + 1) * m]
        outs.append(jax.lax.cond(
            pred & hq,
            lambda a, rp=rp, tm_q=tm_q: _mxu_cluster_anyhit(
                feat_s, ccx, ccy, ccz, rp, tm_q, a),
            lambda a: a, occ_f[q * m:(q + 1) * m]))
    return jnp.concatenate(outs, 0)


def _pack_mxu_tables(scene):
    """(node_f (R,8), link_i (R,16), featT (16, 4*S) f32).

    All tables are HOST-precomputed at scene-build time (scene/scene.py):
    the node/link tables are the PRUNED cut-tree (cut nodes + ancestors,
    O(C) rows — below-cut nodes are unreachable for the cluster walk, so
    shipping the full BVH would waste ~P/(2C)x the VMEM), and featT is the
    TRANSPOSED Möller–Trumbore plane table (recomputing it here would
    issue per-slot prim gathers inside jit — the XLA gather wall,
    ~0.15 G elem/s). The transposed orientation is forced by Mosaic: an
    HBM memref slice must be 128-aligned in its MINOR dim (a (4K, 16)
    slice is rejected at compile), so the slot axis lives on lanes and
    each visit DMAs a (16, 4*CK) lane slice whose start 4*base is a
    multiple of 512 (probe: benchmarks/probe_mxu_dma.py mode=t, validated
    on hardware 2026-08-18). The cluster slot rides node_f col 6
    (f32-exact), so each walk step loads just two scalar rows. Prim ids
    are IMPLICIT (slot = base + row iota); the caller remaps slots to
    global prim ids with one cluster_slot_prim gather per wavefront."""
    return scene.mxu_node_f, scene.mxu_link, scene.mxu_feat


def _closest_hit_mxu_kernel(node_f, link_i, feat,
                            ox, oy, oz, dx, dy, dz, tmax,
                            t_out, prim_out, u_out, v_out,
                            feat_s, sem_feat):
    """feat lives in HBM (memory_space=ANY): a dynamic-start
    multi-sublane VMEM load feeding the MXU hangs the chip at dispatch
    (measured on the axon runtime, 2026-08-17), so each cluster visit
    instead DMAs its columns into statically-shaped VMEM scratch and the
    dot_general reads the scratch with static offsets only. prim_out
    holds SLOT ids (base + row); the caller remaps to global prim ids."""
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    msub = oxv.shape[0]   # MXU_BLOCK // _LANE sublanes per ray block
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    _pick_links = _link_picker(_octant_vote(dxv, dyv, dzv))
    fuel_cap = node_f.shape[0] + 64
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK

    def start_dma(base):
        """Stream one cluster's feature columns HBM -> scratch. featT is
        cluster-major (scene.py): cluster c owns the contiguous columns
        [4*base, 4*base + 4*CK) (base = c*CK, so the lane start is a
        multiple of 4*CK >= 512) — ONE 32 KB copy per visit."""
        dmas = [pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(4 * base, 4 * CK), 4 * CK)],
            feat_s, sem_feat)]
        for d in dmas:
            d.start()
        return dmas

    rt_parts = _mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv)

    def cond(state):
        node, fuel = state[0], state[1]
        return (node >= 0) & (fuel < fuel_cap)

    def step(node, t_best, best):
        # one masked walk step (active bit needed for unrolled steps
        # 2..U, whose node may have exited mid-iteration)
        active = node >= 0
        nw = jnp.maximum(node, 0)
        nf = node_f[pl.ds(nw, 1), :]
        slot_base = nf[0, 6].astype(jnp.int32)
        # DMA unconditionally (clamped base) and START FIRST — a DMA
        # buried inside lax.cond is a novel lowering, the unconditional
        # start/wait is the proven streaming shape, and starting before
        # the slab test overlaps the copy with the VPU work.
        sb = jnp.maximum(slot_base, 0)
        dmas = start_dma(sb)

        hit_link, miss_link = _pick_links(link_i[pl.ds(nw, 1), :])
        is_cl = slot_base >= 0

        hmask = _slab(nf, oxv, oyv, ozv, ixv, iyv, izv, t_best)
        hit_any = jnp.any(hmask)
        for d in dmas:
            d.wait()

        t_best, best = _split_cluster_closest(
            feat_s, sb, nf[0, 8], nf[0, 9], nf[0, 10], rt_parts,
            hmask, active & is_cl, t_best, best)

        nxt = jnp.where(is_cl | jnp.logical_not(hit_any),
                        miss_link, hit_link)
        return jnp.where(active, nxt, jnp.int32(-1)), t_best, best

    def body(state):
        node, fuel, t_best, best = state
        for _ in range(MXU_UNROLL):
            node, t_best, best = step(node, t_best, best)
        return node, fuel + MXU_UNROLL, t_best, best

    init = (jnp.int32(0), jnp.int32(0), tmax[:],
            jnp.full((msub, _LANE), -1, jnp.int32))
    _, _, t_best, best = jax.lax.while_loop(cond, body, init)
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best
    # barycentrics are re-solved exactly in compute_surface_interaction
    # from the gathered verts; emit zeros (sphere scenes never take the
    # MXU path, so nothing downstream reads these for parameterization)
    u_out[:] = jnp.zeros((msub, _LANE), jnp.float32)
    v_out[:] = jnp.zeros((msub, _LANE), jnp.float32)


def _any_hit_mxu_kernel(node_f, link_i, feat,
                        ox, oy, oz, dx, dy, dz, tmax,
                        occ_out, feat_s, sem_feat):
    """Any-hit occlusion walk with MXU cluster-leaf tests. Same DMA
    streaming scheme as _closest_hit_mxu_kernel; padded cluster slots have
    all-zero feature rows -> det == 0 -> never counted as hits, so the
    prim-id table is not needed. Early-exits once every lane is occluded."""
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmv = tmax[:]
    msub = oxv.shape[0]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    _pick_links = _link_picker(_octant_vote(dxv, dyv, dzv))
    fuel_cap = node_f.shape[0] + 64
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK

    def start_dma(base):
        # cluster-major featT: one contiguous (16, 4*CK) lane slice per
        # visit (see _closest_hit_mxu_kernel for the layout rationale)
        d = pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(4 * base, 4 * CK), 4 * CK)],
            feat_s, sem_feat)
        d.start()
        return [d]

    rt_parts = _mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv)

    def cond(state):
        node, fuel, occ_f = state
        return (node >= 0) & (fuel < fuel_cap) & (jnp.min(occ_f) < 1.0)

    def step(node, occ_f):
        active = node >= 0
        nw = jnp.maximum(node, 0)
        nf = node_f[pl.ds(nw, 1), :]
        slot_base = nf[0, 6].astype(jnp.int32)
        dmas = start_dma(jnp.maximum(slot_base, 0))  # see closest-hit note

        hit_link, miss_link = _pick_links(link_i[pl.ds(nw, 1), :])
        is_cl = slot_base >= 0

        alive = occ_f < 1.0
        hmask = _slab(nf, oxv, oyv, ozv, ixv, iyv, izv, tmv) & alive
        hit_any = jnp.any(hmask)
        for d in dmas:
            d.wait()

        occ_f = _split_cluster_anyhit(
            feat_s, nf[0, 8], nf[0, 9], nf[0, 10], rt_parts,
            hmask, active & is_cl, tmv, occ_f)
        nxt = jnp.where(is_cl | jnp.logical_not(hit_any),
                        miss_link, hit_link)
        return jnp.where(active, nxt, jnp.int32(-1)), occ_f

    def body(state):
        node, fuel, occ_f = state
        for _ in range(MXU_UNROLL):
            node, occ_f = step(node, occ_f)
        return node, fuel + MXU_UNROLL, occ_f

    init = (jnp.int32(0), jnp.int32(0),
            jnp.zeros((msub, _LANE), jnp.float32))
    _, _, occ_f = jax.lax.while_loop(cond, body, init)
    occ_out[:] = (occ_f >= 1.0).astype(jnp.int32)


# --- dual-walk MXU kernels ---------------------------------------------------
# Two independent MXU_BLOCK-ray block walks (own cursor, links, octant,
# DMA scratch) interleaved in ONE while loop. Round-3 rationale was the
# "~2 us iteration floor"; the round-4 probe decomposition
# (probe_mxu_cost, N_ITERS=16k, fetch-first) CORRECTS that narrative:
# the floor is 0.85 us and a full cluster visit costs ~6 us, ~4.5 us of
# which is the (CK, B) epilogue on the VPU — so interleaving mainly wins
# on the non-visit steps, and MI_MXU_UNROLL (same idea, sequential)
# measured FLAT end to end. Dual-walk keeps its measured edge on
# coherent workloads (which have high non-visit step fractions) and is
# free elsewhere, so W=2 stays the default. Block 8192 with ONE cursor
# would subsume it; it silently miscompiles (see MXU_BLOCK guard), and
# dual 4096 sidesteps the bad relayout. Walks run in lockstep until BOTH
# finish; a finished walk keeps streaming (clamped) cluster 0 with all
# updates masked by its active bit.

MXU_WALKS = int(os.environ.get("MI_MXU_WALKS", "2"))
assert MXU_WALKS in (1, 2), f"MI_MXU_WALKS={MXU_WALKS}: 1 or 2"

# Walk steps UNROLLED inside each while-loop iteration. The ~2 us
# iteration floor is loop-control overhead, not body work (probe: an
# empty body costs the same as loads + slab + matmul), so stepping U
# nodes per iteration amortizes it the same way the dual walk does —
# multiplicatively with it (walks x unroll node-steps per iteration).
# Steps within an iteration are SEQUENTIAL (step j+1's node is step j's
# link), so each unrolled step's DMA waits before its matmul; the
# iteration cost grows only once the summed vector work exceeds the
# floor. Lanes whose walk already exited keep streaming cluster 0 with
# updates masked by the active bit (same convention as the dual walk).
MXU_UNROLL = int(os.environ.get("MI_MXU_UNROLL", "1"))
assert 1 <= MXU_UNROLL <= 8, f"MI_MXU_UNROLL={MXU_UNROLL}: 1..8"


def _mxu_walk_prep(node_f, feat, scratch, sem, refs, w, msub):
    """Per-walk closures: ray component slices + link picker + DMA."""
    ox, oy, oz, dx, dy, dz, tmax = refs
    s = pl.ds(w * msub, msub)
    oxv, oyv, ozv = ox[s, :], oy[s, :], oz[s, :]
    dxv, dyv, dzv = dx[s, :], dy[s, :], dz[s, :]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    pick = _link_picker(_octant_vote(dxv, dyv, dzv))
    CK = scratch.shape[1] // 4  # scratch is (16, 4*CK): scene-built CK

    def start_dma(sb):
        d = pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(4 * sb, 4 * CK), 4 * CK)],
            scratch, sem)
        d.start()
        return d

    return dict(o=(oxv, oyv, ozv), d=(dxv, dyv, dzv),
                inv=(ixv, iyv, izv), tm=tmax[s, :], pick=pick,
                start_dma=start_dma, scratch=scratch,
                rt=_mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv))


def _closest_hit_mxu2_kernel(node_f, link_i, feat,
                             ox, oy, oz, dx, dy, dz, tmax,
                             t_out, prim_out, u_out, v_out,
                             feat_s0, feat_s1, sem0, sem1):
    """Two interleaved cut-tree walks (see block comment above)."""
    msub = ox.shape[0] // 2
    fuel_cap = node_f.shape[0] + 64
    refs = (ox, oy, oz, dx, dy, dz, tmax)
    wk = [_mxu_walk_prep(node_f, feat, s_, m_, refs, w, msub)
          for w, (s_, m_) in enumerate([(feat_s0, sem0),
                                        (feat_s1, sem1)])]

    def cond(state):
        n0, n1, fuel = state[0], state[1], state[2]
        return ((n0 >= 0) | (n1 >= 0)) & (fuel < fuel_cap)

    def step2(nodes, tb, bb):
        nf, sb, is_cl, dmas, links = [], [], [], [], []
        for w in range(2):
            nw = jnp.maximum(nodes[w], 0)
            nfw = node_f[pl.ds(nw, 1), :]
            slot = nfw[0, 6].astype(jnp.int32)
            sbw = jnp.maximum(slot, 0)
            nf.append(nfw)
            sb.append(sbw)
            is_cl.append(slot >= 0)
            dmas.append(wk[w]["start_dma"](sbw))
            links.append(wk[w]["pick"](link_i[pl.ds(nw, 1), :]))
        hmasks, hits = [], []
        for w in range(2):
            hmasks.append(_slab(nf[w], *wk[w]["o"], *wk[w]["inv"], tb[w]))
            hits.append(jnp.any(hmasks[w]))
        new_nodes = []
        for w in range(2):
            dmas[w].wait()
            active = nodes[w] >= 0
            tb[w], bb[w] = _split_cluster_closest(
                wk[w]["scratch"], sb[w], nf[w][0, 8], nf[w][0, 9],
                nf[w][0, 10], wk[w]["rt"], hmasks[w],
                active & is_cl[w], tb[w], bb[w])
            hit_link, miss_link = links[w]
            nxt = jnp.where(is_cl[w] | jnp.logical_not(hits[w]),
                            miss_link, hit_link)
            new_nodes.append(jnp.where(active, nxt, jnp.int32(-1)))
        return new_nodes, tb, bb

    def body(state):
        n0, n1, fuel, t0, b0, t1, b1 = state
        nodes, tb, bb = [n0, n1], [t0, t1], [b0, b1]
        for _ in range(MXU_UNROLL):
            nodes, tb, bb = step2(nodes, tb, bb)
        return (nodes[0], nodes[1], fuel + MXU_UNROLL,
                tb[0], bb[0], tb[1], bb[1])

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0),
            wk[0]["tm"], jnp.full((msub, _LANE), -1, jnp.int32),
            wk[1]["tm"], jnp.full((msub, _LANE), -1, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    t0, b0, t1, b1 = out[3:]
    t_best = jnp.concatenate([t0, t1], axis=0)
    best = jnp.concatenate([b0, b1], axis=0)
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best
    u_out[:] = jnp.zeros((2 * msub, _LANE), jnp.float32)
    v_out[:] = jnp.zeros((2 * msub, _LANE), jnp.float32)


def _any_hit_mxu2_kernel(node_f, link_i, feat,
                         ox, oy, oz, dx, dy, dz, tmax,
                         occ_out, feat_s0, feat_s1, sem0, sem1):
    """Dual-walk occlusion variant (early exit per walk via its active
    bit; loop ends when both walks are exhausted or fully occluded)."""
    msub = ox.shape[0] // 2
    fuel_cap = node_f.shape[0] + 64
    refs = (ox, oy, oz, dx, dy, dz, tmax)
    wk = [_mxu_walk_prep(node_f, feat, s_, m_, refs, w, msub)
          for w, (s_, m_) in enumerate([(feat_s0, sem0),
                                        (feat_s1, sem1)])]

    def live(n, occ_f):
        return (n >= 0) & (jnp.min(occ_f) < 1.0)

    def cond(state):
        n0, n1, fuel, o0, o1 = state
        return (live(n0, o0) | live(n1, o1)) & (fuel < fuel_cap)

    def step2(nodes, occ):
        nf, sb, is_cl, dmas, links = [], [], [], [], []
        for w in range(2):
            nw = jnp.maximum(nodes[w], 0)
            nfw = node_f[pl.ds(nw, 1), :]
            slot = nfw[0, 6].astype(jnp.int32)
            nf.append(nfw)
            sb.append(jnp.maximum(slot, 0))
            is_cl.append(slot >= 0)
            dmas.append(wk[w]["start_dma"](sb[w]))
            links.append(wk[w]["pick"](link_i[pl.ds(nw, 1), :]))
        hmasks, hits = [], []
        for w in range(2):
            alive = occ[w] < 1.0
            hmasks.append(_slab(nf[w], *wk[w]["o"], *wk[w]["inv"],
                                wk[w]["tm"]) & alive)
            hits.append(jnp.any(hmasks[w]))
        new_nodes = []
        for w in range(2):
            dmas[w].wait()
            active = nodes[w] >= 0
            occ[w] = _split_cluster_anyhit(
                wk[w]["scratch"], nf[w][0, 8], nf[w][0, 9], nf[w][0, 10],
                wk[w]["rt"], hmasks[w], active & is_cl[w],
                wk[w]["tm"], occ[w])
            hit_link, miss_link = links[w]
            nxt = jnp.where(is_cl[w] | jnp.logical_not(hits[w]),
                            miss_link, hit_link)
            new_nodes.append(jnp.where(active, nxt, jnp.int32(-1)))
        return new_nodes, occ

    def body(state):
        n0, n1, fuel, o0, o1 = state
        nodes, occ = [n0, n1], [o0, o1]
        for _ in range(MXU_UNROLL):
            nodes, occ = step2(nodes, occ)
        return nodes[0], nodes[1], fuel + MXU_UNROLL, occ[0], occ[1]

    z = jnp.zeros((msub, _LANE), jnp.float32)
    out = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0), z, z))
    occ_f = jnp.concatenate([out[3], out[4]], axis=0)
    occ_out[:] = (occ_f >= 1.0).astype(jnp.int32)


# --- dense cluster-sweep MXU kernels (default OFF — a measured loss) --------
# No walk at all: a counter-driven loop DMAs EVERY cluster and runs the
# plane matmul + epilogue unconditionally — coherence-independent by
# construction. HISTORY (2026-08-19): this path was built on a probe
# reading of 1.61 us/visit that turned out to be a TIMING ARTIFACT of
# the tunneled axon runtime — in a process that has never performed a
# device->host fetch, block_until_ready returns immediately and bur-only
# timings are fantasy (see docs/TPU_TRAVERSAL.md "Timing hygiene").
# Under the honest protocol (one fetch after warmup) a dense visit costs
# ~14 us — the matmul+epilogue vector work itself, not walk overhead —
# so the sweep measures 1.0-1.05 Mrays/s on the 359-cluster gallery
# versus the cut-tree walk's 7.53 coherent / 1.20 incoherent closest and
# 23.1 / 1.63 anyhit. The walk's culling (visits ~= the block's cluster
# union, far below C) beats paying C visits unconditionally at every
# scene size tested. Kept compilable + interpret-tested as the
# coherence-independence baseline; enable with MI_MXU_DENSE=1|auto.

MXU_DENSE_MAX = int(os.environ.get("MI_MXU_DENSE_MAX", "768"))
_MXU_DENSE = os.environ.get("MI_MXU_DENSE", "0")
assert _MXU_DENSE in ("auto", "0", "1")


def _use_dense(scene):
    if _MXU_DENSE == "0":
        return False
    C = scene.mxu_ccs.shape[0] if getattr(scene, "mxu_ccs", None) \
        is not None else None
    if C is None:
        return False
    return True if _MXU_DENSE == "1" else C <= MXU_DENSE_MAX


def _closest_hit_mxu_dense_kernel(ccs, feat,
                                  ox, oy, oz, dx, dy, dz, tmax,
                                  t_out, prim_out, u_out, v_out,
                                  feat_s, sem):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    msub = oxv.shape[0]
    C = ccs.shape[0]
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK
    rt_parts = _mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv)

    def body(i, st):
        t_best, best = st
        dma = pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(i * 4 * CK, 4 * CK), 4 * CK)],
            feat_s, sem)
        dma.start()
        cc = ccs[pl.ds(i, 1), :]
        dma.wait()
        return _mxu_cluster_closest(feat_s, i * CK, cc[0, 0], cc[0, 1],
                                    cc[0, 2], rt_parts, t_best, best)

    t_best, best = jax.lax.fori_loop(
        0, C, body,
        (tmax[:], jnp.full((msub, _LANE), -1, jnp.int32)))
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best
    u_out[:] = jnp.zeros((msub, _LANE), jnp.float32)
    v_out[:] = jnp.zeros((msub, _LANE), jnp.float32)


def _any_hit_mxu_dense_kernel(ccs, feat,
                              ox, oy, oz, dx, dy, dz, tmax,
                              occ_out, feat_s, sem):
    """Dense occlusion sweep; exits once every lane is occluded (the
    counter-in-while shape keeps the body unconditional)."""
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmv = tmax[:]
    msub = oxv.shape[0]
    C = ccs.shape[0]
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK
    rt_parts = _mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv)

    def cond(st):
        i, occ_f = st
        return (i < C) & (jnp.min(occ_f) < 1.0)

    def body(st):
        i, occ_f = st
        dma = pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(i * 4 * CK, 4 * CK), 4 * CK)],
            feat_s, sem)
        dma.start()
        cc = ccs[pl.ds(i, 1), :]
        dma.wait()
        occ_f = _mxu_cluster_anyhit(feat_s, cc[0, 0], cc[0, 1], cc[0, 2],
                                    rt_parts, tmv, occ_f)
        return i + 1, occ_f

    _, occ_f = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((msub, _LANE), jnp.float32)))
    occ_out[:] = (occ_f >= 1.0).astype(jnp.int32)


def _mxu_dense_call(kern, n_blocks, msub, out_shapes, interpret, ck):
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    rs = _mxu_ray_spec(msub)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec, any_spec] + [rs] * 7,
        out_specs=tuple(rs for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((16, 4 * ck), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _blockify(x, n_pad):
    x = jnp.pad(x, (0, n_pad - x.shape[0]))
    return x.reshape(n_pad // _LANE, _LANE)


def _components(v):
    if hasattr(v, "x"):  # planar Vec3
        return v.x, v.y, v.z
    return v[:, 0], v[:, 1], v[:, 2]


_ray_spec = pl.BlockSpec((BLOCK // _LANE, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
_tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # full table, replicated


def _mxu_ray_spec(msub):
    return pl.BlockSpec((msub, _LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _mxu_call(n_blocks, msub, out_shapes, interpret, ck, walks=1):
    """pallas_call for the MXU cluster-leaf kernel: node/link tables in
    VMEM (scalar row loads), featT resident in HBM (ANY) and DMA-streamed
    per cluster into VMEM scratch — so VMEM use is O(1) in scene size and
    the dot_general sees only static offsets. walks=2 selects the
    dual-walk kernel (msub here is the TOTAL sublane rows per grid
    step, i.e. walks * MXU_BLOCK/128)."""
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    rs = _mxu_ray_spec(msub)
    kern = _closest_hit_mxu2_kernel if walks == 2 else \
        _closest_hit_mxu_kernel
    scratch = [pltpu.VMEM((16, 4 * ck), jnp.float32)] * walks + \
        [pltpu.SemaphoreType.DMA] * walks
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec, _tab_spec, any_spec] + [rs] * 7,
        out_specs=tuple(rs for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _mxu_anyhit_call(n_blocks, msub, out_shapes, interpret, ck, walks=1):
    """Occlusion variant of _mxu_call: no prim-id stream (padded slots
    are self-masking via their all-zero feature rows)."""
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    rs = _mxu_ray_spec(msub)
    kern = _any_hit_mxu2_kernel if walks == 2 else _any_hit_mxu_kernel
    scratch = [pltpu.VMEM((16, 4 * ck), jnp.float32)] * walks + \
        [pltpu.SemaphoreType.DMA] * walks
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec, _tab_spec, any_spec] + [rs] * 7,
        out_specs=tuple(rs for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _grid_call(kernel, n_blocks, out_shapes, interpret, n_tables=3):
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[_tab_spec] * n_tables + [_ray_spec] * 7,
        out_specs=tuple(_ray_spec for _ in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        # the full-table in_specs get pipelined double buffers; with the
        # octant link table the conservative scoped-vmem estimate exceeds
        # the default 16M scoped limit — raise it toward the physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _scene_ck(scene) -> int:
    """The MXU cluster size this scene's tables were built with
    (SceneData.cluster_k; falls back to the module default for pytrees
    predating the field). Kernels size their VMEM feature scratch from
    it, so scenes built under different CK values coexist safely."""
    return int(getattr(scene, "cluster_k", CLUSTER_K) or CLUSTER_K)


def emits_uv(scene) -> bool:
    """Does ray_intersect_preliminary return REAL barycentrics?

    The MXU cluster path skips per-visit winner u/v extraction (emits
    zeros; the shading stage's exact Möller–Trumbore re-solve reproduces
    them — scene.py::compute_surface_interaction). Callers that carry
    (u, v) through an unsort can drop the two all-zero payload operands
    when this is False (scene.py::_sorted_pallas_intersect)."""
    return not (MXU_LEAVES and not scene.has_spheres and
                getattr(scene, "mxu_feat", None) is not None)


def ray_intersect_preliminary(scene, ray_o, ray_d, t_max, interpret=None
                              ) -> Tuple[jnp.ndarray, ...]:
    """Closest hit via the packet kernel. Same contract as
    traverse_jnp.ray_intersect_preliminary (detached under AD)."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if getattr(scene, "has_instances", False):
        raise ValueError("instanced scene: use ray_intersect_instanced / "
                         "ray_test_instanced (prim tables are "
                         "instance-local)")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    use_mxu = (MXU_LEAVES and not scene.has_spheres and
               getattr(scene, "mxu_feat", None) is not None)
    dense = use_mxu and _use_dense(scene)
    walks = MXU_WALKS if (use_mxu and not dense and N > MXU_BLOCK) else 1
    blk = MXU_BLOCK * walks if use_mxu else BLOCK
    n_pad = max(-(-N // blk) * blk, blk)
    n_blocks = n_pad // blk

    args = [_blockify(ox, n_pad), _blockify(oy, n_pad),
            _blockify(oz, n_pad), _blockify(dx, n_pad),
            _blockify(dy, n_pad), _blockify(dz, n_pad),
            _blockify(t_max, n_pad)]
    sh = (n_pad // _LANE, _LANE)
    out_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.int32),
                  jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.float32)]
    if use_mxu:
        if dense:
            outs = _mxu_dense_call(
                _closest_hit_mxu_dense_kernel, n_blocks, blk // _LANE,
                out_shapes, interpret,
                _scene_ck(scene))(scene.mxu_ccs, scene.mxu_feat, *args)
        else:
            tables = _pack_mxu_tables(scene)
            outs = _mxu_call(n_blocks, blk // _LANE, out_shapes,
                             interpret, _scene_ck(scene),
                             walks=walks)(*tables, *args)
        t, slot, u, v = (o.reshape(n_pad)[:N] for o in outs)
        # kernel emits cluster SLOT ids (implicit base + row iota); one
        # XLA gather per wavefront remaps to global prim ids — shading
        # already gathers ~25 elem/lane, so +1 is noise
        prim = jnp.where(slot >= 0,
                         scene.cluster_slot_prim[jnp.maximum(slot, 0)], -1)
        return t, prim, u, v
    node_f, node_i, link_i, prim_f = _pack_tables(scene)
    outs = _grid_call(_closest_hit_kernel, n_blocks, out_shapes,
                      interpret, n_tables=4)(node_f, node_i, link_i,
                                             prim_f, *args)
    t, prim, u, v = (o.reshape(n_pad)[:N] for o in outs)
    return t, prim, u, v


def ray_test(scene, ray_o, ray_d, t_max, interpret=None) -> jnp.ndarray:
    """Any-hit occlusion query via the packet kernel."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if getattr(scene, "has_instances", False):
        raise ValueError("instanced scene: use ray_intersect_instanced / "
                         "ray_test_instanced (prim tables are "
                         "instance-local)")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    use_mxu = (MXU_LEAVES and not scene.has_spheres and
               getattr(scene, "mxu_feat", None) is not None)
    dense = use_mxu and _use_dense(scene)
    walks = MXU_WALKS if (use_mxu and not dense and N > MXU_BLOCK) else 1
    blk = MXU_BLOCK * walks if use_mxu else BLOCK
    n_pad = max(-(-N // blk) * blk, blk)
    n_blocks = n_pad // blk

    args = [_blockify(ox, n_pad), _blockify(oy, n_pad),
            _blockify(oz, n_pad), _blockify(dx, n_pad),
            _blockify(dy, n_pad), _blockify(dz, n_pad),
            _blockify(t_max, n_pad)]
    sh = (n_pad // _LANE, _LANE)
    if use_mxu:
        if dense:
            occ = _mxu_dense_call(
                _any_hit_mxu_dense_kernel, n_blocks, blk // _LANE,
                [jax.ShapeDtypeStruct(sh, jnp.int32)],
                interpret, _scene_ck(scene))(scene.mxu_ccs,
                                             scene.mxu_feat, *args)
        else:
            node_f, link_i, feat = _pack_mxu_tables(scene)
            occ = _mxu_anyhit_call(
                n_blocks, blk // _LANE,
                [jax.ShapeDtypeStruct(sh, jnp.int32)],
                interpret, _scene_ck(scene),
                walks=walks)(node_f, link_i, feat, *args)
    else:
        node_f, node_i, _, prim_f = _pack_tables(scene)
        occ = _grid_call(_any_hit_kernel, n_blocks,
                         [jax.ShapeDtypeStruct(sh, jnp.int32)],
                         interpret)(node_f, node_i, prim_f, *args)
    if isinstance(occ, (tuple, list)):
        occ = occ[0]
    return (occ.reshape(n_pad)[:N]) != 0


# ===========================================================================
# Shared-BLAS instanced kernels (scene built with shapes.Instance;
# bvh.py::build_two_level — the OptiX-IAS analog). Same block-synchronous
# walk as the scalar kernels plus:
#   - instance leaves (leaf_start >= 0 AND leaf_count == 0; leaf_start is
#     the instance id): the whole block re-derives its rays into instance
#     space (two scalar row loads of the 3x4 affine + vector math — all
#     proven kernel constructs), saves the TLAS continuation in `ret`,
#     re-votes the direction octant on the local d, and jumps to the
#     shared BLAS root;
#   - the BLAS_EXIT (-2) link pops `ret` and restores the world rays
#     (copied from the kernel inputs — no drift);
#   - the winning instance id is tracked per lane alongside the prim id.
# Prim tables hold each group's prims ONCE in local space; t is preserved
# across spaces because d transforms linearly (unnormalized).
# ===========================================================================

BLAS_EXIT = -2


def _pick_links_dyn(li, octv):
    """Octant link row select with a TRACED octant (instanced walks
    re-vote the octant after each instance-space change). Static unrolled
    select chain — see _link_picker for the Mosaic rationale."""
    hit = li[0, 0]
    miss = li[0, 8]
    for k in range(1, 8):
        sel = octv == k
        hit = jnp.where(sel, li[0, k], hit)
        miss = jnp.where(sel, li[0, 8 + k], miss)
    return hit, miss


def _inst_rays(it, wox, woy, woz, wdx, wdy, wdz):
    """Block rays world -> instance space from one (1, 16) affine row."""
    olx = it[0, 0] * wox + it[0, 1] * woy + it[0, 2] * woz + it[0, 3]
    oly = it[0, 4] * wox + it[0, 5] * woy + it[0, 6] * woz + it[0, 7]
    olz = it[0, 8] * wox + it[0, 9] * woy + it[0, 10] * woz + it[0, 11]
    dlx = it[0, 0] * wdx + it[0, 1] * wdy + it[0, 2] * wdz
    dly = it[0, 4] * wdx + it[0, 5] * wdy + it[0, 6] * wdz
    dlz = it[0, 8] * wdx + it[0, 9] * wdy + it[0, 10] * wdz
    return olx, oly, olz, dlx, dly, dlz


def _closest_hit_inst_kernel(node_f, node_i, link_i, prim_f, inst_t,
                             ox, oy, oz, dx, dy, dz, tmax,
                             t_out, prim_out, u_out, v_out, inst_out,
                             fuel_cap: int):
    wox, woy, woz = ox[:], oy[:], oz[:]
    wdx, wdy, wdz = dx[:], dy[:], dz[:]
    msub = wox.shape[0]

    def cond(state):
        node, fuel = state[0], state[1]
        return (node >= 0) & (fuel < fuel_cap)

    def body(state):
        (node, fuel, ret, cinst, octv,
         oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl,
         t_best, best, bu, bv, binst) = state
        nf = node_f[pl.ds(node, 1), :]
        ni = node_i[pl.ds(node, 1), :]
        leaf_start = ni[0, 0]
        leaf_count = ni[0, 1]
        hit_link, miss_link = _pick_links_dyn(link_i[pl.ds(node, 1), :],
                                              octv)
        is_leaf = leaf_start >= 0
        is_inst = is_leaf & (leaf_count == 0)

        hit_any = jnp.any(_slab(nf, oxl, oyl, ozl, ixl, iyl, izl, t_best))

        def leaf_tests(args):
            t_best, best, bu, bv, binst = args
            for k in range(LEAF_K):
                pr = prim_f[pl.ds(leaf_start + k, 1), :]
                tk, uk, vk = _prim_test(pr, oxl, oyl, ozl, dxl, dyl, dzl)
                closer = (k < leaf_count) & (tk < t_best)
                t_best = jnp.where(closer, tk, t_best)
                best = jnp.where(closer, leaf_start + k, best)
                bu = jnp.where(closer, uk, bu)
                bv = jnp.where(closer, vk, bv)
                binst = jnp.where(closer, cinst, binst)
            return t_best, best, bu, bv, binst

        t_best, best, bu, bv, binst = jax.lax.cond(
            is_leaf & (~is_inst) & hit_any, leaf_tests, lambda a: a,
            (t_best, best, bu, bv, binst))

        # --- instance entry: re-derive block rays into instance space ----
        enter = is_inst & hit_any
        iid = jnp.maximum(leaf_start, 0)
        it = inst_t[pl.ds(iid, 1), :]
        lox, loy, loz, ldx, ldy, ldz = _inst_rays(
            it, wox, woy, woz, wdx, wdy, wdz)
        blas_root = it[0, 12].astype(jnp.int32)

        def sel(a, b):
            return jnp.where(enter, a, b)

        oxl, oyl, ozl = sel(lox, oxl), sel(loy, oyl), sel(loz, ozl)
        dxl, dyl, dzl = sel(ldx, dxl), sel(ldy, dyl), sel(ldz, dzl)
        ret = jnp.where(enter, miss_link, ret)
        cinst = jnp.where(enter, iid, cinst)

        nxt = jnp.where(enter, blas_root,
                        jnp.where(is_leaf | jnp.logical_not(hit_any),
                                  miss_link, hit_link))

        # --- BLAS exit: pop the saved TLAS continuation, world rays ------
        pop = nxt == BLAS_EXIT
        nxt = jnp.where(pop, ret, nxt)
        ret = jnp.where(pop, -1, ret)
        cinst = jnp.where(pop, -1, cinst)
        back = pop & jnp.logical_not(enter)

        def selp(w, c):
            return jnp.where(back, w, c)

        oxl, oyl, ozl = selp(wox, oxl), selp(woy, oyl), selp(woz, ozl)
        dxl, dyl, dzl = selp(wdx, dxl), selp(wdy, dyl), selp(wdz, dzl)
        changed = enter | back
        ixl = jnp.where(changed, _safe_inv(dxl), ixl)
        iyl = jnp.where(changed, _safe_inv(dyl), iyl)
        izl = jnp.where(changed, _safe_inv(dzl), izl)
        octv = jnp.where(changed, _octant_vote(dxl, dyl, dzl), octv)

        return (nxt, fuel + 1, ret, cinst, octv,
                oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl,
                t_best, best, bu, bv, binst)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(-1),
            _octant_vote(wdx, wdy, wdz),
            wox, woy, woz, wdx, wdy, wdz,
            _safe_inv(wdx), _safe_inv(wdy), _safe_inv(wdz),
            tmax[:],
            jnp.full((msub, _LANE), -1, jnp.int32),
            jnp.zeros((msub, _LANE), jnp.float32),
            jnp.zeros((msub, _LANE), jnp.float32),
            jnp.full((msub, _LANE), -1, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    t_best, best, bu, bv, binst = out[14], out[15], out[16], out[17], out[18]
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best
    u_out[:] = bu
    v_out[:] = bv
    inst_out[:] = binst


def _any_hit_inst_kernel(node_f, node_i, link_i, prim_f, inst_t,
                         ox, oy, oz, dx, dy, dz, tmax, occ_out,
                         fuel_cap: int):
    wox, woy, woz = ox[:], oy[:], oz[:]
    wdx, wdy, wdz = dx[:], dy[:], dz[:]
    tmv = tmax[:]
    msub = wox.shape[0]

    def cond(state):
        node, fuel, occ_f = state[0], state[1], state[4]
        return (node >= 0) & (fuel < fuel_cap) & (jnp.min(occ_f) < 1.0)

    def body(state):
        (node, fuel, ret, cinst, occ_f, octv,
         oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl) = state
        nf = node_f[pl.ds(node, 1), :]
        ni = node_i[pl.ds(node, 1), :]
        leaf_start = ni[0, 0]
        leaf_count = ni[0, 1]
        hit_link, miss_link = _pick_links_dyn(link_i[pl.ds(node, 1), :],
                                              octv)
        is_leaf = leaf_start >= 0
        is_inst = is_leaf & (leaf_count == 0)

        alive = occ_f < 1.0
        hit_any = jnp.any(_slab(nf, oxl, oyl, ozl, ixl, iyl, izl, tmv)
                          & alive)

        def leaf_tests(occ_f):
            for k in range(LEAF_K):
                pr = prim_f[pl.ds(leaf_start + k, 1), :]
                tk, _, _ = _prim_test(pr, oxl, oyl, ozl, dxl, dyl, dzl)
                hit = (k < leaf_count) & jnp.isfinite(tk) & (tk <= tmv)
                occ_f = jnp.maximum(occ_f, jnp.where(hit, 1.0, 0.0))
            return occ_f

        occ_f = jax.lax.cond(is_leaf & (~is_inst) & hit_any, leaf_tests,
                             lambda o: o, occ_f)

        enter = is_inst & hit_any
        iid = jnp.maximum(leaf_start, 0)
        it = inst_t[pl.ds(iid, 1), :]
        lox, loy, loz, ldx, ldy, ldz = _inst_rays(
            it, wox, woy, woz, wdx, wdy, wdz)
        blas_root = it[0, 12].astype(jnp.int32)

        def sel(a, b):
            return jnp.where(enter, a, b)

        oxl, oyl, ozl = sel(lox, oxl), sel(loy, oyl), sel(loz, ozl)
        dxl, dyl, dzl = sel(ldx, dxl), sel(ldy, dyl), sel(ldz, dzl)
        ret = jnp.where(enter, miss_link, ret)
        cinst = jnp.where(enter, iid, cinst)

        nxt = jnp.where(enter, blas_root,
                        jnp.where(is_leaf | jnp.logical_not(hit_any),
                                  miss_link, hit_link))
        pop = nxt == BLAS_EXIT
        nxt = jnp.where(pop, ret, nxt)
        ret = jnp.where(pop, -1, ret)
        cinst = jnp.where(pop, -1, cinst)
        back = pop & jnp.logical_not(enter)

        def selp(w, c):
            return jnp.where(back, w, c)

        oxl, oyl, ozl = selp(wox, oxl), selp(woy, oyl), selp(woz, ozl)
        dxl, dyl, dzl = selp(wdx, dxl), selp(wdy, dyl), selp(wdz, dzl)
        changed = enter | back
        ixl = jnp.where(changed, _safe_inv(dxl), ixl)
        iyl = jnp.where(changed, _safe_inv(dyl), iyl)
        izl = jnp.where(changed, _safe_inv(dzl), izl)
        octv = jnp.where(changed, _octant_vote(dxl, dyl, dzl), octv)

        return (nxt, fuel + 1, ret, cinst, occ_f, octv,
                oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(-1),
            jnp.zeros((msub, _LANE), jnp.float32),
            _octant_vote(wdx, wdy, wdz),
            wox, woy, woz, wdx, wdy, wdz,
            _safe_inv(wdx), _safe_inv(wdy), _safe_inv(wdz))
    occ_f = jax.lax.while_loop(cond, body, init)[4]
    occ_out[:] = (occ_f >= 1.0).astype(jnp.int32)


def _pack_inst_tables(scene):
    """Stitched two-level tables for the instanced kernels. node_i keeps
    the canonical [leaf_start, leaf_count, miss, 0] row layout — instance
    leaves are the rows with leaf_start >= 0 and leaf_count == 0."""
    node_f, node_i, link_i, prim_f = _pack_tables(scene)
    return node_f, node_i, link_i, prim_f, scene.inst_inv


def ray_intersect_instanced(scene, ray_o, ray_d, t_max, interpret=None):
    """Closest hit on a shared-BLAS instanced scene. Returns
    (t, prim, u, v, inst). Triangle-only scenes take the instanced MXU
    cluster walk (TLAS + per-group cut trees, _use_instmxu); scenes with
    analytic spheres keep the scalar instanced kernels."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    use_mxu = _use_instmxu(scene)
    blk = MXU_BLOCK if use_mxu else BLOCK
    n_pad = max(-(-N // blk) * blk, blk)
    n_blocks = n_pad // blk
    args = [_blockify(a, n_pad) for a in (ox, oy, oz, dx, dy, dz, t_max)]
    sh = (n_pad // _LANE, _LANE)
    out_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.int32),
                  jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.int32)]
    if use_mxu:
        any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
        rs = _mxu_ray_spec(blk // _LANE)
        kern = functools.partial(_closest_hit_instmxu_kernel,
                                 fuel_cap=scene.inst_mxu_fuel + 64)
        outs = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[_tab_spec, _tab_spec, any_spec, _tab_spec] + [rs] * 7,
            out_specs=tuple(rs for _ in out_shapes),
            out_shape=tuple(out_shapes),
            scratch_shapes=[pltpu.VMEM((16, 4 * _scene_ck(scene)),
                                       jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.VMEM((64, blk), jnp.float32)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(scene.mxu_node_f, scene.mxu_link, scene.mxu_feat,
          scene.inst_inv, *args)
        t, slot, u, v, inst = (o.reshape(n_pad)[:N] for o in outs)
        prim = jnp.where(slot >= 0,
                         scene.cluster_slot_prim[jnp.maximum(slot, 0)], -1)
        return t, prim, u, v, inst
    tables = _pack_inst_tables(scene)
    kern = functools.partial(_closest_hit_inst_kernel,
                             fuel_cap=scene.inst_fuel + 64)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec] * 5 + [_ray_spec] * 7,
        out_specs=tuple(_ray_spec for _ in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*tables, *args)
    t, prim, u, v, inst = (o.reshape(n_pad)[:N] for o in outs)
    return t, prim, u, v, inst


def ray_test_instanced(scene, ray_o, ray_d, t_max, interpret=None):
    """Any-hit occlusion on a shared-BLAS instanced scene (instanced MXU
    walk when the scene qualifies — see ray_intersect_instanced)."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    use_mxu = _use_instmxu(scene)
    blk = MXU_BLOCK if use_mxu else BLOCK
    n_pad = max(-(-N // blk) * blk, blk)
    n_blocks = n_pad // blk
    args = [_blockify(a, n_pad) for a in (ox, oy, oz, dx, dy, dz, t_max)]
    sh = (n_pad // _LANE, _LANE)
    if use_mxu:
        any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
        rs = _mxu_ray_spec(blk // _LANE)
        kern = functools.partial(_any_hit_instmxu_kernel,
                                 fuel_cap=scene.inst_mxu_fuel + 64)
        occ = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[_tab_spec, _tab_spec, any_spec, _tab_spec] + [rs] * 7,
            out_specs=(rs,),
            out_shape=(jax.ShapeDtypeStruct(sh, jnp.int32),),
            scratch_shapes=[pltpu.VMEM((16, 4 * _scene_ck(scene)),
                                       jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.VMEM((64, blk), jnp.float32)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(scene.mxu_node_f, scene.mxu_link, scene.mxu_feat,
          scene.inst_inv, *args)
    else:
        tables = _pack_inst_tables(scene)
        kern = functools.partial(_any_hit_inst_kernel,
                                 fuel_cap=scene.inst_fuel + 64)
        occ = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[_tab_spec] * 5 + [_ray_spec] * 7,
            out_specs=(_ray_spec,),
            out_shape=(jax.ShapeDtypeStruct(sh, jnp.int32),),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*tables, *args)
    if isinstance(occ, (tuple, list)):
        occ = occ[0]
    return (occ.reshape(n_pad)[:N]) != 0


# ===========================================================================
# Instanced MXU cluster walk (round 4): the TLAS + per-group CUT-tree
# stitch (bvh.py::build_two_level_mxu) walked with the same one-deep
# continuation as the scalar instanced kernels, but leaves are CLUSTER
# visits — the (4K, 48)x(48, B) plane matmul over LOCAL-space features.
# Ray features are exactly linear under affines, but rather than a
# per-instance 16x16 feature-space matrix the kernel simply re-derives
# (o_l, d_l) on instance entry (the proven _inst_rays shape) and rebuilds
# its rt_parts under lax.cond — ~15 us per ENTRY, amortized over that
# instance's cluster visits. The winning instance id is tracked by
# "t_best strictly improved at this visit" (prim-id equality is not a
# safe improvement test: two instances of one group can win the same
# local slot). Spheres have no plane form, so scenes with spheres keep
# the scalar instanced kernels (same guard as the flat MXU path).
# ===========================================================================


def _instmxu_prep(node_f, link_i, feat, inst_t, feat_s, sem_feat):
    """Shared closures for the instanced MXU walk kernels."""
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK

    def start_dma(sb):
        d = pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(4 * sb, 4 * CK), 4 * CK)],
            feat_s, sem_feat)
        d.start()
        return d

    return start_dma


def _rt_scratch_write(rt_s, parts):
    rt0, rax, ray_, raz = parts
    rt_s[0:16, :] = rt0
    rt_s[16:32, :] = rax
    rt_s[32:48, :] = ray_
    rt_s[48:64, :] = raz


def _rt_scratch_read(rt_s):
    return (rt_s[0:16, :], rt_s[16:32, :], rt_s[32:48, :], rt_s[48:64, :])


def _closest_hit_instmxu_kernel(node_f, link_i, feat, inst_t,
                                ox, oy, oz, dx, dy, dz, tmax,
                                t_out, prim_out, u_out, v_out, inst_out,
                                feat_s, sem_feat, rt_s, fuel_cap: int):
    """rt_s: (64, B) VMEM scratch holding the CURRENT-space ray-feature
    parts [rt0 | ax | ay | az] (16 rows each). It is rewritten under
    @pl.when(space changed) — a lax.cond-carried rebuild lowers to an
    arith.select over (8,128) vectors that Mosaic fails to legalize
    (measured 2026-08-20); predicated scratch stores are the proven
    conditional-state shape."""
    wox, woy, woz = ox[:], oy[:], oz[:]
    wdx, wdy, wdz = dx[:], dy[:], dz[:]
    msub = wox.shape[0]
    start_dma = _instmxu_prep(node_f, link_i, feat, inst_t,
                              feat_s, sem_feat)
    _rt_scratch_write(rt_s, _mxu_rt_parts(wox, woy, woz, wdx, wdy, wdz))

    def cond(state):
        node, fuel = state[0], state[1]
        return (node >= 0) & (fuel < fuel_cap)

    def body(state):
        (node, fuel, ret, cinst, octv,
         oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl,
         t_best, best, binst) = state
        nf = node_f[pl.ds(node, 1), :]
        slot = nf[0, 6].astype(jnp.int32)
        iid_t = nf[0, 7].astype(jnp.int32)
        sb = jnp.maximum(slot, 0)
        dma = start_dma(sb)
        hit_link, miss_link = _pick_links_dyn(link_i[pl.ds(node, 1), :],
                                              octv)
        is_cl = slot >= 0
        is_inst = iid_t >= 0

        hmask = _slab(nf, oxl, oyl, ozl, ixl, iyl, izl, t_best)
        hit_any = jnp.any(hmask)
        dma.wait()

        t_prev = t_best
        t_best, best = _split_cluster_closest(
            feat_s, sb, nf[0, 8], nf[0, 9], nf[0, 10],
            _rt_scratch_read(rt_s), hmask, is_cl, t_best, best)
        binst = jnp.where(t_best < t_prev, cinst, binst)

        # --- instance entry: block rays + ray matrices -> instance space
        enter = is_inst & hit_any
        iid = jnp.maximum(iid_t, 0)
        it = inst_t[pl.ds(iid, 1), :]
        lox, loy, loz, ldx, ldy, ldz = _inst_rays(
            it, wox, woy, woz, wdx, wdy, wdz)
        cut_root = it[0, 13].astype(jnp.int32)

        def sel(a, b):
            return jnp.where(enter, a, b)

        oxl, oyl, ozl = sel(lox, oxl), sel(loy, oyl), sel(loz, ozl)
        dxl, dyl, dzl = sel(ldx, dxl), sel(ldy, dyl), sel(ldz, dzl)
        ret = jnp.where(enter, miss_link, ret)
        cinst = jnp.where(enter, iid, cinst)

        nxt = jnp.where(enter, cut_root,
                        jnp.where(is_cl | jnp.logical_not(hit_any),
                                  miss_link, hit_link))

        # --- BLAS exit: pop the TLAS continuation, restore world rays ---
        pop = nxt == BLAS_EXIT
        nxt = jnp.where(pop, ret, nxt)
        ret = jnp.where(pop, -1, ret)
        cinst = jnp.where(pop, -1, cinst)
        back = pop & jnp.logical_not(enter)

        def selp(w, c):
            return jnp.where(back, w, c)

        oxl, oyl, ozl = selp(wox, oxl), selp(woy, oyl), selp(woz, ozl)
        dxl, dyl, dzl = selp(wdx, dxl), selp(wdy, dyl), selp(wdz, dzl)
        changed = enter | back
        ixl = jnp.where(changed, _safe_inv(dxl), ixl)
        iyl = jnp.where(changed, _safe_inv(dyl), iyl)
        izl = jnp.where(changed, _safe_inv(dzl), izl)
        octv = jnp.where(changed, _octant_vote(dxl, dyl, dzl), octv)

        # rt_parts rebuild ONLY when the ray space changed (per entry,
        # not per step) — predicated scratch store, see docstring
        @pl.when(changed)
        def _():
            _rt_scratch_write(rt_s, _mxu_rt_parts(oxl, oyl, ozl,
                                                  dxl, dyl, dzl))

        return (nxt, fuel + 1, ret, cinst, octv,
                oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl,
                t_best, best, binst)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(-1),
            _octant_vote(wdx, wdy, wdz),
            wox, woy, woz, wdx, wdy, wdz,
            _safe_inv(wdx), _safe_inv(wdy), _safe_inv(wdz),
            tmax[:],
            jnp.full((msub, _LANE), -1, jnp.int32),
            jnp.full((msub, _LANE), -1, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    t_best, best, binst = out[14], out[15], out[16]
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best          # cluster SLOT ids; caller remaps
    u_out[:] = jnp.zeros((msub, _LANE), jnp.float32)
    v_out[:] = jnp.zeros((msub, _LANE), jnp.float32)
    inst_out[:] = jnp.where(best >= 0, binst, -1)


def _any_hit_instmxu_kernel(node_f, link_i, feat, inst_t,
                            ox, oy, oz, dx, dy, dz, tmax, occ_out,
                            feat_s, sem_feat, rt_s, fuel_cap: int):
    """Occlusion variant; rt_s scratch convention as the closest kernel."""
    wox, woy, woz = ox[:], oy[:], oz[:]
    wdx, wdy, wdz = dx[:], dy[:], dz[:]
    tmv = tmax[:]
    msub = wox.shape[0]
    start_dma = _instmxu_prep(node_f, link_i, feat, inst_t,
                              feat_s, sem_feat)
    _rt_scratch_write(rt_s, _mxu_rt_parts(wox, woy, woz, wdx, wdy, wdz))

    def cond(state):
        node, fuel, occ_f = state[0], state[1], state[-1]
        return (node >= 0) & (fuel < fuel_cap) & (jnp.min(occ_f) < 1.0)

    def body(state):
        (node, fuel, ret, octv,
         oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl, occ_f) = state
        nf = node_f[pl.ds(node, 1), :]
        slot = nf[0, 6].astype(jnp.int32)
        iid_t = nf[0, 7].astype(jnp.int32)
        sb = jnp.maximum(slot, 0)
        dma = start_dma(sb)
        hit_link, miss_link = _pick_links_dyn(link_i[pl.ds(node, 1), :],
                                              octv)
        is_cl = slot >= 0
        is_inst = iid_t >= 0

        alive = occ_f < 1.0
        hmask = _slab(nf, oxl, oyl, ozl, ixl, iyl, izl, tmv) & alive
        hit_any = jnp.any(hmask)
        dma.wait()

        occ_f = _split_cluster_anyhit(
            feat_s, nf[0, 8], nf[0, 9], nf[0, 10],
            _rt_scratch_read(rt_s), hmask, is_cl, tmv, occ_f)

        enter = is_inst & hit_any
        iid = jnp.maximum(iid_t, 0)
        it = inst_t[pl.ds(iid, 1), :]
        lox, loy, loz, ldx, ldy, ldz = _inst_rays(
            it, wox, woy, woz, wdx, wdy, wdz)
        cut_root = it[0, 13].astype(jnp.int32)

        def sel(a, b):
            return jnp.where(enter, a, b)

        oxl, oyl, ozl = sel(lox, oxl), sel(loy, oyl), sel(loz, ozl)
        dxl, dyl, dzl = sel(ldx, dxl), sel(ldy, dyl), sel(ldz, dzl)
        ret = jnp.where(enter, miss_link, ret)
        nxt = jnp.where(enter, cut_root,
                        jnp.where(is_cl | jnp.logical_not(hit_any),
                                  miss_link, hit_link))
        pop = nxt == BLAS_EXIT
        nxt = jnp.where(pop, ret, nxt)
        ret = jnp.where(pop, -1, ret)
        back = pop & jnp.logical_not(enter)

        def selp(w, c):
            return jnp.where(back, w, c)

        oxl, oyl, ozl = selp(wox, oxl), selp(woy, oyl), selp(woz, ozl)
        dxl, dyl, dzl = selp(wdx, dxl), selp(wdy, dyl), selp(wdz, dzl)
        changed = enter | back
        ixl = jnp.where(changed, _safe_inv(dxl), ixl)
        iyl = jnp.where(changed, _safe_inv(dyl), iyl)
        izl = jnp.where(changed, _safe_inv(dzl), izl)
        octv = jnp.where(changed, _octant_vote(dxl, dyl, dzl), octv)

        @pl.when(changed)
        def _():
            _rt_scratch_write(rt_s, _mxu_rt_parts(oxl, oyl, ozl,
                                                  dxl, dyl, dzl))

        return (nxt, fuel + 1, ret, octv,
                oxl, oyl, ozl, dxl, dyl, dzl, ixl, iyl, izl, occ_f)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(-1),
            _octant_vote(wdx, wdy, wdz),
            wox, woy, woz, wdx, wdy, wdz,
            _safe_inv(wdx), _safe_inv(wdy), _safe_inv(wdz),
            jnp.zeros((msub, _LANE), jnp.float32))
    out = jax.lax.while_loop(cond, body, init)
    occ_out[:] = (out[-1] >= 1.0).astype(jnp.int32)


def _use_instmxu(scene):
    return (MXU_LEAVES and not scene.has_spheres and
            getattr(scene, "mxu_feat", None) is not None and
            getattr(scene, "inst_mxu_fuel", 0) > 0)


# ===========================================================================
# BVH8 child-testing walk (round-3 traversal candidate; walk-model
# measured 6-7.4x fewer block-synchronous steps than the threaded BVH2
# walk — docs/TPU_TRAVERSAL.md). Tables from bvh.py::collapse_bvh8:
#   child_f: (M*8, 8) f32 [min.xyz, max.xyz, kind, count] — kind >= 0 is
#            a prim-leaf start, -1 empty, <= -2 inner (BVH8 id = -2-kind)
#   order8:  (M*8, 8) i32 per-(node, octant) near-first child order
# One visit slab-tests all 8 children and records a HITMASK; subsequent
# steps advance one hit child at a time (re-culled against the improved
# t_best), descending into inner children via a STATIC-DEPTH stack of
# SCALAR loop-state registers (select-chain push/pop — no novel memory
# constructs: scalar row loads + vector math + scalar selects only).
# Default OFF (set_backend("bvh8") / MI_BVH8=1) until compiled-on-TPU
# validation, like the MXU path.
# ===========================================================================

BVH8_STACK_MARGIN = 2


def _sel8_row(row, j):
    """row (1, 8) scalar-select by traced index j (static unrolled)."""
    v = row[0, 0]
    for k in range(1, 8):
        v = jnp.where(j == k, row[0, k], v)
    return v


def _lowest_set_bit(mask):
    """Index of the lowest set bit of an 8-bit scalar mask (0 if none)."""
    j = jnp.int32(0)
    for k in range(7, -1, -1):
        j = jnp.where(((mask >> k) & 1) == 1, jnp.int32(k), j)
    return j


def _slab_row(crow, ox, oy, oz, ix, iy, iz, t_best):
    """AABB slab test of one child row [min.xyz, max.xyz, ...]."""
    t0x = (crow[0, 0] - ox) * ix
    t1x = (crow[0, 3] - ox) * ix
    t0y = (crow[0, 1] - oy) * iy
    t1y = (crow[0, 4] - oy) * iy
    t0z = (crow[0, 2] - oz) * iz
    t1z = (crow[0, 5] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return (tmin <= tmax) & (tmax > 0.0) & (tmin < t_best)


def _closest_hit_bvh8_kernel(child_f, order8, prim_f,
                             ox, oy, oz, dx, dy, dz, tmax,
                             t_out, prim_out, u_out, v_out,
                             stack_d: int, fuel_cap: int):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    octv = _octant_vote(dxv, dyv, dzv)
    msub = oxv.shape[0]
    D = stack_d

    def cond(state):
        cur, fuel = state[0], state[1]
        return (cur >= 0) & (fuel < fuel_cap)

    def body(state):
        cur, fuel, mask, fresh, sp = state[0:5]
        st_n = list(state[5:5 + D])
        st_m = list(state[5 + D:5 + 2 * D])
        t_best, best, bu, bv = state[5 + 2 * D:]

        ordrow = order8[pl.ds(cur * 8 + octv, 1), :]

        # --- fresh visit: hitmask of all 8 children (octant visit order)
        def fresh_fn(t_best):
            m = jnp.int32(0)
            for j in range(8):           # static: ordrow[0, j] directly
                s = ordrow[0, j]
                crow = child_f[pl.ds(cur * 8 + s, 1), :]
                nonempty = crow[0, 6] != -1.0
                hit = jnp.any(_slab_row(crow, oxv, oyv, ozv,
                                        ixv, iyv, izv, t_best)) & nonempty
                m = m | (hit.astype(jnp.int32) << j)
            return m

        mask = jax.lax.cond(fresh == 1, fresh_fn,
                            lambda _: mask, t_best)

        do_pop = mask == 0

        # --- advance one hit child (indices clamped when popping) -------
        j = _lowest_set_bit(mask)
        mask_cleared = mask & ~(jnp.int32(1) << j)
        s = _sel8_row(ordrow, j)
        crow = child_f[pl.ds(cur * 8 + jnp.maximum(s, 0), 1), :]
        kind = crow[0, 6]
        is_leaf_c = kind >= 0.0
        # re-cull against the t_best improved since the fresh visit
        chit = jnp.any(_slab_row(crow, oxv, oyv, ozv, ixv, iyv, izv,
                                 t_best)) & jnp.logical_not(do_pop)
        leaf_start = kind.astype(jnp.int32)
        leaf_count = crow[0, 7].astype(jnp.int32)

        def leaf_tests(args):
            t_best, best, bu, bv = args
            for k in range(LEAF_K):
                pr = prim_f[pl.ds(leaf_start + k, 1), :]
                tk, uk, vk = _prim_test(pr, oxv, oyv, ozv, dxv, dyv, dzv)
                closer = (k < leaf_count) & (tk < t_best)
                t_best = jnp.where(closer, tk, t_best)
                best = jnp.where(closer, leaf_start + k, best)
                bu = jnp.where(closer, uk, bu)
                bv = jnp.where(closer, vk, bv)
            return t_best, best, bu, bv

        t_best, best, bu, bv = jax.lax.cond(
            chit & is_leaf_c, leaf_tests, lambda a: a,
            (t_best, best, bu, bv))

        descend = chit & jnp.logical_not(is_leaf_c)
        child_id = (-2 - kind.astype(jnp.int32))

        # --- stack: select-chain push (descend) / pop (mask empty) ------
        npop = jnp.maximum(sp - 1, 0)
        pop_node = st_n[0]
        pop_mask = st_m[0]
        for k in range(1, D):
            pop_node = jnp.where(npop == k, st_n[k], pop_node)
            pop_mask = jnp.where(npop == k, st_m[k], pop_mask)
        # push only if the parent still has unvisited children — an
        # exhausted parent would be popped just to pop again (measured
        # ~25% of iterations on the gallery walk model)
        push = descend & (mask_cleared != 0)
        for k in range(D):
            at = push & (sp == k)
            st_n[k] = jnp.where(at, cur, st_n[k])
            st_m[k] = jnp.where(at, mask_cleared, st_m[k])

        ncur = jnp.where(do_pop,
                         jnp.where(sp > 0, pop_node, jnp.int32(-1)),
                         jnp.where(descend, child_id, cur))
        nmask = jnp.where(do_pop,
                          jnp.where(sp > 0, pop_mask, jnp.int32(0)),
                          jnp.where(descend, jnp.int32(0), mask_cleared))
        nfresh = jnp.where(descend, jnp.int32(1), jnp.int32(0))
        nsp = jnp.where(do_pop, npop,
                        jnp.where(push, jnp.minimum(sp + 1, D), sp))

        return tuple([ncur, fuel + 1, nmask, nfresh, nsp]
                     + st_n + st_m + [t_best, best, bu, bv])

    zi = jnp.int32(0)
    init = tuple([zi, zi, zi, jnp.int32(1), zi]
                 + [jnp.int32(-1)] * D + [zi] * D
                 + [tmax[:],
                    jnp.full((msub, _LANE), -1, jnp.int32),
                    jnp.zeros((msub, _LANE), jnp.float32),
                    jnp.zeros((msub, _LANE), jnp.float32)])
    out = jax.lax.while_loop(cond, body, init)
    t_best, best, bu, bv = out[5 + 2 * D:]
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best
    u_out[:] = bu
    v_out[:] = bv


def _any_hit_bvh8_kernel(child_f, order8, prim_f,
                         ox, oy, oz, dx, dy, dz, tmax, occ_out,
                         stack_d: int, fuel_cap: int):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmv = tmax[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    octv = _octant_vote(dxv, dyv, dzv)
    msub = oxv.shape[0]
    D = stack_d

    def cond(state):
        cur, fuel = state[0], state[1]
        occ_f = state[5 + 2 * D]
        return (cur >= 0) & (fuel < fuel_cap) & (jnp.min(occ_f) < 1.0)

    def body(state):
        cur, fuel, mask, fresh, sp = state[0:5]
        st_n = list(state[5:5 + D])
        st_m = list(state[5 + D:5 + 2 * D])
        occ_f = state[5 + 2 * D]

        ordrow = order8[pl.ds(cur * 8 + octv, 1), :]
        alive = occ_f < 1.0

        def fresh_fn(occ_f):
            m = jnp.int32(0)
            for j in range(8):
                s = ordrow[0, j]
                crow = child_f[pl.ds(cur * 8 + s, 1), :]
                nonempty = crow[0, 6] != -1.0
                hit = jnp.any(_slab_row(crow, oxv, oyv, ozv,
                                        ixv, iyv, izv, tmv)
                              & alive) & nonempty
                m = m | (hit.astype(jnp.int32) << j)
            return m

        mask = jax.lax.cond(fresh == 1, fresh_fn, lambda _: mask, occ_f)
        do_pop = mask == 0

        j = _lowest_set_bit(mask)
        mask_cleared = mask & ~(jnp.int32(1) << j)
        s = _sel8_row(ordrow, j)
        crow = child_f[pl.ds(cur * 8 + jnp.maximum(s, 0), 1), :]
        kind = crow[0, 6]
        is_leaf_c = kind >= 0.0
        chit = jnp.logical_not(do_pop)
        leaf_start = kind.astype(jnp.int32)
        leaf_count = crow[0, 7].astype(jnp.int32)

        def leaf_tests(occ_f):
            for k in range(LEAF_K):
                pr = prim_f[pl.ds(leaf_start + k, 1), :]
                tk, _, _ = _prim_test(pr, oxv, oyv, ozv, dxv, dyv, dzv)
                hit = (k < leaf_count) & jnp.isfinite(tk) & (tk <= tmv)
                occ_f = jnp.maximum(occ_f, jnp.where(hit, 1.0, 0.0))
            return occ_f

        occ_f = jax.lax.cond(chit & is_leaf_c, leaf_tests,
                             lambda o: o, occ_f)

        descend = chit & jnp.logical_not(is_leaf_c)
        child_id = (-2 - kind.astype(jnp.int32))

        npop = jnp.maximum(sp - 1, 0)
        pop_node = st_n[0]
        pop_mask = st_m[0]
        for k in range(1, D):
            pop_node = jnp.where(npop == k, st_n[k], pop_node)
            pop_mask = jnp.where(npop == k, st_m[k], pop_mask)
        # push only if the parent still has unvisited children — an
        # exhausted parent would be popped just to pop again (measured
        # ~25% of iterations on the gallery walk model)
        push = descend & (mask_cleared != 0)
        for k in range(D):
            at = push & (sp == k)
            st_n[k] = jnp.where(at, cur, st_n[k])
            st_m[k] = jnp.where(at, mask_cleared, st_m[k])

        ncur = jnp.where(do_pop,
                         jnp.where(sp > 0, pop_node, jnp.int32(-1)),
                         jnp.where(descend, child_id, cur))
        nmask = jnp.where(do_pop,
                          jnp.where(sp > 0, pop_mask, jnp.int32(0)),
                          jnp.where(descend, jnp.int32(0), mask_cleared))
        nfresh = jnp.where(descend, jnp.int32(1), jnp.int32(0))
        nsp = jnp.where(do_pop, npop,
                        jnp.where(push, jnp.minimum(sp + 1, D), sp))

        return tuple([ncur, fuel + 1, nmask, nfresh, nsp]
                     + st_n + st_m + [occ_f])

    zi = jnp.int32(0)
    init = tuple([zi, zi, zi, jnp.int32(1), zi]
                 + [jnp.int32(-1)] * D + [zi] * D
                 + [jnp.zeros((msub, _LANE), jnp.float32)])
    occ_f = jax.lax.while_loop(cond, body, init)[5 + 2 * D]
    occ_out[:] = (occ_f >= 1.0).astype(jnp.int32)


def _bvh8_tables(scene):
    _, _, _, prim_f = _pack_tables(scene)
    return scene.bvh8_child, scene.bvh8_order, prim_f


def _bvh8_meta(scene):
    M = scene.bvh8_child.shape[0] // 8
    stack_d = int(scene.bvh8_depth) + BVH8_STACK_MARGIN
    fuel_cap = 10 * M + int(scene.prim_p0.shape[0]) + 64
    return stack_d, fuel_cap


def ray_intersect_bvh8(scene, ray_o, ray_d, t_max, interpret=None):
    """Closest hit via the BVH8 child-testing walk."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    if scene.bvh8_child is None:
        raise ValueError("scene has no BVH8 tables (tiny or instanced)")
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    n_pad = max(-(-N // BLOCK) * BLOCK, BLOCK)
    n_blocks = n_pad // BLOCK
    args = [_blockify(a, n_pad) for a in (ox, oy, oz, dx, dy, dz, t_max)]
    sh = (n_pad // _LANE, _LANE)
    out_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.int32),
                  jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.float32)]
    stack_d, fuel_cap = _bvh8_meta(scene)
    kern = functools.partial(_closest_hit_bvh8_kernel,
                             stack_d=stack_d, fuel_cap=fuel_cap)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec] * 3 + [_ray_spec] * 7,
        out_specs=tuple(_ray_spec for _ in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*_bvh8_tables(scene), *args)
    t, prim, u, v = (o.reshape(n_pad)[:N] for o in outs)
    return t, prim, u, v


def ray_test_bvh8(scene, ray_o, ray_d, t_max, interpret=None):
    """Any-hit occlusion via the BVH8 child-testing walk."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    if scene.bvh8_child is None:
        raise ValueError("scene has no BVH8 tables (tiny or instanced)")
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    n_pad = max(-(-N // BLOCK) * BLOCK, BLOCK)
    n_blocks = n_pad // BLOCK
    args = [_blockify(a, n_pad) for a in (ox, oy, oz, dx, dy, dz, t_max)]
    sh = (n_pad // _LANE, _LANE)
    stack_d, fuel_cap = _bvh8_meta(scene)
    kern = functools.partial(_any_hit_bvh8_kernel,
                             stack_d=stack_d, fuel_cap=fuel_cap)
    occ = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec] * 3 + [_ray_spec] * 7,
        out_specs=(_ray_spec,),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.int32),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*_bvh8_tables(scene), *args)
    if isinstance(occ, (tuple, list)):
        occ = occ[0]
    return (occ.reshape(n_pad)[:N]) != 0


# ===========================================================================
# Composed BVH8 walk x MXU cluster leaves (docs/TPU_TRAVERSAL.md "BVH8 x
# MXU composition"): the child-testing walk runs on the BVH8 COLLAPSE OF
# THE CLUSTER-CUT TREE (bvh.py::collapse_bvh8 cut mode — descent stops at
# cluster roots), and each cluster leaf is tested as the 4-plane matmul
# over DMA-streamed feature rows. The two levers multiply: ~6-7x fewer
# walk steps than the threaded cut-tree walk (walk model) x the matmul
# leaf throughput. Child rows are (Mc*8, 16) f32 [min.xyz, max.xyz, kind,
# 0, centroid.xyz, 0*5]: kind >= 0 is a cluster SLOT BASE, -1 empty,
# <= -2 an inner BVH8 child; centroid feeds the per-visit recentring.
# prim outputs are SLOT ids (callers remap via cluster_slot_prim).
# ===========================================================================


def _closest_hit_bvh8mxu_kernel(child_f, order8, feat,
                                ox, oy, oz, dx, dy, dz, tmax,
                                t_out, prim_out, u_out, v_out,
                                feat_s, sem_feat,
                                stack_d: int, fuel_cap: int):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    octv = _octant_vote(dxv, dyv, dzv)
    msub = oxv.shape[0]
    D = stack_d
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK
    rt_parts = _mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv)

    def cond(state):
        cur, fuel = state[0], state[1]
        return (cur >= 0) & (fuel < fuel_cap)

    def body(state):
        cur, fuel, mask, fresh, sp = state[0:5]
        st_n = list(state[5:5 + D])
        st_m = list(state[5 + D:5 + 2 * D])
        t_best, best = state[5 + 2 * D:]

        ordrow = order8[pl.ds(cur * 8 + octv, 1), :]

        # --- fresh visit: hitmask of all 8 children (octant visit order)
        def fresh_fn(t_best):
            m = jnp.int32(0)
            for j in range(8):           # static: ordrow[0, j] directly
                s = ordrow[0, j]
                crow = child_f[pl.ds(cur * 8 + s, 1), :]
                nonempty = crow[0, 6] != -1.0
                hit = jnp.any(_slab_row(crow, oxv, oyv, ozv,
                                        ixv, iyv, izv, t_best)) & nonempty
                m = m | (hit.astype(jnp.int32) << j)
            return m

        mask = jax.lax.cond(fresh == 1, fresh_fn,
                            lambda _: mask, t_best)

        do_pop = mask == 0

        # --- advance one hit child (indices clamped when popping) -------
        j = _lowest_set_bit(mask)
        mask_cleared = mask & ~(jnp.int32(1) << j)
        s = _sel8_row(ordrow, j)
        crow = child_f[pl.ds(cur * 8 + jnp.maximum(s, 0), 1), :]
        kind = crow[0, 6]
        is_leaf_c = kind >= 0.0
        # DMA the advanced child's cluster columns unconditionally
        # (clamped base; non-cluster advances stream cluster 0 and drop
        # it) — START FIRST to overlap with the re-cull slab test; the
        # unconditional start/wait is the proven streaming shape.
        sb = jnp.maximum(kind.astype(jnp.int32), 0)
        dma = pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(4 * sb, 4 * CK), 4 * CK)],
            feat_s, sem_feat)
        dma.start()
        # re-cull against the t_best improved since the fresh visit
        chit = jnp.any(_slab_row(crow, oxv, oyv, ozv, ixv, iyv, izv,
                                 t_best)) & jnp.logical_not(do_pop)
        dma.wait()

        t_best, best = jax.lax.cond(
            chit & is_leaf_c,
            lambda a: _mxu_cluster_closest(feat_s, *a[:4], rt_parts,
                                           *a[4:]),
            lambda a: tuple(a[4:]),
            (sb, crow[0, 8], crow[0, 9], crow[0, 10],
             t_best, best))

        descend = chit & jnp.logical_not(is_leaf_c)
        child_id = (-2 - kind.astype(jnp.int32))

        # --- stack: select-chain push (descend) / pop (mask empty) ------
        npop = jnp.maximum(sp - 1, 0)
        pop_node = st_n[0]
        pop_mask = st_m[0]
        for k in range(1, D):
            pop_node = jnp.where(npop == k, st_n[k], pop_node)
            pop_mask = jnp.where(npop == k, st_m[k], pop_mask)
        # push only if the parent still has unvisited children
        push = descend & (mask_cleared != 0)
        for k in range(D):
            at = push & (sp == k)
            st_n[k] = jnp.where(at, cur, st_n[k])
            st_m[k] = jnp.where(at, mask_cleared, st_m[k])

        ncur = jnp.where(do_pop,
                         jnp.where(sp > 0, pop_node, jnp.int32(-1)),
                         jnp.where(descend, child_id, cur))
        nmask = jnp.where(do_pop,
                          jnp.where(sp > 0, pop_mask, jnp.int32(0)),
                          jnp.where(descend, jnp.int32(0), mask_cleared))
        nfresh = jnp.where(descend, jnp.int32(1), jnp.int32(0))
        nsp = jnp.where(do_pop, npop,
                        jnp.where(push, jnp.minimum(sp + 1, D), sp))

        return tuple([ncur, fuel + 1, nmask, nfresh, nsp]
                     + st_n + st_m + [t_best, best])

    zi = jnp.int32(0)
    init = tuple([zi, zi, zi, jnp.int32(1), zi]
                 + [jnp.int32(-1)] * D + [zi] * D
                 + [tmax[:],
                    jnp.full((msub, _LANE), -1, jnp.int32)])
    out = jax.lax.while_loop(cond, body, init)
    t_best, best = out[5 + 2 * D:]
    t_out[:] = jnp.where(best >= 0, t_best, jnp.inf)
    prim_out[:] = best
    # u/v re-solved exactly in compute_surface_interaction (see
    # _mxu_cluster_closest docstring)
    u_out[:] = jnp.zeros((msub, _LANE), jnp.float32)
    v_out[:] = jnp.zeros((msub, _LANE), jnp.float32)


def _any_hit_bvh8mxu_kernel(child_f, order8, feat,
                            ox, oy, oz, dx, dy, dz, tmax, occ_out,
                            feat_s, sem_feat,
                            stack_d: int, fuel_cap: int):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmv = tmax[:]
    ixv, iyv, izv = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    octv = _octant_vote(dxv, dyv, dzv)
    msub = oxv.shape[0]
    D = stack_d
    CK = feat_s.shape[1] // 4   # scratch is (16, 4*CK): scene-built CK
    rt_parts = _mxu_rt_parts(oxv, oyv, ozv, dxv, dyv, dzv)

    def cond(state):
        cur, fuel = state[0], state[1]
        occ_f = state[5 + 2 * D]
        return (cur >= 0) & (fuel < fuel_cap) & (jnp.min(occ_f) < 1.0)

    def body(state):
        cur, fuel, mask, fresh, sp = state[0:5]
        st_n = list(state[5:5 + D])
        st_m = list(state[5 + D:5 + 2 * D])
        occ_f = state[5 + 2 * D]

        ordrow = order8[pl.ds(cur * 8 + octv, 1), :]
        alive = occ_f < 1.0

        def fresh_fn(occ_f):
            m = jnp.int32(0)
            for j in range(8):
                s = ordrow[0, j]
                crow = child_f[pl.ds(cur * 8 + s, 1), :]
                nonempty = crow[0, 6] != -1.0
                hit = jnp.any(_slab_row(crow, oxv, oyv, ozv,
                                        ixv, iyv, izv, tmv)
                              & alive) & nonempty
                m = m | (hit.astype(jnp.int32) << j)
            return m

        mask = jax.lax.cond(fresh == 1, fresh_fn, lambda _: mask, occ_f)
        do_pop = mask == 0

        j = _lowest_set_bit(mask)
        mask_cleared = mask & ~(jnp.int32(1) << j)
        s = _sel8_row(ordrow, j)
        crow = child_f[pl.ds(cur * 8 + jnp.maximum(s, 0), 1), :]
        kind = crow[0, 6]
        is_leaf_c = kind >= 0.0
        sb = jnp.maximum(kind.astype(jnp.int32), 0)
        dma = pltpu.make_async_copy(
            feat.at[:, pl.ds(pl.multiple_of(4 * sb, 4 * CK), 4 * CK)],
            feat_s, sem_feat)
        dma.start()
        chit = jnp.logical_not(do_pop)
        dma.wait()

        occ_f = jax.lax.cond(
            chit & is_leaf_c,
            lambda a: _mxu_cluster_anyhit(feat_s, *a[:3], rt_parts,
                                          tmv, a[3]),
            lambda a: a[3],
            (crow[0, 8], crow[0, 9], crow[0, 10], occ_f))

        descend = chit & jnp.logical_not(is_leaf_c)
        child_id = (-2 - kind.astype(jnp.int32))

        npop = jnp.maximum(sp - 1, 0)
        pop_node = st_n[0]
        pop_mask = st_m[0]
        for k in range(1, D):
            pop_node = jnp.where(npop == k, st_n[k], pop_node)
            pop_mask = jnp.where(npop == k, st_m[k], pop_mask)
        push = descend & (mask_cleared != 0)
        for k in range(D):
            at = push & (sp == k)
            st_n[k] = jnp.where(at, cur, st_n[k])
            st_m[k] = jnp.where(at, mask_cleared, st_m[k])

        ncur = jnp.where(do_pop,
                         jnp.where(sp > 0, pop_node, jnp.int32(-1)),
                         jnp.where(descend, child_id, cur))
        nmask = jnp.where(do_pop,
                          jnp.where(sp > 0, pop_mask, jnp.int32(0)),
                          jnp.where(descend, jnp.int32(0), mask_cleared))
        nfresh = jnp.where(descend, jnp.int32(1), jnp.int32(0))
        nsp = jnp.where(do_pop, npop,
                        jnp.where(push, jnp.minimum(sp + 1, D), sp))

        return tuple([ncur, fuel + 1, nmask, nfresh, nsp]
                     + st_n + st_m + [occ_f])

    zi = jnp.int32(0)
    init = tuple([zi, zi, zi, jnp.int32(1), zi]
                 + [jnp.int32(-1)] * D + [zi] * D
                 + [jnp.zeros((msub, _LANE), jnp.float32)])
    occ_f = jax.lax.while_loop(cond, body, init)[5 + 2 * D]
    occ_out[:] = (occ_f >= 1.0).astype(jnp.int32)


def _bvh8mxu_meta(scene):
    Mc = scene.bvh8c_child.shape[0] // 8
    stack_d = int(scene.bvh8c_depth) + BVH8_STACK_MARGIN
    n_slots = int(scene.cluster_slot_prim.shape[0])
    fuel_cap = 10 * Mc + 2 * (n_slots // _scene_ck(scene)) + 64
    return stack_d, fuel_cap


def _bvh8mxu_guard(scene):
    if getattr(scene, "bvh8c_child", None) is None:
        raise ValueError("scene has no composed BVH8-cut tables (tiny, "
                         "instanced, or sphere-bearing scene)")


def ray_intersect_bvh8mxu(scene, ray_o, ray_d, t_max, interpret=None):
    """Closest hit via the composed BVH8 walk + MXU cluster leaves."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    _bvh8mxu_guard(scene)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    blk = MXU_BLOCK
    n_pad = max(-(-N // blk) * blk, blk)
    n_blocks = n_pad // blk
    msub = blk // _LANE
    args = [_blockify(a, n_pad) for a in (ox, oy, oz, dx, dy, dz, t_max)]
    sh = (n_pad // _LANE, _LANE)
    out_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.int32),
                  jax.ShapeDtypeStruct(sh, jnp.float32),
                  jax.ShapeDtypeStruct(sh, jnp.float32)]
    stack_d, fuel_cap = _bvh8mxu_meta(scene)
    kern = functools.partial(_closest_hit_bvh8mxu_kernel,
                             stack_d=stack_d, fuel_cap=fuel_cap)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    rs = _mxu_ray_spec(msub)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec, _tab_spec, any_spec] + [rs] * 7,
        out_specs=tuple(rs for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((16, 4 * _scene_ck(scene)),
                                       jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scene.bvh8c_child, scene.bvh8c_order, scene.mxu_feat, *args)
    t, slot, u, v = (o.reshape(n_pad)[:N] for o in outs)
    prim = jnp.where(slot >= 0,
                     scene.cluster_slot_prim[jnp.maximum(slot, 0)], -1)
    return t, prim, u, v


def ray_test_bvh8mxu(scene, ray_o, ray_d, t_max, interpret=None):
    """Any-hit occlusion via the composed BVH8 walk + MXU cluster leaves."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d = sg(scene), sg(ray_o), sg(ray_d)
    _bvh8mxu_guard(scene)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t_max = sg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                jnp.shape(oz)[:1]))
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = jnp.shape(oz)[0]
    blk = MXU_BLOCK
    n_pad = max(-(-N // blk) * blk, blk)
    n_blocks = n_pad // blk
    msub = blk // _LANE
    args = [_blockify(a, n_pad) for a in (ox, oy, oz, dx, dy, dz, t_max)]
    sh = (n_pad // _LANE, _LANE)
    stack_d, fuel_cap = _bvh8mxu_meta(scene)
    kern = functools.partial(_any_hit_bvh8mxu_kernel,
                             stack_d=stack_d, fuel_cap=fuel_cap)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    rs = _mxu_ray_spec(msub)
    occ = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[_tab_spec, _tab_spec, any_spec] + [rs] * 7,
        out_specs=(rs,),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.int32),),
        scratch_shapes=[pltpu.VMEM((16, 4 * _scene_ck(scene)),
                                       jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scene.bvh8c_child, scene.bvh8c_order, scene.mxu_feat, *args)
    if isinstance(occ, (tuple, list)):
        occ = occ[0]
    return (occ.reshape(n_pad)[:N]) != 0

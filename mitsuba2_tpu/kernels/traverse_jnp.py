"""Per-lane BVH traversal + primitive intersection in pure jnp (XLA).

The TPU big-scene acceleration path, replacing mitsuba2's kd-tree /
Embree / OptiX backends (include/mitsuba/render/kdtree.h,
src/librender/scene_optix.inl). All lanes walk a threaded (skip-link)
BVH in lockstep inside one `lax.while_loop`; each lane carries its own
node cursor, so the step count is bounded by the longest single-lane
walk within a chunk.

Design rules (all MEASURED on the axon TPU runtime, see kernels/gather.py
and the round-1 history):

1. EVERY table access is a rank-1 gather `col[idx]` from a pre-extracted
   (B,) / (P,) column. The round-1 walker gathered (B, 3) rows
   (`table[idx]` for tables > 4096 rows) — the scalar-core path at ~13 ms
   per op, which made a single traversal dispatch take minutes and look
   like a wedged device. Columns are sliced ONCE per trace, outside the
   loop.
2. ORDERED traversal: 8 per-octant threaded link tables
   (scene/bvh.py::build_octant_links) visit the near child first, so the
   running `t_best` culls far subtrees like the reference's ordered
   kd-tree descent (kdtree.h::ray_intersect_preliminary).
3. ONE prim test per step (state machine with a `rem` countdown) instead
   of an unrolled LEAF_K block: a lane is either stepping nodes or
   testing prims, never both, so the per-step gather count stays ~19
   instead of ~45.
4. CHUNKED lockstep: the wavefront is split into CHUNK-lane groups via
   `lax.map`; each group's while_loop exits at ITS OWN longest walk, so
   one pathological ray doesn't stall the whole million-lane wavefront.
   Lane order is image order (spatially coherent), which keeps walk
   lengths aligned within a chunk without any sorting.
5. FUEL-BOUNDED loops: traversal provably terminates (each node is
   visited at most once per ray), and a fuel counter in the loop
   condition makes a hang impossible even under NaN/corrupt-index
   conditions — a wedged-TPU hazard observed in round 1.

Primitive types: 0 = triangle (Möller–Trumbore, matching
Mesh::ray_intersect_triangle semantics), 1 = sphere (stable quadratic).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.bvh import LEAF_K  # noqa: F401  (re-exported; tests import it)
from . import gather as gth

PRIM_TRI = 0
PRIM_SPHERE = 1

# Lanes per lockstep group. Each group runs its own while_loop via lax.map,
# exiting at the group's longest walk. 64k lanes saturate the VPU/memory
# system while keeping groups spatially small in image order.
CHUNK = 64 * 1024


def _components(v):
    if hasattr(v, "x"):  # planar Vec3
        return v.x, v.y, v.z
    return v[..., 0], v[..., 1], v[..., 2]


def _cols3(table):
    """(M, 3) table -> three (M,) column copies (hoisted out of the loop)."""
    return table[:, 0], table[:, 1], table[:, 2]


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                           jnp.where(d >= 0, 1e-20, -1e-20), d)


class _SceneCols:
    """Loop-invariant planar columns of the BVH + prim tables."""

    def __init__(self, scene):
        self.mnx, self.mny, self.mnz = _cols3(scene.bvh_min)
        self.mxx, self.mxy, self.mxz = _cols3(scene.bvh_max)
        # leaf_start/count packed into one word: start*8 + count for
        # leaves (count <= LEAF_K = 4 fits in 3 bits), -1 for inner nodes
        # -> one gather instead of two.
        self.leafinfo = jnp.where(scene.bvh_leaf_start >= 0,
                                  scene.bvh_leaf_start * 8 +
                                  scene.bvh_leaf_count, -1)
        self.miss = scene.bvh_miss
        self.ordered = getattr(scene, "bvh_hit8", None) is not None
        if self.ordered:
            self.hit8 = scene.bvh_hit8
            self.miss8 = scene.bvh_miss8
        self.p0x, self.p0y, self.p0z = _cols3(scene.prim_p0)
        self.e1x, self.e1y, self.e1z = _cols3(scene.prim_e1)
        self.e2x, self.e2y, self.e2z = _cols3(scene.prim_e2)
        self.ptype = scene.prim_type
        self.has_spheres = scene.has_spheres
        self.n_nodes = scene.bvh_miss.shape[0]
        self.n_prims = scene.prim_p0.shape[0]
        # shared-BLAS instancing (scene.py / bvh.py::build_two_level):
        # world->local 3x4 rows as 12 planar columns + the BLAS root
        self.instanced = getattr(scene, "inst_inv", None) is not None
        if self.instanced:
            self.inv_c = tuple(scene.inst_inv[:, j] for j in range(12))
            self.blas_root = scene.inst_inv[:, 12].astype(jnp.int32)
            self.inst_fuel = scene.inst_fuel

    def to_local(self, iid, ox, oy, oz, dx, dy, dz):
        """Per-lane affine world->local: o' = A o + b, d' = A d (d stays
        UNNORMALIZED so the t parameterization is preserved under any
        affine). 12 rank-1 gathers of the instance matrix columns."""
        g = gth.scalar
        m = [g(self.inv_c[j], iid) for j in range(12)]
        olx = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        oly = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        olz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        dlx = m[0] * dx + m[1] * dy + m[2] * dz
        dly = m[4] * dx + m[5] * dy + m[6] * dz
        dlz = m[8] * dx + m[9] * dy + m[10] * dz
        return olx, oly, olz, dlx, dly, dlz

    def node_links(self, nid, oct_idx):
        """(hit, miss) continuation links for node `nid` per lane."""
        if self.ordered:
            li = nid * 8 + oct_idx
            return gth.scalar(self.hit8, li), gth.scalar(self.miss8, li)
        return nid + 1, gth.scalar(self.miss, nid)


def _slab(c, nid, ox, oy, oz, ix, iy, iz, t_best):
    """AABB slab test via six rank-1 gathers."""
    g = gth.scalar
    t0x = (g(c.mnx, nid) - ox) * ix
    t1x = (g(c.mxx, nid) - ox) * ix
    t0y = (g(c.mny, nid) - oy) * iy
    t1y = (g(c.mxy, nid) - oy) * iy
    t0z = (g(c.mnz, nid) - oz) * iz
    t1z = (g(c.mxz, nid) - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return (tmin <= tmax) & (tmax > 0.0) & (tmin < t_best)


def _prim_test(c, pidx, ox, oy, oz, dx, dy, dz, t_max):
    """Single-prim intersection via rank-1 gathers of pre-extracted
    columns. pidx: (N,) int32 (callers mask with index 0 + a predicate).
    Returns (t, u, v); t = +inf on miss or t > t_max."""
    g = gth.scalar
    p0x, p0y, p0z = g(c.p0x, pidx), g(c.p0y, pidx), g(c.p0z, pidx)
    e1x, e1y, e1z = g(c.e1x, pidx), g(c.e1y, pidx), g(c.e1z, pidx)
    e2x, e2y, e2z = g(c.e2x, pidx), g(c.e2y, pidx), g(c.e2z, pidx)

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

    if c.has_spheres:
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
        is_tri = g(c.ptype, pidx) == PRIM_TRI
        t = jnp.where(is_tri, t_tri, t_sph)
        u = jnp.where(is_tri, u, 0.0)
        v = jnp.where(is_tri, v, 0.0)
    else:
        t = t_tri

    t = jnp.where(t <= t_max, t, jnp.inf)
    return t, u, v


# ---------------------------------------------------------------------------
# Backwards-compatible packed-row API (oracle duty in tests, reparam aux)
# ---------------------------------------------------------------------------

class _ColsFromScene(_SceneCols):
    pass


def intersect_prims(prim_idx, ray_o, ray_d, scene, t_max):
    """Intersect rays against per-lane prims. Negative indices miss."""
    c = _SceneCols(scene)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    t, u, v = _prim_test(c, jnp.maximum(prim_idx, 0),
                         ox, oy, oz, dx, dy, dz, t_max)
    t = jnp.where(prim_idx >= 0, t, jnp.inf)
    return t, u, v


# ---------------------------------------------------------------------------
# Lockstep walkers
# ---------------------------------------------------------------------------

def _chunked(fn, n_lanes, arrays):
    """Run `fn` (tuple of (C,) arrays -> tuple of (C,) arrays) over the
    wavefront in CHUNK-lane groups via lax.map. Padding lanes carry
    t_max = -inf, which fails the root box test on their first step."""
    if n_lanes <= CHUNK:
        return fn(arrays)
    pad = (-n_lanes) % CHUNK
    if pad:
        def _pad(a, fill):
            return jnp.concatenate(
                [a, jnp.full((pad,), fill, a.dtype)])
        ox, oy, oz, dx, dy, dz, tm = arrays
        arrays = (_pad(ox, 0.0), _pad(oy, 0.0), _pad(oz, 0.0),
                  _pad(dx, 1.0), _pad(dy, 0.0), _pad(dz, 0.0),
                  _pad(tm, -jnp.inf))
    grouped = tuple(a.reshape(-1, CHUNK) for a in arrays)
    outs = jax.lax.map(fn, grouped)
    return tuple(o.reshape(-1)[:n_lanes] for o in outs)


def ray_intersect_preliminary(scene, ray_o, ray_d, t_max, with_steps=False):
    """Closest-hit traversal. Returns (t, prim_idx, u, v); t = inf on miss.
    With with_steps=True additionally returns each lane's chunk's lockstep
    step count (profiling aid for benchmarks/traverse_bench.py).

    DETACHED under AD: all inputs are stop_gradient'ed so the traversal's
    `lax.while_loop` never carries tangents (it cannot be transposed). This
    matches the reference's design point — OptiX intersections carry no
    gradients (SURVEY.md §3.3 "KEY LIMITATION"); geometry derivatives are
    recovered differentiably in compute_surface_interaction, and
    visibility gradients come from diff/reparam.py.
    """
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    if getattr(scene, "has_instances", False):
        # shared-BLAS scenes need the instance-aware walk; keep this
        # entry's 4-tuple contract by dropping the instance ids (callers
        # that shade must use _ray_intersect_instanced via scene.py)
        assert not with_steps, "with_steps unsupported on instanced scenes"
        return _ray_intersect_instanced(scene, ray_o, ray_d, t_max)[:4]
    c = _SceneCols(scene)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    N = jnp.shape(oz)[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    # provable upper bound on steps: every node visited and every prim
    # tested at most once per lane; the fuel makes a hang structurally
    # impossible even with corrupted indices/NaNs.
    fuel_cap = jnp.int32(c.n_nodes + c.n_prims + 64)

    def walk(arrays):
        ox, oy, oz, dx, dy, dz, tm = arrays
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        oct_idx = ((dx < 0).astype(jnp.int32)
                   | ((dy < 0).astype(jnp.int32) << 1)
                   | ((dz < 0).astype(jnp.int32) << 2))

        def cond(s):
            return s[0] & (s[-1] < fuel_cap)

        def body(s):
            _, cur, rem, pcur, t_best, best, bu, bv, fuel = s
            in_leaf = rem > 0
            node_phase = ~in_leaf & (cur >= 0)
            nid = jnp.where(node_phase, cur, 0)

            # --- node step (lanes not inside a leaf) -----------------------
            linfo = gth.scalar(c.leafinfo, nid)
            hit, miss = c.node_links(nid, oct_idx)
            box_hit = _slab(c, nid, ox, oy, oz, ix, iy, iz, t_best) \
                & node_phase
            is_leaf = linfo >= 0
            enter_leaf = box_hit & is_leaf
            descend = box_hit & ~is_leaf
            ncur = jnp.where(node_phase,
                             jnp.where(descend, hit, miss), cur)
            nrem = jnp.where(enter_leaf, linfo & 7, rem)
            npcur = jnp.where(enter_leaf, linfo >> 3, pcur)

            # --- prim step (lanes inside a leaf; disjoint from node step) --
            pidx = jnp.where(in_leaf, pcur, 0)
            tk, uk, vk = _prim_test(c, pidx, ox, oy, oz, dx, dy, dz, t_best)
            closer = in_leaf & (tk < t_best)
            t_best = jnp.where(closer, tk, t_best)
            best = jnp.where(closer, pidx, best)
            bu = jnp.where(closer, uk, bu)
            bv = jnp.where(closer, vk, bv)
            nrem = jnp.where(in_leaf, rem - 1, nrem)
            npcur = jnp.where(in_leaf, pcur + 1, npcur)

            alive = jnp.any((ncur >= 0) | (nrem > 0))
            return (alive, ncur, nrem, npcur, t_best, best, bu, bv,
                    fuel + 1)

        n = ox.shape[0]
        init = (jnp.asarray(True), jnp.zeros(n, jnp.int32),
                jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
                tm.astype(jnp.float32), jnp.full(n, -1, jnp.int32),
                jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
                jnp.int32(0))
        out = jax.lax.while_loop(cond, body, init)
        _, _, _, _, t_best, best, bu, bv, fuel = out
        return (jnp.where(best >= 0, t_best, jnp.inf), best, bu, bv,
                jnp.broadcast_to(fuel, (ox.shape[0],)))

    res = _chunked(walk, N, (ox, oy, oz, dx, dy, dz, t_max))
    if with_steps:
        return res
    return res[:4]


def ray_test(scene, ray_o, ray_d, t_max) -> jnp.ndarray:
    """Any-hit (shadow) traversal with per-lane early termination.

    Uses the canonical (unordered) skip links — visit order is irrelevant
    for an occlusion query. Detached under AD like
    ray_intersect_preliminary (boolean output anyway)."""
    sg = jax.lax.stop_gradient
    scene, ray_o, ray_d, t_max = sg(scene), sg(ray_o), sg(ray_d), sg(t_max)
    if getattr(scene, "has_instances", False):
        return _ray_test_instanced(scene, ray_o, ray_d, t_max)
    c = _SceneCols(scene)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    N = jnp.shape(oz)[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    fuel_cap = jnp.int32(c.n_nodes + c.n_prims + 64)

    def walk(arrays):
        ox, oy, oz, dx, dy, dz, tm = arrays
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

        def cond(s):
            return s[0] & (s[-1] < fuel_cap)

        def body(s):
            _, cur, rem, pcur, occ, fuel = s
            in_leaf = rem > 0
            node_phase = ~in_leaf & (cur >= 0) & ~occ
            nid = jnp.where(node_phase, cur, 0)

            linfo = gth.scalar(c.leafinfo, nid)
            miss = gth.scalar(c.miss, nid)
            box_hit = _slab(c, nid, ox, oy, oz, ix, iy, iz, tm) & node_phase
            is_leaf = linfo >= 0
            enter_leaf = box_hit & is_leaf
            descend = box_hit & ~is_leaf
            ncur = jnp.where(node_phase,
                             jnp.where(descend, nid + 1, miss), cur)
            nrem = jnp.where(enter_leaf, linfo & 7, rem)
            npcur = jnp.where(enter_leaf, linfo >> 3, pcur)

            test = in_leaf & ~occ
            pidx = jnp.where(test, pcur, 0)
            tk, _, _ = _prim_test(c, pidx, ox, oy, oz, dx, dy, dz, tm)
            occ = occ | (test & jnp.isfinite(tk))
            nrem = jnp.where(in_leaf, rem - 1, nrem)
            npcur = jnp.where(in_leaf, pcur + 1, npcur)
            nrem = jnp.where(occ, 0, nrem)

            alive = jnp.any(~occ & ((ncur >= 0) | (nrem > 0)))
            return alive, ncur, nrem, npcur, occ, fuel + 1

        n = ox.shape[0]
        init = (jnp.asarray(True), jnp.zeros(n, jnp.int32),
                jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
                jnp.zeros(n, bool), jnp.int32(0))
        occ = jax.lax.while_loop(cond, body, init)[4]
        return (occ,)

    return _chunked(walk, N, (ox, oy, oz, dx, dy, dz, t_max))[0]


# ---------------------------------------------------------------------------
# Shared-BLAS instanced walkers (scene built with shapes.Instance;
# bvh.py::build_two_level). Same per-lane state machine as above plus:
#   - a saved TLAS continuation `ret` (instancing is one level deep, so a
#     single slot replaces a stack — the BLAS_EXIT (-2) link pops it);
#   - CURRENT-SPACE ray components carried as loop state: entering an
#     instance leaf re-derives (o, d) from the ORIGINAL world ray via the
#     instance's world->local affine (no drift: always from world), with
#     d unnormalized so `t` is preserved; popping restores the world ray;
#   - the per-lane direction octant recomputed from the current d signs
#     (an instance rotation can flip octants);
#   - the winning instance id `binst` tracked alongside `best`.
# ---------------------------------------------------------------------------

BLAS_EXIT = -2


def _ray_intersect_instanced(scene, ray_o, ray_d, t_max):
    c = _SceneCols(scene)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    N = jnp.shape(oz)[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    fuel_cap = jnp.int32(c.inst_fuel * (1 + LEAF_K) + 64)

    def walk(arrays):
        wox, woy, woz, wdx, wdy, wdz, tm = arrays

        def cond(s):
            return s[0] & (s[-1] < fuel_cap)

        def body(s):
            (_, cur, rem, pcur, ret, cinst,
             oxl, oyl, ozl, dxl, dyl, dzl,
             t_best, best, bu, bv, binst, fuel) = s
            in_leaf = rem > 0

            # --- pop: BLAS exhausted -> resume the saved TLAS node in
            # world space (same step continues into the node phase)
            pop = ~in_leaf & (cur == BLAS_EXIT)
            cur = jnp.where(pop, ret, cur)
            ret = jnp.where(pop, -1, ret)
            cinst = jnp.where(pop, -1, cinst)
            oxl = jnp.where(pop, wox, oxl)
            oyl = jnp.where(pop, woy, oyl)
            ozl = jnp.where(pop, woz, ozl)
            dxl = jnp.where(pop, wdx, dxl)
            dyl = jnp.where(pop, wdy, dyl)
            dzl = jnp.where(pop, wdz, dzl)

            ixl, iyl, izl = _safe_inv(dxl), _safe_inv(dyl), _safe_inv(dzl)
            oct_idx = ((dxl < 0).astype(jnp.int32)
                       | ((dyl < 0).astype(jnp.int32) << 1)
                       | ((dzl < 0).astype(jnp.int32) << 2))

            node_phase = ~in_leaf & (cur >= 0)
            nid = jnp.where(node_phase, cur, 0)

            linfo = gth.scalar(c.leafinfo, nid)
            hit, miss = c.node_links(nid, oct_idx)
            box_hit = _slab(c, nid, oxl, oyl, ozl, ixl, iyl, izl, t_best) \
                & node_phase
            is_leaf = linfo >= 0
            # instance leaves are tagged by leaf_count == 0 (real prim
            # leaves always hold >= 1 prim); linfo >> 3 = instance id
            is_inst = is_leaf & ((linfo & 7) == 0)
            enter_inst = box_hit & is_inst
            enter_leaf = box_hit & is_leaf & ~is_inst
            descend = box_hit & ~is_leaf

            # instance entry: re-derive the CURRENT-space ray from world
            iid = jnp.where(enter_inst, linfo >> 3, 0)
            tlx, tly, tlz, tdx, tdy, tdz = c.to_local(
                iid, wox, woy, woz, wdx, wdy, wdz)
            oxl = jnp.where(enter_inst, tlx, oxl)
            oyl = jnp.where(enter_inst, tly, oyl)
            ozl = jnp.where(enter_inst, tlz, ozl)
            dxl = jnp.where(enter_inst, tdx, dxl)
            dyl = jnp.where(enter_inst, tdy, dyl)
            dzl = jnp.where(enter_inst, tdz, dzl)
            ret = jnp.where(enter_inst, miss, ret)
            cinst = jnp.where(enter_inst, iid, cinst)
            blas = gth.scalar(c.blas_root, iid)

            ncur = jnp.where(node_phase,
                             jnp.where(enter_inst, blas,
                                       jnp.where(descend, hit, miss)), cur)
            nrem = jnp.where(enter_leaf, linfo & 7, rem)
            npcur = jnp.where(enter_leaf, linfo >> 3, pcur)

            # --- prim step (current-space rays; prims are local-space) --
            pidx = jnp.where(in_leaf, pcur, 0)
            tk, uk, vk = _prim_test(c, pidx, oxl, oyl, ozl,
                                    dxl, dyl, dzl, t_best)
            closer = in_leaf & (tk < t_best)
            t_best = jnp.where(closer, tk, t_best)
            best = jnp.where(closer, pidx, best)
            bu = jnp.where(closer, uk, bu)
            bv = jnp.where(closer, vk, bv)
            binst = jnp.where(closer, cinst, binst)
            nrem = jnp.where(in_leaf, rem - 1, nrem)
            npcur = jnp.where(in_leaf, pcur + 1, npcur)

            alive = jnp.any((ncur >= 0) | (ncur == BLAS_EXIT) | (nrem > 0))
            return (alive, ncur, nrem, npcur, ret, cinst,
                    oxl, oyl, ozl, dxl, dyl, dzl,
                    t_best, best, bu, bv, binst, fuel + 1)

        n = wox.shape[0]
        zi = jnp.zeros(n, jnp.int32)
        init = (jnp.asarray(True), zi, zi, zi,
                jnp.full(n, -1, jnp.int32), jnp.full(n, -1, jnp.int32),
                wox, woy, woz, wdx, wdy, wdz,
                tm.astype(jnp.float32), jnp.full(n, -1, jnp.int32),
                jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
                jnp.full(n, -1, jnp.int32), jnp.int32(0))
        out = jax.lax.while_loop(cond, body, init)
        t_best, best, bu, bv, binst = out[12], out[13], out[14], out[15], out[16]
        return (jnp.where(best >= 0, t_best, jnp.inf), best, bu, bv, binst)

    return _chunked(walk, N, (ox, oy, oz, dx, dy, dz, t_max))


def _ray_test_instanced(scene, ray_o, ray_d, t_max):
    c = _SceneCols(scene)
    ox, oy, oz = _components(ray_o)
    dx, dy, dz = _components(ray_d)
    N = jnp.shape(oz)[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    fuel_cap = jnp.int32(c.inst_fuel * (1 + LEAF_K) + 64)

    def walk(arrays):
        wox, woy, woz, wdx, wdy, wdz, tm = arrays

        def cond(s):
            return s[0] & (s[-1] < fuel_cap)

        def body(s):
            (_, cur, rem, pcur, ret, cinst,
             oxl, oyl, ozl, dxl, dyl, dzl, occ, fuel) = s
            in_leaf = rem > 0

            pop = ~in_leaf & (cur == BLAS_EXIT)
            cur = jnp.where(pop, ret, cur)
            ret = jnp.where(pop, -1, ret)
            cinst = jnp.where(pop, -1, cinst)
            oxl = jnp.where(pop, wox, oxl)
            oyl = jnp.where(pop, woy, oyl)
            ozl = jnp.where(pop, woz, ozl)
            dxl = jnp.where(pop, wdx, dxl)
            dyl = jnp.where(pop, wdy, dyl)
            dzl = jnp.where(pop, wdz, dzl)
            ixl, iyl, izl = _safe_inv(dxl), _safe_inv(dyl), _safe_inv(dzl)

            node_phase = ~in_leaf & (cur >= 0) & ~occ
            nid = jnp.where(node_phase, cur, 0)

            linfo = gth.scalar(c.leafinfo, nid)
            miss = gth.scalar(c.miss, nid)
            box_hit = _slab(c, nid, oxl, oyl, ozl, ixl, iyl, izl, tm) \
                & node_phase
            is_leaf = linfo >= 0
            is_inst = is_leaf & ((linfo & 7) == 0)
            enter_inst = box_hit & is_inst
            enter_leaf = box_hit & is_leaf & ~is_inst
            descend = box_hit & ~is_leaf

            iid = jnp.where(enter_inst, linfo >> 3, 0)
            tlx, tly, tlz, tdx, tdy, tdz = c.to_local(
                iid, wox, woy, woz, wdx, wdy, wdz)
            oxl = jnp.where(enter_inst, tlx, oxl)
            oyl = jnp.where(enter_inst, tly, oyl)
            ozl = jnp.where(enter_inst, tlz, ozl)
            dxl = jnp.where(enter_inst, tdx, dxl)
            dyl = jnp.where(enter_inst, tdy, dyl)
            dzl = jnp.where(enter_inst, tdz, dzl)
            ret = jnp.where(enter_inst, miss, ret)
            cinst = jnp.where(enter_inst, iid, cinst)
            blas = gth.scalar(c.blas_root, iid)

            ncur = jnp.where(node_phase,
                             jnp.where(enter_inst, blas,
                                       jnp.where(descend, nid + 1, miss)),
                             cur)
            nrem = jnp.where(enter_leaf, linfo & 7, rem)
            npcur = jnp.where(enter_leaf, linfo >> 3, pcur)

            test = in_leaf & ~occ
            pidx = jnp.where(test, pcur, 0)
            tk, _, _ = _prim_test(c, pidx, oxl, oyl, ozl,
                                  dxl, dyl, dzl, tm)
            occ = occ | (test & jnp.isfinite(tk))
            nrem = jnp.where(in_leaf, rem - 1, nrem)
            npcur = jnp.where(in_leaf, pcur + 1, npcur)
            nrem = jnp.where(occ, 0, nrem)

            alive = jnp.any(~occ & ((ncur >= 0) | (ncur == BLAS_EXIT)
                                    | (nrem > 0)))
            return (alive, ncur, nrem, npcur, ret, cinst,
                    oxl, oyl, ozl, dxl, dyl, dzl, occ, fuel + 1)

        n = wox.shape[0]
        zi = jnp.zeros(n, jnp.int32)
        init = (jnp.asarray(True), zi, zi, zi,
                jnp.full(n, -1, jnp.int32), jnp.full(n, -1, jnp.int32),
                wox, woy, woz, wdx, wdy, wdz,
                jnp.zeros(n, bool), jnp.int32(0))
        occ = jax.lax.while_loop(cond, body, init)[12]
        return (occ,)

    return _chunked(walk, N, (ox, oy, oz, dx, dy, dz, t_max))[0]

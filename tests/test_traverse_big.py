"""Ordered (octant-linked) traversal correctness on a BVH-deep scene.

Oracle laddering (SURVEY.md §4): the brute-force all-prims intersector is
the oracle for the threaded walker on a scene large enough that the walker
actually exercises deep descents, leaf streaks, and the per-octant link
tables; chunked lockstep (lax.map groups) is validated against the
unchunked path by shrinking CHUNK below the wavefront size.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba2_tpu.kernels import brute, traverse_jnp
from mitsuba2_tpu.scene import bvh as bvh_mod
from mitsuba2_tpu.scene.presets import mesh_gallery


@pytest.fixture(scope="module")
def small_gallery():
    # subdiv=2 -> 6*320 blob tris + room = ~1.9k prims: big enough for
    # real BVH depth, small enough for the brute oracle.
    return mesh_gallery(subdiv=2)


def _random_rays(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh_min)[0]
    hi = np.asarray(scene.bvh_max)[0]
    o = rng.uniform(lo - 0.2, hi + 0.2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_ordered_walker_matches_brute(small_gallery):
    scene = small_gallery
    assert scene.bvh_hit8 is not None
    o, d = _random_rays(scene, 4096)
    t_max = jnp.inf
    t1, p1, u1, v1 = traverse_jnp.ray_intersect_preliminary(scene, o, d, t_max)
    t2, p2, u2, v2 = brute.ray_intersect_brute(scene, o, d, t_max)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    hit1, hit2 = np.isfinite(t1), np.isfinite(t2)
    assert (hit1 == hit2).all()
    np.testing.assert_allclose(t1[hit1], t2[hit2], rtol=1e-4, atol=1e-5)
    # barycentrics must agree wherever the same prim won (ties can differ)
    same = hit1 & (np.asarray(p1) == np.asarray(p2))
    assert same.sum() > 0.98 * hit1.sum()
    np.testing.assert_allclose(np.asarray(u1)[same], np.asarray(u2)[same],
                               rtol=1e-3, atol=1e-4)


def test_unordered_fallback_matches(small_gallery):
    scene = small_gallery
    o, d = _random_rays(scene, 2048, seed=1)
    t1, p1, _, _ = traverse_jnp.ray_intersect_preliminary(scene, o, d, jnp.inf)
    legacy = scene.replace(bvh_hit8=None, bvh_miss8=None)
    t2, p2, _, _ = traverse_jnp.ray_intersect_preliminary(legacy, o, d, jnp.inf)
    np.testing.assert_allclose(np.where(np.isfinite(t1), t1, 0.0),
                               np.where(np.isfinite(t2), t2, 0.0),
                               rtol=1e-4, atol=1e-5)


def test_chunked_matches_unchunked(small_gallery, monkeypatch):
    scene = small_gallery
    o, d = _random_rays(scene, 3000, seed=2)  # non-multiple of chunk size
    t_ref, p_ref, _, _ = traverse_jnp.ray_intersect_preliminary(
        scene, o, d, jnp.inf)
    occ_ref = traverse_jnp.ray_test(scene, o, d, 2.0)
    monkeypatch.setattr(traverse_jnp, "CHUNK", 1024)
    t_c, p_c, _, _ = traverse_jnp.ray_intersect_preliminary(scene, o, d, jnp.inf)
    occ_c = traverse_jnp.ray_test(scene, o, d, 2.0)
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_c))
    np.testing.assert_allclose(np.where(np.isfinite(t_ref), t_ref, 0.0),
                               np.where(np.isfinite(t_c), t_c, 0.0),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_c))


def test_ray_test_matches_brute(small_gallery):
    scene = small_gallery
    o, d = _random_rays(scene, 4096, seed=3)
    for t_max in (jnp.inf, 1.0):
        occ = traverse_jnp.ray_test(scene, o, d, t_max)
        occ_ref = brute.ray_test_brute(scene, o, d, t_max)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_sorted_pallas_wrapper_matches(small_gallery):
    """The Morton/octant presort wrapper (scene.py::_sorted_pallas_intersect)
    must return results in original lane order, equal to the oracle."""
    from mitsuba2_tpu.scene import scene as scene_mod
    from mitsuba2_tpu.core.vec import Vec3
    scene = small_gallery
    o, d = _random_rays(scene, 4096, seed=7)
    ov = Vec3(o[:, 0], o[:, 1], o[:, 2])
    dv = Vec3(d[:, 0], d[:, 1], d[:, 2])
    t_s, p_s, u_s, v_s = scene_mod._sorted_pallas_intersect(
        scene, ov, dv, jnp.inf)
    t_r, p_r, u_r, v_r = traverse_jnp.ray_intersect_preliminary(
        scene, ov, dv, jnp.inf)
    hit_s, hit_r = np.isfinite(t_s), np.isfinite(t_r)
    np.testing.assert_array_equal(np.asarray(hit_s), np.asarray(hit_r))
    np.testing.assert_allclose(np.asarray(t_s)[np.asarray(hit_s)],
                               np.asarray(t_r)[np.asarray(hit_r)],
                               rtol=1e-4, atol=1e-5)


def test_octant_links_structure(small_gallery):
    """Every octant's threaded order is a permutation reaching all nodes,
    and leaf hit links equal their miss links."""
    scene = small_gallery
    hit8 = np.asarray(scene.bvh_hit8).reshape(-1, 8)
    miss8 = np.asarray(scene.bvh_miss8).reshape(-1, 8)
    leaf = np.asarray(scene.bvh_leaf_start) >= 0
    n = hit8.shape[0]
    assert (hit8[leaf] == miss8[leaf]).all()
    for o in range(8):
        # walk hit links only (visit everything): node -> hit child or,
        # at leaves, the continuation; must visit each node exactly once
        seen = np.zeros(n, bool)
        cur, steps = 0, 0
        while cur != -1 and steps <= n:
            assert not seen[cur]
            seen[cur] = True
            cur = int(hit8[cur, o])
            steps += 1
        assert seen.all(), f"octant {o} order misses nodes"


def test_children_recovery(small_gallery):
    scene = small_gallery
    tree = bvh_mod.BVH(
        bounds_min=np.asarray(scene.bvh_min),
        bounds_max=np.asarray(scene.bvh_max),
        leaf_start=np.asarray(scene.bvh_leaf_start),
        leaf_count=np.asarray(scene.bvh_leaf_count),
        miss=np.asarray(scene.bvh_miss),
        prim_order=np.arange(scene.n_prims, dtype=np.int32))
    left, right = bvh_mod.children(tree)
    inner = tree.leaf_start < 0
    # children of inner nodes are contained in the parent box
    for arr in (left[inner], right[inner]):
        assert (arr >= 0).all() and (arr < len(tree.miss)).all()
    assert (tree.bounds_min[inner] <= tree.bounds_min[left[inner]] + 1e-6).all()
    assert (tree.bounds_max[inner] >= tree.bounds_max[right[inner]] - 1e-6).all()


def test_mxu_cut_tree_matches_brute(small_gallery):
    """MXU cluster path (pruned cut-tree walk + feature-plane matmuls,
    interpret mode) against the brute-force oracle on the ~1.9k-prim
    gallery — full ladder: brute -> jnp walker -> scalar Pallas -> MXU."""
    from mitsuba2_tpu.kernels import traverse_pallas as tp
    scene = small_gallery
    o, d = _random_rays(scene, 4096, seed=11)
    tb, pb, _, _ = brute.ray_intersect_brute(scene, o, d, jnp.inf)
    old = tp.MXU_LEAVES
    try:
        tp.MXU_LEAVES = True
        tm, pm, _, _ = tp.ray_intersect_preliminary(
            scene, o, d, jnp.full(4096, jnp.inf), interpret=True)
    finally:
        tp.MXU_LEAVES = old
    tb, tm = np.asarray(tb), np.asarray(tm)
    hb, hm = np.isfinite(tb), np.isfinite(tm)
    np.testing.assert_array_equal(hb, hm)
    # tolerance budget == the plane-form envelope documented in
    # test_traverse_pallas (rtol 1e-3: ~4e-4 rel on near-degenerate
    # hits is the f32 plane-vs-edge-form floor). With the per-cluster
    # recentring (scene.py RECENTRING note) the bf16-split x3 path
    # measures max 3.1e-4 / p99 2.1e-5 on this scene+seed — the round-2
    # 2.3e-3 outliers were raw-origin cancellation, root-caused + fixed.
    np.testing.assert_allclose(tm[hm], tb[hb], rtol=1e-3, atol=1e-5)
    rel = np.abs(tm[hm] - tb[hb]) / np.maximum(np.abs(tb[hb]), 1e-9)
    assert np.percentile(rel, 99) < 1e-4, "bulk precision regressed"
    same = np.asarray(pb) == np.asarray(pm)
    assert same[hb].mean() > 0.99  # equidistant ties only

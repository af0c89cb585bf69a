"""Pallas packet-traversal kernel vs the pure-jnp oracle (SURVEY.md §4
oracle laddering: interpret-mode Pallas = CPU CI for TPU kernels)."""
import jax.numpy as jnp
import numpy as np

from mitsuba2_tpu.kernels import traverse_jnp, traverse_pallas
from mitsuba2_tpu.scene.presets import cornell_box, furnace


def random_rays(n, seed=0, spread=1.4):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.2, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_closest_hit_matches_oracle_cbox(monkeypatch):
    # scalar-leaf packet kernel vs the jnp oracle at the scalar path's
    # tight tolerance; the MXU-leaf path (default since the 2026-08-19
    # hardware validation) has its own equivalence tests below with the
    # x3-precision tolerance budget
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", False)
    scene = cornell_box()
    o, d = random_rays(2048)
    t_max = jnp.full(2048, jnp.inf)
    t_p, p_p, u_p, v_p = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    t_j, p_j, u_j, v_j = traverse_jnp.ray_intersect_preliminary(
        scene, o, d, t_max)
    t_p, t_j = np.asarray(t_p), np.asarray(t_j)
    hit_p, hit_j = np.isfinite(t_p), np.isfinite(t_j)
    np.testing.assert_array_equal(hit_p, hit_j)
    np.testing.assert_allclose(t_p[hit_p], t_j[hit_j], rtol=1e-4, atol=1e-5)
    # prim ids equal except equidistant ties (quad diagonals); the tie
    # rate shifts with MI_PACKET_BLOCK (block-majority octant changes
    # the link walk order), so the guard allows 1%
    same = np.asarray(p_p) == np.asarray(p_j)
    assert same[hit_p].mean() > 0.99
    # wherever prim ids differ the hit distances must still agree (ties)
    tie = hit_p & ~same
    np.testing.assert_allclose(t_p[tie], t_j[tie], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_p)[same & hit_p],
                               np.asarray(u_j)[same & hit_p],
                               rtol=1e-3, atol=1e-4)


def test_closest_hit_matches_oracle_sphere():
    scene = furnace()
    o, d = random_rays(1024, seed=3, spread=2.0)
    t_max = jnp.full(1024, jnp.inf)
    t_p, _, _, _ = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    t_j, _, _, _ = traverse_jnp.ray_intersect_preliminary(scene, o, d, t_max)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_j),
                               rtol=1e-4, atol=1e-5)


def test_any_hit_matches_oracle():
    scene = cornell_box()
    o, d = random_rays(2048, seed=1)
    for maxt in (jnp.full(2048, jnp.inf), jnp.full(2048, 0.3)):
        occ_p = traverse_pallas.ray_test(scene, o, d, maxt, interpret=True)
        occ_j = traverse_jnp.ray_test(scene, o, d, maxt)
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_j))


def test_mxu_leaf_path_matches_scalar_kernel(monkeypatch):
    """The MXU cluster-leaf kernel (Möller–Trumbore as 4 feature-plane
    matmuls over CLUSTER_K-prim BVH cuts) must agree with the scalar
    streaming kernel on a triangle-only scene, whatever MXU_LEAVES
    defaults to."""
    from mitsuba2_tpu.scene.presets import mesh_gallery
    scene = mesh_gallery(subdiv=1)
    assert not scene.has_spheres and scene.cluster_slot_prim is not None
    o, d = random_rays(2048, seed=5, spread=2.5)
    t_max = jnp.full(2048, jnp.inf)

    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", False)
    t_s, p_s, u_s, v_s = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)
    t_m, p_m, u_m, v_m = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)

    t_s, t_m = np.asarray(t_s), np.asarray(t_m)
    hit_s, hit_m = np.isfinite(t_s), np.isfinite(t_m)
    np.testing.assert_array_equal(hit_s, hit_m)
    # rtol 1e-3: the default x3 precision mode (manual bf16 3-pass dot)
    # has a ~2^-17 noise floor, and the plane formulation itself sits at
    # ~4e-4 rel vs edge-based MT on near-degenerate hits (hw-measured
    # at HIGHEST too — benchmarks/mxu_hw_check.py)
    np.testing.assert_allclose(t_m[hit_m], t_s[hit_s], rtol=1e-3, atol=1e-5)
    same = np.asarray(p_m) == np.asarray(p_s)
    assert same[hit_s].mean() > 0.995        # equidistant ties only
    np.testing.assert_allclose(t_m[hit_s & ~same], t_s[hit_s & ~same],
                               rtol=1e-3, atol=1e-5)
    # The MXU kernels no longer track barycentric winners (u_out == 0);
    # compute_surface_interaction re-solves exact f32 Möller–Trumbore
    # from the gathered verts. Check uv/t THROUGH that stage: both paths
    # must produce matching shading records wherever the same prim won.
    from mitsuba2_tpu.core.vec import Vec2, Vec3
    from mitsuba2_tpu.core.geometry import Ray
    from mitsuba2_tpu.render.interaction import PreliminaryIntersection
    from mitsuba2_tpu.scene.scene import compute_surface_interaction

    def si_of(t, p, uu, vv):
        ray = Ray.make(o, d)
        pi = PreliminaryIntersection(t=t, prim_index=p,
                                     prim_uv=Vec2(uu, vv))
        return compute_surface_interaction(scene, ray, pi)

    si_s = si_of(*map(jnp.asarray, (t_s, p_s, u_s, v_s)))
    si_m = si_of(*map(jnp.asarray, (t_m, p_m, u_m, v_m)))
    sel = same & hit_s
    np.testing.assert_allclose(np.asarray(si_m.uv.x)[sel],
                               np.asarray(si_s.uv.x)[sel],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(si_m.t)[sel],
                               np.asarray(si_s.t)[sel],
                               rtol=1e-5, atol=1e-6)


def test_mxu_any_hit_matches_scalar_kernel(monkeypatch):
    """Occlusion (any-hit) MXU cluster kernel vs the scalar streaming
    kernel, finite and infinite t_max."""
    from mitsuba2_tpu.scene.presets import mesh_gallery
    scene = mesh_gallery(subdiv=1)
    o, d = random_rays(2048, seed=7, spread=2.5)
    for maxt in (jnp.full(2048, jnp.inf), jnp.full(2048, 0.4)):
        monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", False)
        occ_s = traverse_pallas.ray_test(scene, o, d, maxt, interpret=True)
        monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)
        occ_m = traverse_pallas.ray_test(scene, o, d, maxt, interpret=True)
        np.testing.assert_array_equal(np.asarray(occ_m), np.asarray(occ_s))


def test_non_multiple_block_sizes():
    scene = cornell_box()
    o, d = random_rays(777, seed=2)
    t_max = jnp.full(777, jnp.inf)
    t_p, _, _, _ = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    t_j, _, _, _ = traverse_jnp.ray_intersect_preliminary(scene, o, d, t_max)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_j),
                               rtol=1e-4, atol=1e-5)


def test_refresh_mxu_feat_tracks_geometry(monkeypatch):
    """scene.replace on vertex tables + refresh_mxu_feat must reproduce
    the host-built feature table; without the refresh the MXU path would
    intersect stale geometry (derived-rebuild contract)."""
    from mitsuba2_tpu.scene.presets import mesh_gallery
    from mitsuba2_tpu.scene.scene import refresh_mxu_feat
    scene = mesh_gallery(subdiv=1)
    # identity update: refreshed table == host-built table
    ref = refresh_mxu_feat(scene)
    # atol covers f32 summation-order drift in the per-cluster centroid
    # mean (grows with CLUSTER_K; ~9e-6 at the swept CK=512)
    np.testing.assert_allclose(np.asarray(ref.mxu_feat),
                               np.asarray(scene.mxu_feat),
                               rtol=1e-5, atol=2e-5)
    # real update: shift all vertices; the refreshed table must equal an
    # independent numpy evaluation of the plane formulas on the MOVED
    # geometry. (Kernel-level equivalence under large shifts is out of
    # contract: BVH *bounds* are not refit by scene.replace, and stale
    # boxes cull the full tree and the cut-tree differently.)
    shift = jnp.asarray([0.0, 0.3, 0.0])
    moved = refresh_mxu_feat(scene.replace(prim_p0=scene.prim_p0 + shift))
    sp = np.asarray(scene.cluster_slot_prim)
    valid = (sp >= 0)[:, None].astype(np.float32)
    p0 = (np.asarray(scene.prim_p0) + np.asarray(shift))[np.maximum(sp, 0)]
    e1 = np.asarray(scene.prim_e1)[np.maximum(sp, 0)] * valid
    e2 = np.asarray(scene.prim_e2)[np.maximum(sp, 0)] * valid
    p0 = p0 * valid
    S = sp.shape[0]
    CK = traverse_pallas.CLUSTER_K
    C = S // CK
    # planes are RECENTRED about the per-cluster centroid of the MOVED
    # geometry (scene.py RECENTRING note) — mirror it here
    vcnt = np.maximum(valid.reshape(C, CK).sum(1), 1.0)
    cl_c = p0.reshape(C, CK, 3).sum(1) / vcnt[:, None]
    p0 = p0 - np.repeat(cl_c, CK, 0) * valid
    n = np.cross(e1, e2)
    exp = np.zeros((C, 4, CK, 16), np.float32)
    exp[:, 0, :, 0:3] = -n.reshape(C, CK, 3)
    exp[:, 1, :, 0:3] = np.cross(p0, e2).reshape(C, CK, 3)
    exp[:, 1, :, 3:6] = e2.reshape(C, CK, 3)
    exp[:, 2, :, 0:3] = -np.cross(p0, e1).reshape(C, CK, 3)
    exp[:, 2, :, 3:6] = -e1.reshape(C, CK, 3)
    exp[:, 3, :, 6:9] = n.reshape(C, CK, 3)
    exp[:, 3, :, 9] = -np.sum(p0 * n, -1).reshape(C, CK)
    np.testing.assert_allclose(np.asarray(moved.mxu_feat),
                               exp.reshape(4 * S, 16).T, rtol=1e-5,
                               atol=1e-5)


def test_mxu_flag_sphere_scene_falls_back(monkeypatch):
    """Spheres are inexpressible as the MT bilinear form: with
    MXU_LEAVES=True a sphere scene must still dispatch the scalar kernel
    and match the oracle (the dispatch guard, not the kernel)."""
    scene = furnace()
    assert scene.has_spheres
    o, d = random_rays(512, seed=13, spread=2.0)
    t_max = jnp.full(512, jnp.inf)
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)
    t_p, _, _, _ = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    t_j, _, _, _ = traverse_jnp.ray_intersect_preliminary(scene, o, d, t_max)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_j),
                               rtol=1e-4, atol=1e-5)


def test_mxu_dual_walk_matches_single(monkeypatch):
    """The dual-walk MXU kernels (MI_MXU_WALKS=2: two interleaved block
    walks riding one while-loop scalar floor) must reproduce the
    single-walk kernels bit-for-bit — same blocks, same per-block walks,
    only the loop interleaving differs."""
    from mitsuba2_tpu.scene.presets import mesh_gallery
    scene = mesh_gallery(subdiv=1)
    n = traverse_pallas.MXU_BLOCK + 2048   # forces walks=2 (+ padding)
    o, d = random_rays(n, seed=11, spread=2.5)
    t_max = jnp.full(n, jnp.inf)
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)

    monkeypatch.setattr(traverse_pallas, "MXU_WALKS", 1)
    t1, p1, _, _ = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    occ1 = traverse_pallas.ray_test(scene, o, d, jnp.full(n, 0.7),
                                    interpret=True)
    monkeypatch.setattr(traverse_pallas, "MXU_WALKS", 2)
    t2, p2, _, _ = traverse_pallas.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    occ2 = traverse_pallas.ray_test(scene, o, d, jnp.full(n, 0.7),
                                    interpret=True)

    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))


def test_mxu_unroll_matches_single_step(monkeypatch):
    """MI_MXU_UNROLL>1 (U masked walk steps per while-loop iteration,
    amortizing the ~2 us iteration floor) must reproduce the U=1 kernels
    bit-for-bit in BOTH walk modes — the unrolled steps' active-bit
    masking is the only new logic and an off-by-one there silently
    corrupts the step after a walk exits."""
    from mitsuba2_tpu.scene.presets import mesh_gallery
    scene = mesh_gallery(subdiv=1)
    n = traverse_pallas.MXU_BLOCK + 2048
    o, d = random_rays(n, seed=13, spread=2.5)
    t_max = jnp.full(n, jnp.inf)
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)

    for walks in (1, 2):
        monkeypatch.setattr(traverse_pallas, "MXU_WALKS", walks)
        got = {}
        for u in (1, 3):
            monkeypatch.setattr(traverse_pallas, "MXU_UNROLL", u)
            t, p, _, _ = traverse_pallas.ray_intersect_preliminary(
                scene, o, d, t_max, interpret=True)
            occ = traverse_pallas.ray_test(scene, o, d, jnp.full(n, 0.7),
                                           interpret=True)
            got[u] = (np.asarray(t), np.asarray(p), np.asarray(occ))
        for a, b in zip(got[1], got[3]):
            np.testing.assert_array_equal(a, b)


def test_mxu_split_lane_culling_matches_unsplit(monkeypatch):
    """MI_MXU_SPLIT>1 (per-visit lane-group culling: sublane groups whose
    lanes all missed the cluster slab skip their dot + epilogue) must be
    bit-exact vs the unsplit kernels in both walk modes — a skipped group
    is exactly a group whose lanes cannot beat t_best inside the cluster
    AABB (closest) / cannot be occluded by it (any-hit)."""
    from mitsuba2_tpu.scene.presets import mesh_gallery
    scene = mesh_gallery(subdiv=1)
    n = traverse_pallas.MXU_BLOCK + 2048
    o, d = random_rays(n, seed=17, spread=2.5)
    t_max = jnp.full(n, jnp.inf)
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)

    for walks in (1, 2):
        monkeypatch.setattr(traverse_pallas, "MXU_WALKS", walks)
        got = {}
        for q in (1, 4):
            monkeypatch.setattr(traverse_pallas, "MXU_SPLIT", q)
            t, p, _, _ = traverse_pallas.ray_intersect_preliminary(
                scene, o, d, t_max, interpret=True)
            occ = traverse_pallas.ray_test(scene, o, d, jnp.full(n, 0.7),
                                           interpret=True)
            got[q] = (np.asarray(t), np.asarray(p), np.asarray(occ))
        for a, b in zip(got[1], got[4]):
            np.testing.assert_array_equal(a, b)


def test_mxu_dense_sweep_matches_walk(monkeypatch):
    """The dense cluster-sweep kernels (counter-driven DMA + matmul over
    ALL clusters, no walk — the pipelined-floor design) must agree with
    the cut-tree walk: same hit masks and occlusion, same t up to
    cross-cluster equidistant ties (visit order differs)."""
    from mitsuba2_tpu.kernels import traverse_pallas as tp
    from mitsuba2_tpu.scene.presets import mesh_gallery
    scene = mesh_gallery(subdiv=1)
    assert scene.mxu_ccs is not None
    n = 4096
    o, d = random_rays(n, seed=13, spread=2.5)
    t_max = jnp.full(n, jnp.inf)
    monkeypatch.setattr(tp, "MXU_LEAVES", True)

    monkeypatch.setattr(tp, "_MXU_DENSE", "0")
    t_w, p_w, _, _ = tp.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    occ_w = tp.ray_test(scene, o, d, jnp.full(n, 0.6), interpret=True)
    monkeypatch.setattr(tp, "_MXU_DENSE", "1")
    t_d, p_d, _, _ = tp.ray_intersect_preliminary(
        scene, o, d, t_max, interpret=True)
    occ_d = tp.ray_test(scene, o, d, jnp.full(n, 0.6), interpret=True)

    t_w, t_d = np.asarray(t_w), np.asarray(t_d)
    hw_, hd_ = np.isfinite(t_w), np.isfinite(t_d)
    np.testing.assert_array_equal(hw_, hd_)
    np.testing.assert_allclose(t_d[hd_], t_w[hw_], rtol=1e-5, atol=1e-6)
    same = np.asarray(p_w) == np.asarray(p_d)
    assert same[hw_].mean() > 0.995
    np.testing.assert_array_equal(np.asarray(occ_w), np.asarray(occ_d))

"""Per-scene CLUSTER_K: policy, equivalence, and coexistence.

Round-5 scale policy (docs/TPU_TRAVERSAL.md "Big scenes"): build_scene
picks CK=256 for scenes >= ~250k prims (measured +3-7%), CK=128 below;
each SceneData carries its cluster_k statically and the Pallas kernels
size their VMEM feature scratch from the scene's own tables — so scenes
built under different CK values are intersectable in ANY order within
one process (no global rebinding hazard).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba2_tpu.core.geometry import Ray
from mitsuba2_tpu.core.vec import Vec3
from mitsuba2_tpu.kernels import traverse_jnp, traverse_pallas
from mitsuba2_tpu.scene import bvh as bvh_mod
from mitsuba2_tpu.scene import scene as scene_mod
from mitsuba2_tpu.scene.presets import mesh_gallery


def _rays(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh_min)[0]
    hi = np.asarray(scene.bvh_max)[0]
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*jnp.asarray(o.T)), Vec3(*jnp.asarray(d.T)),
            jnp.full(n, jnp.inf, jnp.float32))


def test_pick_cluster_k_policy():
    assert scene_mod._pick_cluster_k(1000) == 128
    assert scene_mod._pick_cluster_k(249_999) == 128
    assert scene_mod._pick_cluster_k(250_000) == 256
    assert scene_mod._pick_cluster_k(5_000_000) == 256
    # explicit pin wins over the policy; force=False restores it
    bvh_mod.set_cluster_k(128)
    try:
        assert scene_mod._pick_cluster_k(5_000_000) == 128
    finally:
        bvh_mod.set_cluster_k(128, force=False)
    assert scene_mod._pick_cluster_k(5_000_000) == 256


@pytest.fixture
def ck256_scene():
    bvh_mod.set_cluster_k(256)
    try:
        yield mesh_gallery(subdiv=3)
    finally:
        bvh_mod.set_cluster_k(128, force=False)


def test_ck256_tables_shape(ck256_scene):
    scene = ck256_scene
    assert scene.cluster_k == 256
    S = scene.cluster_slot_prim.shape[0]
    assert S % 256 == 0
    assert scene.mxu_feat.shape == (16, 4 * S)


def test_ck256_matches_jnp_oracle(ck256_scene):
    """The kernels must intersect a CK=256 scene correctly with NO
    global state set (scene-driven scratch sizing) — the module default
    is back to 128 by the time this runs (fixture teardown order is
    irrelevant: we assert against the scene's own field)."""
    scene = ck256_scene
    assert scene.cluster_k == 256
    ov, dv, tm = _rays(scene, 4096)
    t_p, prim_p, _, _ = traverse_pallas.ray_intersect_preliminary(
        scene, ov, dv, tm, interpret=True)
    occ_p = traverse_pallas.ray_test(scene, ov, dv,
                                     jnp.full(4096, 3.0, jnp.float32),
                                     interpret=True)
    t_j, prim_j, _, _ = traverse_jnp.ray_intersect_preliminary(
        scene, ov, dv, tm)
    occ_j = traverse_jnp.ray_test(scene, ov, dv,
                                  jnp.full(4096, 3.0, jnp.float32))
    hit_p = np.asarray(prim_p) >= 0
    hit_j = np.asarray(prim_j) >= 0
    np.testing.assert_array_equal(hit_p, hit_j)
    # MXU bf16-split precision: t agrees to the documented ~1e-4 rel
    np.testing.assert_allclose(np.asarray(t_p)[hit_p],
                               np.asarray(t_j)[hit_j],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_j))


def test_mixed_ck_scenes_coexist(ck256_scene):
    """A CK=128 scene and a CK=256 scene intersected ALTERNATELY in one
    process: both must match the oracle (the old global-CK design made
    this sequence silently wrong)."""
    s256 = ck256_scene
    bvh_mod.set_cluster_k(128, force=False)
    s128 = mesh_gallery(subdiv=2)
    assert s128.cluster_k == 128 and s256.cluster_k == 256
    for scene in (s128, s256, s128, s256):
        ov, dv, tm = _rays(scene, 2048, seed=11)
        _, prim_p, _, _ = traverse_pallas.ray_intersect_preliminary(
            scene, ov, dv, tm, interpret=True)
        _, prim_j, _, _ = traverse_jnp.ray_intersect_preliminary(
            scene, ov, dv, tm)
        np.testing.assert_array_equal(np.asarray(prim_p) >= 0,
                                      np.asarray(prim_j) >= 0)


def test_sorted_wrapper_uv_skip_matches_oracle():
    """The production sorted path (with the MXU u/v unsort skip) against
    the jnp walker on a big triangle-only scene, full si comparison."""
    scene = mesh_gallery(subdiv=3)
    assert not traverse_pallas.emits_uv(scene)  # MXU path: zeros
    ov, dv, tm = _rays(scene, 4096, seed=7)
    ray = Ray.make(ov, dv)
    backend0 = scene_mod._BACKEND
    try:
        scene_mod.set_backend("pallas")
        # interpret mode rides the same _sorted_pallas_intersect wrapper
        # on CPU (ray_intersect_preliminary defaults interpret=True off
        # TPU)
        si_p = scene_mod.ray_intersect(scene, ray)
        scene_mod.set_backend("jnp")
        si_j = scene_mod.ray_intersect(scene, ray)
    finally:
        scene_mod.set_backend(backend0)
    np.testing.assert_array_equal(np.asarray(si_p.valid),
                                  np.asarray(si_j.valid))
    m = np.asarray(si_p.valid)
    np.testing.assert_array_equal(np.asarray(si_p.prim_index)[m],
                                  np.asarray(si_j.prim_index)[m])
    # the exact-MT re-solve in csi makes u/v/p kernel-independent
    for a, b in ((si_p.uv.x, si_j.uv.x), (si_p.uv.y, si_j.uv.y),
                 (si_p.p.x, si_j.p.x), (si_p.p.y, si_j.p.y),
                 (si_p.p.z, si_j.p.z)):
        np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                                   rtol=1e-4, atol=1e-4)

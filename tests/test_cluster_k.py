"""set_cluster_k: CK=256-built scenes must intersect identically.

The round-5 scale policy (docs/TPU_TRAVERSAL.md "Big scenes") rebinds
CLUSTER_K before building big scenes. The MXU tables, feature layout,
fuel bounds and kernel scratch widths all change with CK, so the knob
needs an equivalence test: a CK=256 scene through the Pallas MXU path
(interpret mode) must match the CK-independent jnp walker — and the
sorted production wrapper (which also drops the u/v unsort payloads on
the MXU path, scene.py::_sorted_pallas_intersect) must match too.
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


@pytest.fixture
def ck256_scene():
    bvh_mod.set_cluster_k(256)
    try:
        yield mesh_gallery(subdiv=3)
    finally:
        bvh_mod.set_cluster_k(128)


def test_ck256_tables_shape(ck256_scene):
    scene = ck256_scene
    S = scene.cluster_slot_prim.shape[0]
    assert S % 256 == 0
    assert scene.mxu_feat.shape == (16, 4 * S)


def test_ck256_matches_jnp_oracle(ck256_scene):
    scene = ck256_scene
    ov, dv, tm = _rays(scene, 4096)
    # CK=256 kernels must TRACE under CK=256 as well
    bvh_mod.set_cluster_k(256)
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

"""BVH8 child-testing walk (kernels/traverse_pallas.py, collapse_bvh8).

The round-3 traversal candidate: 8-wide nodes whose children are all
slab-tested at the parent visit, with a static-depth select-chain stack
(docs/TPU_TRAVERSAL.md "BVH8 child-testing walk" — walk-model measured
6-7.4x fewer block-synchronous steps). Oracle ladder: the per-lane jnp
walker; interpret-mode Pallas on CPU CI.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.vec import Vec3
from mitsuba2_tpu.kernels import traverse_jnp, traverse_pallas
from mitsuba2_tpu.scene.presets import mesh_gallery
from mitsuba2_tpu.scene import scene as scene_mod


@pytest.fixture(scope="module")
def gallery():
    return mesh_gallery(subdiv=2)


def _rays(scene, n, seed=0, coherent=False):
    rng = np.random.default_rng(seed)
    lo, hi = np.asarray(scene.bvh_min)[0], np.asarray(scene.bvh_max)[0]
    if coherent:
        eye = 0.5 * (lo + hi) + np.asarray([0, 0.2, -2.8], np.float32)
        o = np.broadcast_to(eye, (n, 3)).astype(np.float32)
        d = rng.uniform(lo, hi, (n, 3)).astype(np.float32) - eye
    else:
        o = rng.uniform(lo - 0.5, hi + 0.5, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*[jnp.asarray(o[:, k]) for k in range(3)]),
            Vec3(*[jnp.asarray(d[:, k]) for k in range(3)]))


@pytest.mark.parametrize("coherent", [True, False])
def test_bvh8_matches_jnp_oracle(gallery, coherent):
    ov, dv = _rays(gallery, 4096, seed=1, coherent=coherent)
    tj, pj, uj, vj = traverse_jnp.ray_intersect_preliminary(
        gallery, ov, dv, jnp.inf)
    t8, p8, u8, v8 = traverse_pallas.ray_intersect_bvh8(
        gallery, ov, dv, jnp.inf, interpret=True)
    tj, t8 = np.asarray(tj), np.asarray(t8)
    assert (np.isfinite(tj) == np.isfinite(t8)).all()
    both = np.isfinite(tj)
    assert (np.asarray(pj)[both] == np.asarray(p8)[both]).all()
    np.testing.assert_allclose(tj[both], t8[both], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(uj)[both], np.asarray(u8)[both],
                               atol=1e-5)


def test_bvh8_anyhit_matches_jnp_oracle(gallery):
    ov, dv = _rays(gallery, 4096, seed=2)
    oj = np.asarray(traverse_jnp.ray_test(gallery, ov, dv,
                                          jnp.asarray(3.0)))
    o8 = np.asarray(traverse_pallas.ray_test_bvh8(
        gallery, ov, dv, jnp.full(4096, 3.0, jnp.float32), interpret=True))
    assert (oj == o8).all()


def test_bvh8_full_render_matches_default(gallery):
    """End-to-end render through set_backend('bvh8') equals the default
    backend bit-for-bit (same seeds, same intersections).

    jax.clear_caches() between renders is LOAD-BEARING: the backend
    switch is a module global read at trace time, so without it the
    second render reuses the first's cached executable and the test
    passes vacuously."""
    import jax
    cfg = mi.RenderConfig(width=32, height=32, spp=4, spp_per_pass=4,
                          max_depth=2)
    ref = np.asarray(mi.render(gallery, cfg))
    scene_mod.set_backend("bvh8")
    jax.clear_caches()
    try:
        img = np.asarray(mi.render(gallery, cfg))
    finally:
        scene_mod.set_backend("auto")
        jax.clear_caches()
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("coherent", [True, False])
def test_bvh8mxu_matches_brute(gallery, coherent):
    """Composed BVH8-walk + MXU-cluster-leaf kernel vs the brute-force
    oracle (same tolerance budget as the MXU cut-tree walk:
    tests/test_traverse_big.py::test_mxu_cut_tree_matches_brute)."""
    from mitsuba2_tpu.kernels import brute
    assert gallery.bvh8c_child is not None
    ov, dv = _rays(gallery, 4096, seed=3, coherent=coherent)
    tb, pb, ub, vb = brute.ray_intersect_brute(gallery, ov, dv, jnp.inf)
    tm, pm, um, vm = traverse_pallas.ray_intersect_bvh8mxu(
        gallery, ov, dv, jnp.full(4096, jnp.inf), interpret=True)
    tb, tm = np.asarray(tb), np.asarray(tm)
    hb, hm = np.isfinite(tb), np.isfinite(tm)
    np.testing.assert_array_equal(hb, hm)
    np.testing.assert_allclose(tm[hm], tb[hb], rtol=1e-3, atol=1e-5)
    rel = np.abs(tm[hm] - tb[hb]) / np.maximum(np.abs(tb[hb]), 1e-9)
    assert np.percentile(rel, 99) < 1e-4, "bulk precision regressed"
    same = np.asarray(pb) == np.asarray(pm)
    assert same[hb].mean() > 0.99  # equidistant ties only


def test_bvh8mxu_anyhit_matches_jnp_oracle(gallery):
    ov, dv = _rays(gallery, 4096, seed=4)
    oj = np.asarray(traverse_jnp.ray_test(gallery, ov, dv,
                                          jnp.asarray(3.0)))
    om = np.asarray(traverse_pallas.ray_test_bvh8mxu(
        gallery, ov, dv, jnp.full(4096, 3.0, jnp.float32), interpret=True))
    assert (oj == om).all()


def test_bvh8mxu_full_render_matches_default(gallery):
    """End-to-end render through set_backend('bvh8mxu') vs the default
    backend (MXU plane-form precision budget, not bit-exact)."""
    import jax
    cfg = mi.RenderConfig(width=32, height=32, spp=4, spp_per_pass=4,
                          max_depth=2)
    ref = np.asarray(mi.render(gallery, cfg))
    scene_mod.set_backend("bvh8mxu")
    jax.clear_caches()
    try:
        img = np.asarray(mi.render(gallery, cfg))
    finally:
        scene_mod.set_backend("auto")
        jax.clear_caches()
    diff = np.abs(img - ref)
    assert np.isfinite(img).all()
    # MC renders with near-identical intersections: tiny mean deviation
    assert diff.mean() < 1e-3, f"mean px diff {diff.mean()}"


def test_bvh8_rejects_unsupported(gallery):
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene
    # tiny scene: no BVH8 tables
    tiny = build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse"})],
        {"type": "perspective", "to_world": np.eye(4, dtype=np.float32),
         "fov": 45.0},
        [{"type": "constant", "radiance": [1, 1, 1]}])
    assert tiny.bvh8_child is None
    scene_mod.set_backend("bvh8")
    try:
        with pytest.raises(ValueError, match="BVH8"):
            ov, dv = _rays(gallery, 256)
            scene_mod._pick_backend(tiny)
    finally:
        scene_mod.set_backend("auto")

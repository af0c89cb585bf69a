"""Native (C++) BVH builder vs the numpy oracle: structural validity and
traversal equivalence (kdtree.h-analog build layer)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba2_tpu import native
from mitsuba2_tpu.kernels import traverse_jnp
from mitsuba2_tpu.scene import bvh as bvh_mod

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _random_boxes(P, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, 10, (P, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.3, (P, 3)).astype(np.float32)
    return c - h, c + h


def _validate(tree, P):
    n = tree.bounds_min.shape[0]
    assert np.sort(tree.prim_order).tolist() == list(range(P))
    leaves = tree.leaf_start >= 0
    assert tree.leaf_count[leaves].sum() == P
    assert (tree.leaf_count[leaves] <= bvh_mod.LEAF_K).all()
    # miss links: strictly forward, in range, root covers everything
    nxt = tree.miss
    assert ((nxt == -1) | (nxt > np.arange(n))).all()
    # every node bbox is contained in the root bbox
    assert (tree.bounds_min >= tree.bounds_min[0] - 1e-4).all()
    assert (tree.bounds_max <= tree.bounds_max[0] + 1e-4).all()


def test_native_structure_valid():
    bb_min, bb_max = _random_boxes(3000)
    (n_min, n_max, l_start, l_count, miss, order) = \
        native.build_bvh_native(bb_min, bb_max)
    tree = bvh_mod.BVH(n_min, n_max, l_start, l_count, miss, order)
    _validate(tree, 3000)


def test_native_matches_numpy_traversal():
    """Both trees must produce identical closest hits for random rays."""
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene
    from mitsuba2_tpu.core.geometry import Transform4

    ss = []
    rng = np.random.default_rng(1)
    for i in range(200):
        t = (Transform4.translate(rng.uniform(0, 8, 3)) @
             Transform4.scale([0.2, 0.2, 0.2]))
        ss.append(shapes.cube(bsdf={"type": "diffuse"})
                  .transformed(np.asarray(t.matrix)))
    cam = Transform4.look_at(origin=[-3, -3, -3], target=[4, 4, 4], up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix)}

    import mitsuba2_tpu.scene.bvh as B
    orig = B.build_bvh
    # scene built twice: native on, native off
    scene_nat = build_scene(ss, sensor)
    B.build_bvh = lambda mn, mx, native=True: orig(mn, mx, native=False)
    try:
        scene_py = build_scene(ss, sensor)
    finally:
        B.build_bvh = orig

    o = jnp.asarray(rng.uniform(-2, 9, (4096, 3)), jnp.float32)
    d = rng.normal(size=(4096, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    tm = jnp.full(4096, jnp.inf)
    t_n, _, _, _ = traverse_jnp.ray_intersect_preliminary(scene_nat, o, d, tm)
    t_p, _, _, _ = traverse_jnp.ray_intersect_preliminary(scene_py, o, d, tm)
    t_n, t_p = np.asarray(t_n), np.asarray(t_p)
    np.testing.assert_array_equal(np.isfinite(t_n), np.isfinite(t_p))
    m = np.isfinite(t_n)
    np.testing.assert_allclose(t_n[m], t_p[m], rtol=1e-5, atol=1e-6)


def test_native_build_speed_smoke():
    """Native build of 200k boxes completes quickly (sanity, not a bench)."""
    import time
    bb_min, bb_max = _random_boxes(200_000, seed=2)
    t0 = time.perf_counter()
    native.build_bvh_native(bb_min, bb_max)
    assert time.perf_counter() - t0 < 30.0
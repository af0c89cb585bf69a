"""BVH traversal correctness vs brute-force oracle (mirrors the reference's
kd-tree vs naive intersection testing discipline)."""
import jax.numpy as jnp
import numpy as np

from mitsuba2_tpu.kernels import traverse_jnp
from mitsuba2_tpu.scene.presets import cornell_box, furnace


def brute_force(scene, o, d, t_max):
    """Reference: test every prim for every ray (no BVH)."""
    P = scene.n_prims
    N = o.shape[0]
    all_idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (N, P))
    t, u, v = traverse_jnp.intersect_prims(
        all_idx, o[:, None, :], d[:, None, :], scene,
        jnp.broadcast_to(jnp.asarray(t_max)[..., None], (N, P)))
    best = jnp.argmin(t, axis=-1).astype(jnp.int32)
    tb = jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0]
    ub = jnp.take_along_axis(u, best[:, None], axis=-1)[:, 0]
    vb = jnp.take_along_axis(v, best[:, None], axis=-1)[:, 0]
    miss = ~jnp.isfinite(tb)
    return jnp.where(miss, jnp.inf, tb), jnp.where(miss, -1, best), ub, vb


def random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.2, 1.2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_matches_brute_force_cbox():
    scene = cornell_box()
    o, d = random_rays(4096)
    t_max = jnp.full(4096, jnp.inf)
    t1, p1, u1, v1 = traverse_jnp.ray_intersect_preliminary(scene, o, d, t_max)
    t2, p2, u2, v2 = brute_force(scene, o, d, t_max)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    hit1, hit2 = np.isfinite(t1), np.isfinite(t2)
    np.testing.assert_array_equal(hit1, hit2)
    np.testing.assert_allclose(t1[hit1], t2[hit2], rtol=1e-4, atol=1e-5)
    # prim ids must match except where two prims are equidistant (quad diagonal)
    with np.errstate(invalid="ignore"):
        close = np.abs(t1 - t2) <= 1e-5 + 1e-4 * np.abs(t2)
    assert close[hit1].mean() > 0.999


def test_bvh_matches_brute_force_sphere():
    scene = furnace()
    o, d = random_rays(2048, seed=1)
    t_max = jnp.full(2048, jnp.inf)
    t1, p1, _, _ = traverse_jnp.ray_intersect_preliminary(scene, o, d, t_max)
    t2, p2, _, _ = brute_force(scene, o, d, t_max)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-4, atol=1e-5)


def test_ray_test_matches_intersect():
    scene = cornell_box()
    o, d = random_rays(4096, seed=2)
    t_max = jnp.full(4096, jnp.inf)
    t, _, _, _ = traverse_jnp.ray_intersect_preliminary(scene, o, d, t_max)
    occ = traverse_jnp.ray_test(scene, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(occ), np.isfinite(np.asarray(t)))


def test_ray_test_respects_maxt():
    scene = cornell_box()
    # ray from center toward +x wall at distance ~0.5
    o = jnp.asarray([[0.5, 0.5, 0.5]] * 2)
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
    occ_short = traverse_jnp.ray_test(scene, o, d, jnp.asarray([0.1, 10.0]))
    assert not bool(occ_short[0])
    assert bool(occ_short[1])

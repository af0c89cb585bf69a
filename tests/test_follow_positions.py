"""ray_intersect_positions parity with the full shading-record path.

The reparam warp's batched aux traces (diff/reparam.py) ride
scene.ray_intersect_positions — a minimal path that must agree with
ray_intersect's si.p/si.t/si.valid EXACTLY (same backend, same detached
MT re-solve, same sphere reprojection), including the derivative
structure that makes hit points FOLLOW the geometry.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Ray
from mitsuba2_tpu.core.vec import Vec3
from mitsuba2_tpu.scene import scene as scene_mod
from mitsuba2_tpu.scene.presets import cornell_box, mesh_gallery


def _rays(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh_min)[0]
    hi = np.asarray(scene.bvh_max)[0]
    c = 0.5 * (lo + hi)
    ext = float(np.linalg.norm(hi - lo))
    o = c + rng.normal(size=(n, 3)) * 0.1 * ext
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Ray.make(Vec3(*jnp.asarray(o.T, jnp.float32)),
                    Vec3(*jnp.asarray(d.T, jnp.float32)))


@pytest.mark.parametrize("preset", [cornell_box, mesh_gallery, "big"])
def test_positions_match_surface_interaction(preset):
    if preset == "big":
        # > gather.COLUMN_MAX prims: csi takes the packed-row-gather
        # branch while ray_intersect_positions stays on per-table
        # gathers — this parity check covers both layouts
        scene = mesh_gallery(subdiv=3)
    else:
        scene = preset() if preset is cornell_box else preset(subdiv=2)
    ray = _rays(scene, 512)
    si = scene_mod.ray_intersect(scene, ray)
    p, t, valid = scene_mod.ray_intersect_positions(scene, ray)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(si.valid))
    v = np.asarray(valid)
    for a, b in ((p.x, si.p.x), (p.y, si.p.y), (p.z, si.p.z)):
        np.testing.assert_allclose(np.asarray(a)[v], np.asarray(b)[v],
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t)[v], np.asarray(si.t)[v],
                               rtol=1e-5)


def test_positions_follow_geometry():
    """d p / d(vertex translation) == 1 for hits on the moved shape (the
    geometry-following contract the warp field depends on) — and matches
    the full path's si.p derivative."""
    scene = cornell_box()
    ray = _rays(scene, 256, seed=3)

    def p_min(shift, fn):
        s = scene.replace(prim_p0=scene.prim_p0 + shift[None, :])
        out = fn(s)
        return out

    def via_positions(s):
        p, t, valid = scene_mod.ray_intersect_positions(s, ray)
        return jnp.where(valid, p.x, 0.0).sum()

    def via_si(s):
        si = scene_mod.ray_intersect(s, ray)
        return jnp.where(si.valid, si.p.x, 0.0).sum()

    z = jnp.zeros(3, jnp.float32)
    g1 = jax.grad(lambda sh: p_min(sh, via_positions))(z)
    g2 = jax.grad(lambda sh: p_min(sh, via_si))(z)
    assert float(jnp.abs(g1[0])) > 0  # hits follow an x-translation
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)

"""Wavefront compaction: permuting per-lane state (including sampler
streams) must leave the rendered image BIT-EXACT, since each lane carries
its own PCG32 stream (kernels/compact.py invariant)."""
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.kernels import compact
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene.presets import cornell_box


def test_morton_orders_locality():
    p = jnp.asarray([[0.1, 0.1, 0.1], [0.11, 0.1, 0.1],
                     [0.9, 0.9, 0.9], [0.12, 0.11, 0.1]], jnp.float32)
    codes = np.asarray(compact.morton3(p, jnp.zeros(3), jnp.ones(3)))
    # near points get near codes; the far point is far in code space
    assert abs(int(codes[0]) - int(codes[1])) < abs(int(codes[0]) - int(codes[2]))


def test_unsort_inverts_permutation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    perm = jnp.asarray(rng.permutation(64), jnp.int32)
    orig = jnp.arange(64, dtype=jnp.int32)[perm]
    np.testing.assert_array_equal(np.asarray(compact.unsort(x[perm], orig)),
                                  np.asarray(x))


def test_compacted_render_matches_uncompacted():
    """Same per-lane sampling decisions -> same image up to ULP-level
    fusion/FMA reassociation across the inserted gather boundaries."""
    scene = cornell_box()
    cfg = mi.RenderConfig(width=16, height=16, spp=8, spp_per_pass=8,
                          max_depth=4, rr_depth=3)
    a = np.asarray(render(scene, cfg.replace(compact=False)))
    b = np.asarray(render(scene, cfg.replace(compact=True)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

"""Checkpoint/resume + QMC tests (SURVEY.md §5.4 + libcore qmc.cpp)."""
import os

import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core import qmc
from mitsuba2_tpu.dist import checkpoint as ck
from mitsuba2_tpu.render.integrators import _render_pass_jit, render
from mitsuba2_tpu.scene.presets import cornell_box


def test_radical_inverse_base2_first_values():
    vals = np.asarray(qmc.radical_inverse_base2(jnp.arange(8, dtype=jnp.uint32)))
    np.testing.assert_allclose(
        vals, [0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-7)


def test_radical_inverse_base3():
    vals = np.asarray(qmc.radical_inverse(jnp.arange(4, dtype=jnp.uint32), 3))
    np.testing.assert_allclose(vals, [0, 1 / 3, 2 / 3, 1 / 9], atol=1e-6)


def test_halton_uniformity():
    pts = np.asarray(qmc.halton_points(1024, 2))
    assert pts.shape == (1024, 2)
    # stars-and-bars uniformity: each quadrant gets ~25%
    q = ((pts[:, 0] > 0.5).astype(int) * 2 + (pts[:, 1] > 0.5).astype(int))
    counts = np.bincount(q, minlength=4)
    assert (np.abs(counts - 256) < 30).all()


def test_save_load_roundtrip(tmp_path):
    state = {"a": jnp.arange(5.0), "b": (jnp.zeros(3), jnp.int32(7))}
    p = str(tmp_path / "s.npz")
    ck.save(p, state, step=42, meta={"note": "hi"})
    loaded, step, meta = ck.load(p, like=state)
    assert step == 42 and meta["note"] == "hi"
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.arange(5.0))
    assert int(loaded["b"][1]) == 7


def test_checkpointed_render_resumes_exactly(tmp_path):
    """Interrupting after 2 of 4 passes and resuming must give the exact
    same image as an uninterrupted render."""
    scene = cornell_box(boxes=False)
    cfg = mi.RenderConfig(width=8, height=8, spp=16, spp_per_pass=4,
                          max_depth=2)
    seeds = [jnp.uint32((cfg.seed * 0x9E3779B1 + p) & 0xFFFFFFFF)
             for p in range(4)]
    ref = render(scene, cfg)

    path = str(tmp_path / "film.npz")
    run1 = ck.CheckpointedRender(path, every=1)
    assert run1.resume() == 0
    for p in range(2):  # "crash" after 2 passes
        img, w = _render_pass_jit(scene, cfg, seeds[p])
        run1.update(img, w, p)

    run2 = ck.CheckpointedRender(path, every=1)
    start = run2.resume()
    assert start == 2
    for p in range(start, 4):
        img, w = _render_pass_jit(scene, cfg, seeds[p])
        run2.update(img, w, p)
    out = run2.develop()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_render_cancel_partial_image():
    """Integrator::cancel parity: cancelling after pass 1 returns the
    partial (but develop-normalized, unbiased) image."""
    import numpy as np
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.scene.presets import cornell_box
    from mitsuba2_tpu.utils.observability import render_instrumented

    scene = cornell_box()
    cfg = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=4,
                          max_depth=2, rr_depth=99)
    calls = {"n": 0}

    def cancel():
        calls["n"] += 1
        return calls["n"] > 2  # allow two passes

    img, mon = render_instrumented(scene, cfg, seed=1, cancel=cancel)
    assert getattr(mon, "cancelled", False)
    full, _ = render_instrumented(scene, cfg, seed=1)
    # partial estimate is unbiased: close to the full render at these spp
    assert np.abs(np.asarray(img) - np.asarray(full)).mean() < 0.15

"""AnimatedTransform + camera motion blur (VERDICT.md round-2 missing #6;
include/mitsuba/core/transform.h::AnimatedTransform). Shape motion is
documented out of scope (static BVH, as in the reference's own kd-tree)."""
import numpy as np
import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import (AnimatedTransform, Transform4,
                                        quat_from_matrix)
from mitsuba2_tpu.core.vec import Vec3
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene.presets import cornell_box, _quad
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene


def test_decompose_recompose_identity_keys():
    """A key evaluated AT its own time reproduces the key matrix."""
    m0 = (Transform4.translate([1, 2, 3]) @
          Transform4.rotate([0, 1, 0], 30.0) @
          Transform4.scale([2.0, 1.0, 0.5])).matrix
    m1 = (Transform4.translate([-1, 0, 2]) @
          Transform4.rotate([1, 1, 0], -50.0)).matrix
    at = AnimatedTransform.from_keys([0.0, 1.0], [np.asarray(m0),
                                                  np.asarray(m1)])
    for t, m in ((0.0, np.asarray(m0)), (1.0, np.asarray(m1))):
        v = Vec3(jnp.asarray([1.0, 0.3]), jnp.asarray([0.5, -2.0]),
                 jnp.asarray([-0.2, 0.9]))
        tt = jnp.full((2,), t, jnp.float32)
        got = at.apply_point(tt, v)
        ref = (np.asarray(m) @ np.stack(
            [np.asarray(v.x), np.asarray(v.y), np.asarray(v.z),
             np.ones(2)]))[:3]
        np.testing.assert_allclose(np.asarray(got.to_array()).T, ref,
                                   rtol=1e-5, atol=1e-5)


def test_rotation_midpoint_is_slerp():
    """Halfway between 0 and 90 degrees must be exactly 45 (slerp, not
    matrix lerp, which would shrink the vector)."""
    m0 = Transform4.rotate([0, 0, 1], 0.0).matrix
    m1 = Transform4.rotate([0, 0, 1], 90.0).matrix
    at = AnimatedTransform.from_keys([0.0, 1.0], [np.asarray(m0),
                                                  np.asarray(m1)])
    v = Vec3(jnp.asarray([1.0]), jnp.asarray([0.0]), jnp.asarray([0.0]))
    r = at.apply_vector(jnp.asarray([0.5]), v)
    ang = np.degrees(np.arctan2(float(r.y.squeeze()), float(r.x.squeeze())))
    np.testing.assert_allclose(ang, 45.0, atol=0.01)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r.to_array())), 1.0, rtol=1e-5)


def _animated_cbox(m0, m1):
    scene = cornell_box(boxes=False)
    # rebuild with keyframed camera
    from mitsuba2_tpu.scene.presets import WHITE, RED, GREEN, LIGHT
    base = cornell_box(boxes=False)
    return base.replace(cam_motion=AnimatedTransform.from_keys(
        [0.0, 1.0], [m0, m1]))


CAM0 = Transform4.look_at(origin=[0.5, 0.5, -1.39], target=[0.5, 0.5, 0.5],
                          up=[0, 1, 0]).matrix
# pure translation of CAM0 (same viewing direction), so linearly
# interpolated poses are exact for the shutter-average test below
CAM1 = Transform4.look_at(origin=[0.8, 0.5, -1.39], target=[0.8, 0.5, 0.5],
                          up=[0, 1, 0]).matrix


def test_static_keys_match_static_camera():
    """Identical keys == no motion: image equals the static render."""
    cfg = mi.RenderConfig(width=24, height=24, spp=4, spp_per_pass=4,
                          max_depth=2)
    static = render(cornell_box(boxes=False), cfg, seed=2)
    animated = render(_animated_cbox(np.asarray(CAM0), np.asarray(CAM0)),
                      cfg, seed=2)
    # the animated path draws an extra time sample per lane, so the sample
    # streams differ; compare converged means instead of exact pixels
    np.testing.assert_allclose(float(animated.mean()), float(static.mean()),
                               rtol=0.05)
    assert np.isfinite(np.asarray(animated)).all()


def test_motion_blur_equals_shutter_average():
    """The motion-blurred image must equal the shutter-time average of
    static renders at interpolated poses (the defining property of the
    time integral; pure-translation keys make pose interpolation exact)."""
    cfg = mi.RenderConfig(width=24, height=24, spp=64, spp_per_pass=64,
                          max_depth=2)
    blurred = np.asarray(render(
        _animated_cbox(np.asarray(CAM0), np.asarray(CAM1)), cfg, seed=0))

    o0 = np.asarray(CAM0)[:3, 3].copy()
    o1 = np.asarray(CAM1)[:3, 3].copy()
    acc = None
    n_t = 16
    for k in range(n_t):
        t = (k + 0.5) / n_t
        m = np.asarray(CAM0).copy()
        m[:3, 3] = o0 * (1 - t) + o1 * t
        img = np.asarray(render(
            _animated_cbox(m, m), cfg, seed=k + 1))
        acc = img if acc is None else acc + img
    avg = acc / n_t

    # MC + time-strata noise: compare downsampled 8x8 blocks
    b = blurred.reshape(8, 3, 8, 3, 3).mean((1, 3))
    a = avg.reshape(8, 3, 8, 3, 3).mean((1, 3))
    np.testing.assert_allclose(b, a, atol=0.06, rtol=0.3)
    # and the blur is real: differs from the static endpoint render
    sharp = np.asarray(render(_animated_cbox(np.asarray(CAM0),
                                             np.asarray(CAM0)), cfg, seed=0))
    assert np.abs(blurred - sharp).max() > 0.05


def test_shutter_open_close_clamp():
    """sensor.cpp shutter_open/shutter_close restrict the sampled time
    range: a zero-width shutter at t=0 must reproduce the key-0 pose
    exactly (no blur) even with a moving camera."""
    sc = _animated_cbox(np.asarray(CAM0), np.asarray(CAM1))
    cam = np.asarray(sc.cam_data).copy()
    cam[10], cam[11] = 0.0, 0.0       # shutter pinned at t=0
    pinned = sc.replace(cam_data=jnp.asarray(cam))
    cfg = mi.RenderConfig(width=24, height=24, spp=16, spp_per_pass=16,
                          max_depth=2)
    img_pin = render(pinned, cfg, seed=3)
    img_blur = render(sc, cfg, seed=3)
    static0 = _animated_cbox(np.asarray(CAM0), np.asarray(CAM0))
    img_k0 = render(static0, cfg, seed=3)
    # pinned == key-0 pose bit-for-bit (same sample stream, same pose)
    np.testing.assert_array_equal(np.asarray(img_pin), np.asarray(img_k0))
    # and differs from the blurred render
    assert not np.allclose(np.asarray(img_pin), np.asarray(img_blur))

"""Reparameterized-integrator tests (config 5): occluder-translation
gradients — plain AD sees ~zero, the reparameterized estimator must match
finite differences of the boundary term."""
import jax
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.diff.reparam import render_direct_reparam
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene

CFG = mi.RenderConfig(width=32, height=32, spp=4, spp_per_pass=4, max_depth=1)


def _occluder_scene():
    """Bright emissive wall at z=0; small dark occluder at z=1.5 whose left
    edge crosses the view; camera at z=4."""
    wall = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
        emitter={"type": "area", "radiance": [2.0] * 3},
        id="wall").transformed(np.asarray(Transform4.scale([2, 2, 1]).matrix))
    occ = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0.0, 0.0, 0.0]},
        id="occ").transformed(np.asarray(
            (Transform4.translate([0.6, 0, 1.5]) @
             Transform4.scale([0.5, 0.5, 1])).matrix))
    cam = Transform4.look_at(origin=[0, 0, 4], target=[0, 0, 0], up=[0, 1, 0])
    scene = build_scene([occ, wall], {
        "type": "perspective", "to_world": np.asarray(cam.matrix),
        "fov": 35.0})
    occ_rows = np.nonzero(np.asarray(scene.prim_shape) == 0)[0]
    return scene, jnp.asarray(occ_rows)


def _translated(scene, occ_rows, theta):
    shift = jnp.stack([theta, jnp.zeros_like(theta), jnp.zeros_like(theta)])
    return scene.replace(prim_p0=scene.prim_p0.at[occ_rows].add(shift))


def test_forward_value_matches_plain_direct():
    """The reparameterization must not change the primal image."""
    scene, _ = _occluder_scene()
    a = np.asarray(render_direct_reparam(scene, CFG))
    b = np.asarray(render(scene, CFG.replace(max_depth=1)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def _shadow_scene():
    """Depth-2 boundary case (VERDICT.md round-2 item 6): the camera sees
    only a diffuse floor; a small occluder between the floor and an area
    light casts a shadow whose edge moves with the occluder — the
    visibility discontinuity lives in the NEE/BSDF directions at the
    SECOND path vertex, invisible to primary-only reparameterization."""
    floor = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0.8] * 3},
        id="floor").transformed(np.asarray(
            (Transform4.translate([0, 0, 0]) @
             Transform4.rotate([1, 0, 0], -90) @
             Transform4.scale([2, 2, 1])).matrix))
    # occluder spans x in [0.35, 0.85] at y=1: floor points shadow when
    # (x + 0.25)/2 lands on it -> shadow for x >= 0.45, a boundary inside
    # the camera's view of the floor (x in ~[0, 0.5])
    occ = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0.0] * 3},
        id="occ").transformed(np.asarray(
            (Transform4.translate([0.6, 1.0, 0]) @
             Transform4.rotate([1, 0, 0], -90) @
             Transform4.scale([0.25, 0.25, 1])).matrix))
    light = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0] * 3},
        emitter={"type": "area", "radiance": [30.0] * 3},
        id="light").transformed(np.asarray(
            (Transform4.translate([0.25, 2.0, 0]) @
             Transform4.rotate([1, 0, 0], 90) @
             Transform4.scale([0.12, 0.12, 1])).matrix))
    # camera floats just above the floor, under the occluder, looking down
    cam = Transform4.look_at(origin=[0.15, 0.55, 0.0],
                             target=[0.25, 0.0, 0.0], up=[0, 0, 1])
    scene = build_scene([occ, floor, light], {
        "type": "perspective", "to_world": np.asarray(cam.matrix),
        "fov": 50.0})
    occ_rows = np.nonzero(np.asarray(scene.prim_shape) == 0)[0]
    return scene, jnp.asarray(occ_rows)


def test_depth2_shadow_boundary_gradient():
    """Occluder-translation gradient through a SECOND-vertex visibility
    boundary: the full path integrator with config.reparam=True must
    recover the FD boundary term that plain AD misses."""
    scene, occ_rows = _shadow_scene()
    cfg = mi.RenderConfig(width=24, height=24, spp=16, spp_per_pass=16,
                          max_depth=2)

    def loss(theta, reparam):
        s = _translated(scene, occ_rows, theta)
        img = render(s, cfg.replace(reparam=reparam))
        return jnp.mean(img)

    eps = 0.04
    fd = (float(loss(jnp.float32(eps), False)) -
          float(loss(jnp.float32(-eps), False))) / (2 * eps)
    assert abs(fd) > 1e-3, "no depth-2 boundary sensitivity in the scene?"

    ad_plain = float(jax.grad(loss)(jnp.float32(0.0), False))
    ad_rep = float(jax.grad(loss)(jnp.float32(0.0), True))

    assert abs(ad_plain) < 0.25 * abs(fd), (ad_plain, fd)
    assert np.sign(ad_rep) == np.sign(fd), (ad_rep, fd)
    assert 0.4 * abs(fd) < abs(ad_rep) < 2.5 * abs(fd), (ad_rep, fd)


def test_reparam_forward_value_unchanged():
    """config.reparam must not change the primal render."""
    scene, _ = _shadow_scene()
    cfg = mi.RenderConfig(width=16, height=16, spp=4, spp_per_pass=4,
                          max_depth=3)
    a = np.asarray(render(scene, cfg))
    b = np.asarray(render(scene, cfg.replace(reparam=True)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_occluder_translation_gradient():
    scene, occ_rows = _occluder_scene()

    def loss_reparam(theta):
        s = _translated(scene, occ_rows, theta)
        return jnp.mean(render_direct_reparam(s, CFG))

    def loss_plain(theta):
        s = _translated(scene, occ_rows, theta)
        return jnp.mean(render(s, CFG.replace(max_depth=1)))

    # finite differences of the true boundary term (deterministic seeds)
    eps = 0.03
    fd = (float(loss_plain(jnp.float32(eps))) -
          float(loss_plain(jnp.float32(-eps)))) / (2 * eps)
    assert abs(fd) > 1e-3, "test scene has no boundary sensitivity?"

    ad_plain = float(jax.grad(loss_plain)(jnp.float32(0.0)))
    ad_rep = float(jax.grad(loss_reparam)(jnp.float32(0.0)))

    # plain AD misses (almost all of) the boundary term
    assert abs(ad_plain) < 0.25 * abs(fd)
    # reparameterized AD recovers it: right sign, right magnitude
    assert np.sign(ad_rep) == np.sign(fd)
    assert 0.5 * abs(fd) < abs(ad_rep) < 2.0 * abs(fd), (ad_rep, fd)

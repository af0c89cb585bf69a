"""Distributed-layer equivalence tests on the virtual 8-device CPU mesh.

SURVEY.md §4 "multi-host without a pod": conftest.py forces
--xla_force_host_platform_device_count=8, so shard_map + psum run through
the real collective lowering. The determinism contract under test
(dist/sharding.py): devices draw from the same global lane space via
lane offsets, so an N-device render computes bit-identical per-sample
values to the single-device render — images and adjoint gradients must
agree to fp-summation-order noise.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.diff import adjoint as adjoint_mod
from mitsuba2_tpu.dist import checkpoint as ckpt_mod
from mitsuba2_tpu.dist.sharding import (make_mesh, render_and_grad_sharded,
                                        render_pass_sharded, render_sharded,
                                        train_step_sharded)
from mitsuba2_tpu.render.integrators import render, render_pass
from mitsuba2_tpu.scene.presets import cornell_box


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(jax.devices()[:8])


CFG = mi.RenderConfig(width=32, height=32, spp=16, spp_per_pass=16,
                      max_depth=3)


def test_render_pass_sharded_matches_single(scene, mesh):
    seed = jnp.uint32(7)
    img_1, w_1 = render_pass(scene, CFG, seed)
    img_8, w_8 = render_pass_sharded(scene, CFG, seed, mesh)
    # same samples, different summation order
    np.testing.assert_allclose(np.asarray(img_8), np.asarray(img_1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(w_8), np.asarray(w_1),
                               rtol=2e-5, atol=2e-5)


def test_render_sharded_matches_single(scene, mesh):
    img_1 = render(scene, CFG, seed=3)
    img_8 = render_sharded(scene, CFG, mesh=mesh, seed=3)
    np.testing.assert_allclose(np.asarray(img_8), np.asarray(img_1),
                               rtol=2e-4, atol=2e-5)


def test_sharded_adjoint_grads_match_single(scene, mesh):
    cfg = CFG.replace(spp=8, spp_per_pass=8)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)

    def loss_fn(img):
        return jnp.mean((img - target) ** 2)

    img_1, loss_1, g_1 = adjoint_mod.render_and_grad(scene, cfg, loss_fn,
                                                     seed=5)
    img_8, loss_8, g_8 = render_and_grad_sharded(scene, cfg, loss_fn, mesh,
                                                 seed=5)
    np.testing.assert_allclose(float(loss_8), float(loss_1), rtol=1e-4)
    assert set(g_1.keys()) == set(g_8.keys())
    for k in g_1:
        np.testing.assert_allclose(np.asarray(g_8[k]), np.asarray(g_1[k]),
                                   rtol=5e-4, atol=1e-6,
                                   err_msg=f"grad mismatch for {k}")


def test_train_step_sharded_full_adjoint(scene, mesh):
    cfg = CFG.replace(spp=8, spp_per_pass=8)
    target = render(scene, cfg, seed=11) * 0.5
    s, opt_state, loss0, _ = train_step_sharded(scene, cfg, target, 1, mesh)
    losses = [float(loss0)]
    for i in range(2, 5):
        s, opt_state, loss, _ = train_step_sharded(s, cfg, target, i, mesh,
                                                   opt_state=opt_state)
        losses.append(float(loss))
    assert int(opt_state["step"]) == 4
    assert losses[-1] < losses[0], losses  # optimization makes progress
    # updates touched the full diff-table set, not just mat_data
    assert float(jnp.abs(s.mat_data - scene.mat_data).max()) > 0
    assert float(jnp.abs(s.emitter_data - scene.emitter_data).max()) > 0


def test_checkpoint_resume_equivalence(scene, mesh, tmp_path):
    """Mid-optimization checkpoint/restore must reproduce the uninterrupted
    run exactly (VERDICT.md round-2 item 3c)."""
    cfg = CFG.replace(spp=8, spp_per_pass=8)
    target = jnp.zeros((32, 32, 3), jnp.float32)

    # uninterrupted: 3 steps
    s_a, opt_a = scene, None
    for i in range(3):
        s_a, opt_a, loss_a, _ = train_step_sharded(s_a, cfg, target, i, mesh,
                                                   opt_state=opt_a)

    # interrupted after 2 steps: checkpoint, reload, continue
    s_b, opt_b = scene, None
    for i in range(2):
        s_b, opt_b, _, _ = train_step_sharded(s_b, cfg, target, i, mesh,
                                              opt_state=opt_b)
    path = os.path.join(tmp_path, "opt.npz")
    state = {"tables": adjoint_mod.diff_tables(s_b), "opt": opt_b}
    ckpt_mod.save(path, state, step=2)
    restored, step, _ = ckpt_mod.load(path, like=state)
    assert step == 2
    s_c = adjoint_mod.with_tables(scene, restored["tables"])
    s_c, opt_c, loss_c, _ = train_step_sharded(s_c, cfg, target, 2, mesh,
                                               opt_state=restored["opt"])

    np.testing.assert_allclose(np.asarray(s_c.mat_data),
                               np.asarray(s_a.mat_data), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(loss_c), float(loss_a), rtol=1e-5)


def test_pallas_kernel_under_shard_map():
    """The big-scene traversal kernels (incl. the MXU cluster path) must
    compose with shard_map — the multi-chip big-scene render rides
    pallas_call inside per-device shards (SURVEY.md §2.6 P5)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from mitsuba2_tpu.core.vec import Vec3
    from mitsuba2_tpu.kernels import traverse_pallas as tp
    from mitsuba2_tpu.scene.presets import mesh_gallery

    scene = mesh_gallery(subdiv=1)
    rng = np.random.default_rng(3)
    n = 4096
    o = rng.uniform(-1, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*map(jnp.asarray, o.T))
    dv = Vec3(*map(jnp.asarray, d.T))
    tm = jnp.full(n, jnp.inf)

    mesh = Mesh(np.array(jax.devices()), ("rays",))
    old = tp.MXU_LEAVES
    try:
        tp.MXU_LEAVES = True

        def local(sc, ox, oy, oz, dx, dy, dz, t):
            return tp.ray_intersect_preliminary(
                sc, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t,
                interpret=True)[0]

        f = shard_map(local, mesh=mesh, in_specs=(P(),) + (P("rays"),) * 7,
                      out_specs=P("rays"), check_vma=False)
        t_sh = jax.jit(f)(scene, ov.x, ov.y, ov.z, dv.x, dv.y, dv.z, tm)
        t_un = tp.ray_intersect_preliminary(scene, ov, dv, tm,
                                            interpret=True)[0]
    finally:
        tp.MXU_LEAVES = old
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_un),
                               rtol=1e-5, atol=1e-6)


def test_sharded_heterogeneous_volpath_matches_single(mesh):
    """The delta-tracking while_loop's trip count is a per-shard
    wavefront max; the tracking draws therefore come from a FORKED
    per-lane stream (volpath._sample_free_flight) so the main sampler
    advances by a fixed amount per flight — this is what keeps the
    N-device render bit-identical to the 1-device render on
    heterogeneous-media scenes (the fork regression would show up ONLY
    here)."""
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.scene.scene import build_scene

    cube = shapes.cube(bsdf={"type": "null"}, id="vol").transformed(
        np.asarray((Transform4.scale([1.5, 1.5, 0.5])).matrix))
    rng = np.random.default_rng(5)
    cube.interior = {"type": "heterogeneous", "sigma_t": 1.0,
                     "albedo": 0.6,
                     "density": rng.uniform(
                         0.2, 1.0, (4, 4, 4)).astype(np.float32),
                     "bbox_min": [-1.5, -1.5, -0.5],
                     "bbox_max": [1.5, 1.5, 0.5]}
    wall = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0.4] * 3},
        emitter={"type": "area", "radiance": [2.0] * 3},
        id="wall").transformed(
        np.asarray(Transform4.translate([0, 0, -2.0]).matrix))
    cam = Transform4.look_at(origin=[0, 0, 4], target=[0, 0, 0],
                             up=[0, 1, 0])
    vscene = build_scene([cube, wall],
                         {"type": "perspective",
                          "to_world": np.asarray(cam.matrix), "fov": 30.0})
    vcfg = CFG.replace(spp=8, spp_per_pass=8, integrator="volpath",
                       max_depth=3)
    img_1 = render(vscene, vcfg, seed=4)
    img_8 = render_sharded(vscene, vcfg, mesh=mesh, seed=4)
    np.testing.assert_allclose(np.asarray(img_8), np.asarray(img_1),
                               rtol=2e-4, atol=2e-5)

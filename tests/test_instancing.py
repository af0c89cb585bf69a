"""Shared-BLAS instancing (shapes.Instance / bvh.build_two_level).

The OptiX-IAS analog (src/shapes/{shapegroup,instance}.cpp; design:
docs/TPU_TRAVERSAL.md "true shared-BLAS instancing"): K instances of an
M-prim group store the geometry ONCE; the traversal kernels re-derive
rays into instance space at instance boundaries. Oracle ladder: the
round-2 FLATTENED build (duplicated world-space prims, plain BVH) is the
reference; the per-lane jnp instanced walker must match it, and the
Pallas instanced kernels (interpret mode) must match the jnp walker.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Ray, Transform4
from mitsuba2_tpu.core.vec import Vec3
from mitsuba2_tpu.kernels import traverse_jnp, traverse_pallas
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene, ray_intersect, ray_test


def _T(m):
    return np.asarray(m.matrix)


def _mats(n=5):
    return [_T(Transform4.translate([x * 3.0, 0, 0])
               @ Transform4.rotate([0, 1, 0], 30.0 * x)
               @ Transform4.scale([0.6] * 3)) for x in range(n)]


def _group():
    return shapes.shapegroup([
        shapes.cube(bsdf={"type": "diffuse"}),
        shapes.sphere(center=(0, 1.5, 0), radius=0.4,
                      bsdf={"type": "roughconductor"}),
    ])


def _sensor():
    return {"type": "perspective",
            "to_world": _T(Transform4.look_at(
                origin=[6, 2, 9], target=[6, 0, 0], up=[0, 1, 0])),
            "fov": 60}


_EM = [{"type": "constant", "radiance": [1.0, 1.0, 1.0]}]


@pytest.fixture(autouse=True)
def _force_shared_blas(monkeypatch):
    """The auto policy FLATTENS small instanced scenes (hardware phase 5:
    flatten+MXU ~9-60x the shared-BLAS scalar walk — scene.py
    _should_flatten_instances). These tests exercise the shared-BLAS
    machinery itself, so force it on."""
    monkeypatch.setenv("MI_FLATTEN_INSTANCES", "0")


def test_instanced_mxu_matches_scalar_instanced(monkeypatch):
    """The instanced MXU cluster walk (TLAS + per-group cut trees,
    LOCAL-space cluster matmuls, per-entry ray-matrix rebuild) must agree
    with the scalar instanced kernels on a triangle-only instanced scene:
    same hit masks, same (prim, inst) winners up to equidistant ties,
    same t to the plane-form envelope, identical occlusion masks."""
    from mitsuba2_tpu.scene.presets import instanced_field
    scene = instanced_field(n=6, subdiv=2)
    assert scene.has_instances and scene.inst_mxu_fuel > 0
    assert not scene.has_spheres

    rng = np.random.default_rng(23)
    n = 4096
    lo = np.asarray(scene.bvh_min)[0]
    hi = np.asarray(scene.bvh_max)[0]
    o = rng.uniform(lo - 0.5, hi + 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*map(jnp.asarray, o.T))
    dv = Vec3(*map(jnp.asarray, d.T))
    tm = jnp.full(n, jnp.inf)
    tocc = jnp.full(n, 3.0)

    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)
    t_m, p_m, _, _, i_m = traverse_pallas.ray_intersect_instanced(
        scene, ov, dv, tm, interpret=True)
    occ_m = traverse_pallas.ray_test_instanced(scene, ov, dv, tocc,
                                               interpret=True)
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", False)
    t_s, p_s, _, _, i_s = traverse_pallas.ray_intersect_instanced(
        scene, ov, dv, tm, interpret=True)
    occ_s = traverse_pallas.ray_test_instanced(scene, ov, dv, tocc,
                                               interpret=True)

    t_m, t_s = np.asarray(t_m), np.asarray(t_s)
    hit_m, hit_s = np.isfinite(t_m), np.isfinite(t_s)
    np.testing.assert_array_equal(hit_m, hit_s)
    assert hit_s.sum() > n // 8, "degenerate test: too few hits"
    np.testing.assert_allclose(t_m[hit_m], t_s[hit_s], rtol=1e-3,
                               atol=1e-5)
    same = (np.asarray(p_m) == np.asarray(p_s)) & \
           (np.asarray(i_m) == np.asarray(i_s))
    assert same[hit_s].mean() > 0.995        # equidistant ties only
    np.testing.assert_array_equal(np.asarray(occ_m), np.asarray(occ_s))


def test_instanced_mxu_end_to_end_render(monkeypatch):
    """Full render parity: instanced MXU walk vs scalar instanced kernels
    through the whole pipeline (NEE shadows + bounces + shading world
    lift) — z-equivalence on the instancing stress scene."""
    from mitsuba2_tpu.render.integrators import render
    from mitsuba2_tpu.scene.presets import instanced_field
    scene = instanced_field(n=6, subdiv=2)
    cfg = mi.RenderConfig(width=24, height=24, spp=8, spp_per_pass=8,
                          max_depth=2)
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", True)
    a = np.asarray(render(scene, cfg, seed=3))
    monkeypatch.setattr(traverse_pallas, "MXU_LEAVES", False)
    b = np.asarray(render(scene, cfg, seed=3))
    assert np.isfinite(a).all()
    # same sampler decisions; only the intersector's t envelope differs
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)


def test_auto_policy_flattens_small_scenes(monkeypatch):
    """auto mode flattens instanced scenes under MI_FLATTEN_MAX effective
    prims (the measured-faster arrangement) and preserves the image; the
    cap forces shared-BLAS for scenes too big to duplicate."""
    from mitsuba2_tpu.render.integrators import render
    grp = _group()
    mk = lambda: [shapes.rectangle(bsdf={"type": "diffuse"}).transformed(
        _T(Transform4.translate([0, 0, -2]) @ Transform4.scale([20, 20, 1])))
    ] + [shapes.instance(grp, m) for m in _mats()]

    monkeypatch.setenv("MI_FLATTEN_INSTANCES", "auto")
    s_auto = build_scene(mk(), _sensor(), _EM)
    assert not s_auto.has_instances          # policy flattened it

    monkeypatch.setenv("MI_FLATTEN_MAX", "4")  # below the scene's prims
    s_big = build_scene(mk(), _sensor(), _EM)
    assert s_big.has_instances               # cap keeps shared-BLAS
    monkeypatch.delenv("MI_FLATTEN_MAX")

    monkeypatch.setenv("MI_FLATTEN_INSTANCES", "0")
    s_shared = build_scene(mk(), _sensor(), _EM)
    assert s_shared.has_instances

    cfg = mi.RenderConfig(width=24, height=24, spp=8, spp_per_pass=8,
                          max_depth=2)
    a = np.asarray(render(s_auto, cfg, seed=3))
    b = np.asarray(render(s_shared, cfg, seed=3))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def _scenes():
    grp = _group()
    floor = shapes.rectangle(bsdf={"type": "diffuse"}).transformed(
        _T(Transform4.translate([0, 0, -2]) @ Transform4.scale([20, 20, 1])))
    inst = [shapes.instance(grp, m) for m in _mats()]
    flat = sum((shapes.instance(grp, m, flatten=True) for m in _mats()), [])
    s_i = build_scene([floor] + inst, _sensor(), _EM)
    s_f = build_scene([floor] + flat, _sensor(), _EM)
    return s_i, s_f


def _rays(n=8192, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform([-3, -3, -4], [16, 4, 10], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*[jnp.asarray(o[:, k]) for k in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, k]) for k in range(3)])
    return ov, dv


def _ray(ov, dv, maxt):
    n = ov.x.shape[0]
    return Ray(o=ov, d=dv, maxt=jnp.full(n, maxt, jnp.float32),
               time=jnp.zeros(n))


def test_shared_blas_saves_memory():
    s_i, s_f = _scenes()
    assert s_i.has_instances and not s_f.has_instances
    # 2 floor tris + 12 cube tris + 1 sphere shared vs 5x duplicated
    assert s_i.n_prims == 15 and s_f.n_prims == 67
    assert s_i.inst_inv.shape[0] == 6  # world + 5 instances


def test_instanced_matches_flattened_interactions():
    """Full shading records (t, p, shading normal, uv, material) agree
    with the flattened oracle through rotation + scale instances."""
    s_i, s_f = _scenes()
    ov, dv = _rays()
    si_i = ray_intersect(s_i, _ray(ov, dv, np.inf))
    si_f = ray_intersect(s_f, _ray(ov, dv, np.inf))
    vi, vf = np.asarray(si_i.valid), np.asarray(si_f.valid)
    assert (vi == vf).mean() > 0.999  # fp-boundary lanes only
    both = vi & vf
    for a, b, tol in [(si_i.t, si_f.t, 2e-3),
                      (si_i.p.x, si_f.p.x, 2e-3),
                      (si_i.p.z, si_f.p.z, 2e-3),
                      (si_i.n.x, si_f.n.x, 2e-3),
                      (si_i.n.y, si_f.n.y, 2e-3),
                      (si_i.uv.x, si_f.uv.x, 2e-3),
                      (si_i.uv.y, si_f.uv.y, 2e-3)]:
        np.testing.assert_allclose(np.asarray(a)[both],
                                   np.asarray(b)[both], atol=tol)
    # per-lane material routing survives the instance indirection
    mt_i = np.asarray(si_i.shape)[both]
    mt_f = np.asarray(si_f.shape)[both]
    mat_i = np.asarray(s_i.shape_mat)[mt_i]
    mat_f = np.asarray(s_f.shape_mat)[mt_f]
    ty_i = np.asarray(s_i.mat_type)[mat_i]
    ty_f = np.asarray(s_f.mat_type)[mat_f]
    assert (ty_i == ty_f).all()


def test_instanced_anyhit_matches_flattened():
    s_i, s_f = _scenes()
    ov, dv = _rays(seed=1)
    occ_i = np.asarray(ray_test(s_i, _ray(ov, dv, 5.0)))
    occ_f = np.asarray(ray_test(s_f, _ray(ov, dv, 5.0)))
    assert (occ_i == occ_f).mean() > 0.999


def test_pallas_instanced_matches_jnp_oracle():
    """Interpret-mode Pallas instanced kernels == per-lane jnp walker
    (exact prim/instance ids, t to fp tolerance)."""
    s_i, _ = _scenes()
    ov, dv = _rays(n=4096, seed=2)
    tj, pj, uj, vj, ij = traverse_jnp._ray_intersect_instanced(
        s_i, ov, dv, jnp.inf)
    tp, pp, up, vp, ip = traverse_pallas.ray_intersect_instanced(
        s_i, ov, dv, jnp.inf, interpret=True)
    tj, tp = np.asarray(tj), np.asarray(tp)
    assert (np.isfinite(tj) == np.isfinite(tp)).all()
    both = np.isfinite(tj)
    assert (np.asarray(pj)[both] == np.asarray(pp)[both]).all()
    assert (np.asarray(ij)[both] == np.asarray(ip)[both]).all()
    np.testing.assert_allclose(tj[both], tp[both], rtol=1e-5)

    oj = np.asarray(traverse_jnp._ray_test_instanced(
        s_i, ov, dv, jnp.asarray(5.0)))
    op = np.asarray(traverse_pallas.ray_test_instanced(
        s_i, ov, dv, jnp.full(4096, 5.0, jnp.float32), interpret=True))
    assert (oj == op).all()


def test_instanced_render_matches_flattened():
    """End-to-end MC render parity: same camera rays, same per-lane
    sampler streams — only intersection fp differs, so the images agree
    to a tight tolerance."""
    s_i, s_f = _scenes()
    cfg = mi.RenderConfig(width=48, height=48, spp=16, spp_per_pass=16,
                          max_depth=3)
    img_i = np.asarray(mi.render(s_i, cfg))
    img_f = np.asarray(mi.render(s_f, cfg))
    assert np.isfinite(img_i).all()
    # a handful of fp-boundary lanes may diverge onto different paths;
    # compare robustly: 99.5th percentile of the abs difference
    diff = np.abs(img_i - img_f)
    assert np.quantile(diff, 0.995) < 5e-3, diff.max()
    np.testing.assert_allclose(img_i.mean(), img_f.mean(), rtol=0.01)


def test_dict_loader_instancing():
    scene, cfg = mi.load_dict({
        "type": "scene",
        "grp": {"type": "shapegroup",
                "ball": {"type": "sphere", "radius": 0.5,
                         "bsdf": {"type": "diffuse"}}},
        "left": {"type": "instance", "shapegroup": "grp",
                 "to_world": np.asarray(
                     Transform4.translate([-1.2, 0, 0]).matrix)},
        "right": {"type": "instance", "shapegroup": "grp",
                  "to_world": np.asarray(
                      Transform4.translate([1.2, 0, 0]).matrix)},
        "sky": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        "cam": {"type": "perspective", "fov": 45.0,
                "to_world": np.asarray(Transform4.look_at(
                    origin=[0, 0, 6], target=[0, 0, 0],
                    up=[0, 1, 0]).matrix),
                "film": {"type": "hdrfilm", "width": 16, "height": 16},
                "sampler": {"type": "independent", "sample_count": 8}},
    })
    assert scene.has_instances and scene.n_prims == 1
    img = np.asarray(mi.render(scene, cfg))
    assert np.isfinite(img).all()
    left, right = img[:, :8].mean(), img[:, 8:].mean()
    assert abs(left - right) < 0.05


def test_instancing_rejections():
    grp_emit = shapes.shapegroup([shapes.sphere(
        emitter={"type": "area", "radiance": [1, 1, 1]})])
    with pytest.raises(ValueError, match="emitters inside"):
        build_scene([shapes.instance(grp_emit, None)], _sensor(), _EM)

    grp_sph = shapes.shapegroup([shapes.sphere(bsdf={"type": "diffuse"})])
    aniso = _T(Transform4.scale([2.0, 1.0, 1.0]))
    with pytest.raises(ValueError, match="uniform-scale"):
        build_scene([shapes.instance(grp_sph, aniso)], _sensor(), _EM)

    nested = shapes.shapegroup([shapes.instance(grp_sph, None)])
    with pytest.raises(ValueError, match="nested"):
        build_scene([shapes.instance(nested, None)], _sensor(), _EM)

    from mitsuba2_tpu.scene import scene as scene_mod
    s_i, _ = _scenes()
    scene_mod.set_backend("brute")
    try:
        with pytest.raises(ValueError, match="brute"):
            ov, dv = _rays(n=256)
            ray_intersect(s_i, _ray(ov, dv, np.inf))
    finally:
        scene_mod.set_backend("auto")


def test_instanced_adjoint_grads_finite():
    """The two-phase adjoint runs on instanced scenes (material/emitter
    gradients through the instance-aware intersection + world-lift)."""
    s_i, _ = _scenes()
    cfg = mi.RenderConfig(width=16, height=16, spp=8, spp_per_pass=8,
                          max_depth=2)
    target = np.zeros((16, 16, 3), np.float32)
    img, loss, grads = mi.render_l2_grad(s_i, cfg, target, seed=0)
    assert np.isfinite(np.asarray(loss))
    assert np.isfinite(np.asarray(grads["mat_data"])).all()
    assert float(np.abs(np.asarray(grads["mat_data"])).max()) > 0


def test_instanced_render_sharded_matches_single():
    """Instanced scene under the 8-virtual-device mesh == single device
    (the scene pytree incl. instance tables replicates cleanly)."""
    import jax
    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs the 8-virtual-device mesh")
    from mitsuba2_tpu.dist.sharding import make_mesh, render_sharded
    s_i, _ = _scenes()
    cfg = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                          max_depth=2)
    single = np.asarray(mi.render(s_i, cfg, seed=3))
    mesh = make_mesh()
    sharded = np.asarray(render_sharded(s_i, cfg, mesh, seed=3))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)

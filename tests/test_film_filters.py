"""Reconstruction filters + mesh-light CDF sampling coverage."""
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene


def _const_scene():
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    return build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [0.5] * 3})],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 20.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])


@pytest.mark.parametrize("rfilter", ["tent", "gaussian", "mitchell",
                                     "catmullrom", "lanczos"])
def test_filters_preserve_constant_image(rfilter):
    """Any normalized reconstruction filter must reproduce a constant
    radiance field exactly after develop (partition of unity)."""
    scene = _const_scene()
    cfg = mi.RenderConfig(width=16, height=16, spp=32, spp_per_pass=32,
                          max_depth=2, rr_depth=99, rfilter=rfilter)
    img = np.asarray(render(scene, cfg, seed=1))
    interior = img[4:12, 4:12]  # borders lose taps by construction
    # the plane fills the 20-deg view; interior must be flat at 0.5
    assert abs(interior.mean() - 0.5) < 0.01
    assert interior.std() < 0.03


def test_big_mesh_light_cdf_bisection():
    """A mesh emitter with >16 prims exercises the per-lane CDF bisection
    branch of _sample_area; its illumination must match the analytic
    sphere emitter of the same shape."""
    def sphere_mesh(n=12):
        th = np.linspace(0, np.pi, n)
        ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        T, P = np.meshgrid(th, ph, indexing="ij")
        V = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                      np.cos(T)], -1).reshape(-1, 3) * 0.3
        V = V + np.array([0, 0, 2.0])
        F = []
        for i in range(n - 1):
            for j in range(2 * n):
                a = i * 2 * n + j
                b = i * 2 * n + (j + 1) % (2 * n)
                c = (i + 1) * 2 * n + j
                d = (i + 1) * 2 * n + (j + 1) % (2 * n)
                F += [[a, c, b], [b, c, d]]  # outward winding
        return shapes.mesh(V.astype(np.float32), np.asarray(F, np.int32),
                           bsdf={"type": "null"},
                           emitter={"type": "area", "radiance": [5.0] * 3})

    cam = Transform4.look_at(origin=[0, -3, 0.5], target=[0, 0, 0],
                             up=[0, 0, 1])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix),
              "fov": 45.0}
    floor = shapes.rectangle(bsdf={"type": "diffuse",
                                   "reflectance": [0.7] * 3})
    mesh_scene = build_scene([floor, sphere_mesh()], sensor)
    sph_scene = build_scene(
        [floor, shapes.sphere(center=[0, 0, 2.0], radius=0.3,
                              bsdf={"type": "null"},
                              emitter={"type": "area", "radiance": [5.0] * 3})],
        sensor)
    n_emitter_prims = int((np.asarray(mesh_scene.emitter_prims) >= 0).sum())
    assert n_emitter_prims > 16  # bisection branch active

    cfg = mi.RenderConfig(width=16, height=16, spp=128, spp_per_pass=64,
                          max_depth=2, rr_depth=99)
    a = np.asarray(render(mesh_scene, cfg))
    b = np.asarray(render(sph_scene, cfg))
    m = a[4:12, 4:12].mean(), b[4:12, 4:12].mean()
    assert abs(m[0] - m[1]) / max(m[1], 1e-6) < 0.08, m

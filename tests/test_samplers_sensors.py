"""Sampler variance + meter/distant sensor + projector emitter tests
(mirrors src/samplers/tests, src/sensors/tests, src/emitters/tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.render.sampler import make_sampler
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["stratified", "ldsampler"])
def test_sampler_uniform_marginals(kind):
    """Each dimension must stay uniform on [0,1) (unbiasedness)."""
    n_pix, spp = 64, 16
    lane = jnp.arange(n_pix * spp, dtype=jnp.uint32)
    s = make_sampler(kind, 7, lane, n_pix, spp)
    for _ in range(3):
        u, s = s.next_1d()
        u = np.asarray(u)
        assert (u >= 0).all() and (u < 1).all()
        # mean/std of uniform: 0.5 / sqrt(1/12)
        assert abs(u.mean() - 0.5) < 0.02
        assert abs(u.std() - np.sqrt(1 / 12)) < 0.02


def test_stratified_covers_strata():
    """Per (pixel, dim) all spp strata are hit exactly once."""
    n_pix, spp = 8, 16
    lane = jnp.arange(n_pix * spp, dtype=jnp.uint32)
    s = make_sampler("stratified", 3, lane, n_pix, spp)
    u, _ = s.next_1d()
    u = np.asarray(u).reshape(spp, n_pix)
    for p in range(n_pix):
        strata = np.sort(np.floor(u[:, p] * spp).astype(int))
        np.testing.assert_array_equal(strata, np.arange(spp))


def _direct_scene():
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    return build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [0.8] * 3})],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 45.0},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])


@pytest.mark.parametrize("kind", ["stratified", "ldsampler"])
def test_sampler_variance_reduction(kind):
    sc = _direct_scene()
    base = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16,
                           max_depth=2, rr_depth=99)
    ref = np.asarray(render(sc, base.replace(spp=512, spp_per_pass=64),
                            seed=99))
    def mse(cfg):
        errs = [np.mean((np.asarray(render(sc, cfg, seed=s)) - ref) ** 2)
                for s in range(4)]
        return np.mean(errs)
    m_ind = mse(base)
    m_k = mse(base.replace(sampler=kind))
    assert m_k < m_ind, f"{kind} did not reduce variance ({m_k} vs {m_ind})"


# ---------------------------------------------------------------------------
# Meter sensors
# ---------------------------------------------------------------------------

def test_radiancemeter_reads_emitter():
    """Radiance meter aimed at a diffuse plane under constant light reads
    the plane's reflected radiance = albedo * L (depth 2, white furnace
    logic on one bounce)."""
    cam = Transform4.look_at(origin=[0, 0, 2], target=[0, 0, 0], up=[0, 1, 0])
    sc = build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [0.6] * 3})],
        {"type": "radiancemeter", "to_world": np.asarray(cam.matrix)},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    img = np.asarray(render(sc, mi.RenderConfig(width=1, height=1, spp=512,
                                                spp_per_pass=512, max_depth=2,
                                                rr_depth=99)))
    np.testing.assert_allclose(img.mean(), 0.6, atol=0.02)


def test_irradiancemeter_constant_env():
    """Meter on a surface inside constant radiance L: E = pi * L."""
    cam = Transform4.look_at(origin=[0, 0, 0], target=[0, 0, 1], up=[0, 1, 0])
    sc = build_scene(
        [shapes.sphere(center=[0, 0, -50], radius=1.0)],  # out of the way
        {"type": "irradiancemeter", "to_world": np.asarray(cam.matrix)},
        emitters=[{"type": "constant", "radiance": [2.0] * 3}])
    img = np.asarray(render(sc, mi.RenderConfig(width=2, height=2, spp=1024,
                                                spp_per_pass=256, max_depth=2,
                                                rr_depth=99)))
    np.testing.assert_allclose(img.mean(), np.pi * 2.0, rtol=0.02)


def test_distant_sensor_sees_scene():
    """Distant sensor looking down +(-z): a bright plane fills the film
    where the bounding disk overlaps it."""
    cam = Transform4.look_at(origin=[0, 0, 5], target=[0, 0, 0], up=[0, 1, 0])
    sc = build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [0.9] * 3})],
        {"type": "distant", "to_world": np.asarray(cam.matrix)},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    img = np.asarray(render(sc, mi.RenderConfig(width=16, height=16, spp=32,
                                                spp_per_pass=32, max_depth=2,
                                                rr_depth=99)))
    c = img[6:10, 6:10].mean()
    assert c > 0.3  # center of the bounding disk hits the plane


# ---------------------------------------------------------------------------
# Projector emitter
# ---------------------------------------------------------------------------

def test_projector_projects_texture():
    """A red/green checker projector on a white plane: both colors appear,
    confined to the frustum."""
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    sc = build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [1.0] * 3})],
        {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 45.0},
        emitters=[{"type": "projector", "position": [0, 0, 2],
                   "direction": [0, 0, -1], "fov": 30.0,
                   "irradiance": {"type": "checkerboard",
                                  "color0": [40, 0, 0], "color1": [0, 40, 0]}}])
    img = np.asarray(render(sc, mi.RenderConfig(width=32, height=32, spp=32,
                                                spp_per_pass=32, max_depth=2,
                                                rr_depth=99)))
    assert (img[..., 0] > 4 * np.maximum(img[..., 1], 1e-3)).any()
    assert (img[..., 1] > 4 * np.maximum(img[..., 0], 1e-3)).any()
    # outside the 30-deg frustum at distance 2 (radius ~0.54): corners dark
    assert img[0, 0].max() < 0.05 * img[12:20, 12:20].max()


def test_projector_inverse_square():
    """Center-pixel irradiance falls off as 1/d^2 with projector distance."""
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])

    def scene_at(dz):
        return build_scene(
            [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [1.0] * 3})],
            {"type": "perspective", "to_world": np.asarray(cam.matrix),
             "fov": 45.0},
            emitters=[{"type": "projector", "position": [0, 0, dz],
                       "direction": [0, 0, -1], "fov": 60.0,
                       "irradiance": [10.0, 10.0, 10.0]}])
    cfg = mi.RenderConfig(width=8, height=8, spp=64, spp_per_pass=64,
                          max_depth=2, rr_depth=99)
    a = np.asarray(render(scene_at(1.0), cfg))[4, 4].mean()
    b = np.asarray(render(scene_at(2.0), cfg))[4, 4].mean()
    # pixel [4,4] sits slightly off-axis: the exact ratio is
    # (d2^2/d1^2) * (cos1/cos2) ~ 3.8, not 4.0
    assert 3.55 < a / b < 4.05, a / b


def test_near_far_clip():
    """projective_camera.cpp clip planes: near_clip cuts geometry in
    front of the plane (camera-z, not spherical), far_clip cuts beyond."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import render_any
    from mitsuba2_tpu.scene import loader
    xml = """<scene version="2.0.0">
      <sensor type="perspective">
        <float name="fov" value="30"/>{clip}
        <transform name="to_world">
          <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
        </transform>
        <film type="hdrfilm"><integer name="width" value="8"/>
        <integer name="height" value="8"/></film>
      </sensor>
      <shape type="rectangle"/>
      <shape type="rectangle">
        <transform name="to_world"><translate z="3"/></transform>
      </shape>
    </scene>"""
    cfgk = dict(integrator="depth", spp=4, spp_per_pass=4)
    # no clip: the z=3 wall (2 in front of the camera) is hit first
    s0, c0 = loader.load_string(xml.format(clip=""))
    d0 = np.asarray(render_any(s0, c0.replace(**cfgk)))
    np.testing.assert_allclose(d0[4, 4, 0], 2.0, rtol=1e-3)
    # near_clip=3 skips the near wall; the z=0 one (5 away) remains
    s1, c1 = loader.load_string(xml.format(
        clip='<float name="near_clip" value="3"/>'))
    d1 = np.asarray(render_any(s1, c1.replace(**cfgk)))
    np.testing.assert_allclose(d1[4, 4, 0] + 3.0, 5.0, rtol=1e-3)
    # far_clip=1 cuts everything
    s2, c2 = loader.load_string(xml.format(
        clip='<float name="far_clip" value="1"/>'))
    d2 = np.asarray(render_any(s2, c2.replace(**cfgk)))
    assert float(np.abs(d2).max()) == 0.0


def test_near_clip_with_scaled_to_world():
    """Clip planes measure along the NORMALIZED camera axis — a scale in
    to_world must not rescale near/far (regression)."""
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.render.integrators import render_any
    from mitsuba2_tpu.scene import loader
    xml = """<scene version="2.0.0">
      <sensor type="perspective">
        <float name="fov" value="30"/><float name="near_clip" value="3"/>
        <transform name="to_world">
          <scale value="2"/><lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
        </transform>
        <film type="hdrfilm"><integer name="width" value="8"/>
        <integer name="height" value="8"/></film>
      </sensor>
      <shape type="rectangle"><transform name="to_world">
        <translate z="3"/></transform></shape>
      <shape type="rectangle"/>
    </scene>"""
    s, c = loader.load_string(xml)
    d = np.asarray(render_any(s, c.replace(integrator="depth", spp=4,
                                           spp_per_pass=4)))
    np.testing.assert_allclose(d[4, 4, 0] + 3.0, 5.0, rtol=1e-3)

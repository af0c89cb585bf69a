"""Emitter tests: envmap importance sampling consistency (sample vs pdf —
the reference's chi²-style discipline), constant-envmap equivalence, spot
falloff, directional lighting, and sensor variants."""
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render import emitters as em
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene

CFG = mi.RenderConfig(width=16, height=16, spp=16, spp_per_pass=16, max_depth=2)


def _env_image(H=32, W=64, kind="gradient"):
    rng = np.random.default_rng(3)
    if kind == "gradient":
        v = np.linspace(0.05, 2.0, H)[:, None, None]
        img = np.broadcast_to(v, (H, W, 3)).copy()
        img[:, : W // 4, 0] *= 5.0  # a bright red stripe
        return img.astype(np.float32)
    return rng.uniform(0.01, 1.0, (H, W, 3)).astype(np.float32)


def test_envmap_sample_pdf_consistency():
    """MC estimate of ∫ pdf dω over the sphere must be 1 when sampling from
    the distribution itself (E[pdf/pdf] = 1), and eval_pdf must agree with
    the pdf returned by sample at the sampled locations."""
    env = em.build_envmap({"type": "envmap", "data": _env_image()})
    rng = np.random.default_rng(0)
    u2 = jnp.asarray(rng.uniform(size=(200_000, 2)), jnp.float32)
    uv, pdf_uv = env.distr.sample(u2)
    pdf_at = env.distr.eval_pdf(uv)
    a, b = np.asarray(pdf_uv), np.asarray(pdf_at)
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-6)
    # exact agreement except lanes landing exactly on a cell boundary
    assert (rel < 1e-3).mean() > 0.999
    # round-trip dir <-> uv
    d = em._envmap_uv_to_dir(env, uv)
    uv2 = em._envmap_dir_to_uv(env, d)
    np.testing.assert_allclose(np.asarray(uv.to_array()),
                               np.asarray(uv2.to_array()), atol=2e-3)


def test_envmap_importance_proportional_to_luminance():
    """Sampled density must be proportional to luminance * sin(theta)."""
    img = _env_image()
    env = em.build_envmap({"type": "envmap", "data": img})
    rng = np.random.default_rng(1)
    u2 = jnp.asarray(rng.uniform(size=(400_000, 2)), jnp.float32)
    uv, _ = env.distr.sample(u2)
    uv = np.asarray(uv.to_array())
    H, W = img.shape[:2]
    counts, _, _ = np.histogram2d(uv[:, 1], uv[:, 0], bins=[H, W],
                                  range=[[0, 1], [0, 1]])
    lum = img @ np.array([0.2126, 0.7152, 0.0722])
    expect = lum * np.sin((np.arange(H) + 0.5) / H * np.pi)[:, None]
    expect = expect / expect.sum() * counts.sum()
    # chi²-lite: relative error on well-populated cells
    mask = expect > 50
    rel = np.abs(counts[mask] - expect[mask]) / expect[mask]
    assert rel.mean() < 0.15


def _plane_scene(emitters_list, sensor_extra=None, bsdf=None):
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix),
              "fov": 45.0}
    if sensor_extra:
        sensor.update(sensor_extra)
    plane = shapes.rectangle(bsdf=bsdf or {"type": "diffuse",
                                           "reflectance": [0.8, 0.8, 0.8]})
    return build_scene([plane], sensor, emitters=emitters_list)


def test_uniform_envmap_matches_constant():
    """A constant-valued envmap must render like a `constant` emitter."""
    img = np.full((16, 32, 3), 0.7, np.float32)
    s_env = _plane_scene([{"type": "envmap", "data": img}])
    s_const = _plane_scene([{"type": "constant", "radiance": [0.7] * 3}])
    cfg = CFG.replace(spp=128, spp_per_pass=128)
    i_env = np.asarray(render(s_env, cfg))
    i_const = np.asarray(render(s_const, cfg))
    # both estimators are unbiased for the same integral (0.8 * 0.7 = 0.56 on
    # the plane); compare noise-averaged values
    np.testing.assert_allclose(i_env[6:10, 6:10].mean(),
                               i_const[6:10, 6:10].mean(), atol=0.01)
    np.testing.assert_allclose(i_env, i_const, atol=0.06)


def test_envmap_escaped_rays_show_image():
    img = np.zeros((8, 16, 3), np.float32)
    img[:, :, 2] = 3.0  # blue everywhere
    scene = _plane_scene([{"type": "envmap", "data": img}])
    imgout = np.asarray(render(scene, CFG))
    corner = imgout[0, 0]  # corner pixel sees past the plane -> envmap
    assert corner[2] > 2.0 and corner[0] < 0.5


def test_spot_falloff():
    """Spot pointing at the plane center: center lit, off-axis dark."""
    scene = _plane_scene([{"type": "spot", "position": [0, 0, 2],
                           "direction": [0, 0, -1], "intensity": [20] * 3,
                           "cutoff_angle": 15.0}])
    img = np.asarray(render(scene, CFG))
    c = img[8, 8].mean()
    edge = img[8, 1].mean()
    assert c > 0.2
    # 15 deg cutoff at distance 2 -> spot radius ~0.54 < plane half-extent 1
    assert edge < 0.05 * max(c, 1e-9)


def test_directional_lambert():
    """Directional light head-on vs at 60 deg: irradiance ratio = cos."""
    def scene_with_dir(d):
        return _plane_scene([{"type": "directional", "direction": d,
                              "irradiance": [1.0] * 3}])
    head_on = np.asarray(render(scene_with_dir([0, 0, -1]), CFG))[8, 8].mean()
    d60 = [np.sin(np.deg2rad(60)), 0, -np.cos(np.deg2rad(60))]
    slanted = np.asarray(render(scene_with_dir(d60), CFG))[8, 8].mean()
    np.testing.assert_allclose(slanted / head_on, 0.5, atol=0.05)


def test_thinlens_depth_of_field():
    """Aperture blurs out-of-focus geometry; zero aperture == perspective."""
    cam = Transform4.look_at(origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0])
    checker = {"type": "checkerboard", "color0": [0.9, 0.9, 0.9],
               "color1": [0.05, 0.05, 0.05],
               "to_uv": np.diag([8.0, 8.0, 1.0])}
    plane = shapes.rectangle(bsdf={"type": "diffuse", "reflectance": checker})

    def make(aperture):
        return build_scene([plane], {
            "type": "thinlens", "to_world": np.asarray(cam.matrix),
            "fov": 45.0, "aperture_radius": aperture, "focus_distance": 1.0},
            emitters=[{"type": "constant", "radiance": [1.0] * 3}])

    cfg = CFG.replace(spp=64, spp_per_pass=64, width=32, height=32)
    sharp = np.asarray(render(make(1e-5), cfg))
    blurred = np.asarray(render(make(0.3), cfg))
    # plane is at distance 3, focus at 1 -> strongly defocused: contrast drops
    def contrast(im):
        c = im[8:24, 8:24].mean(-1)
        return c.std()
    assert contrast(blurred) < 0.5 * contrast(sharp)


def test_orthographic_parallel_rays():
    """Orthographic: the plane fills the film regardless of distance."""
    cam = (Transform4.look_at(origin=[0, 0, 5], target=[0, 0, 0], up=[0, 1, 0])
           @ Transform4.scale([0.5, 0.5, 1.0]))
    scene = build_scene(
        [shapes.rectangle(bsdf={"type": "diffuse", "reflectance": [0.9] * 3})],
        {"type": "orthographic", "to_world": np.asarray(cam.matrix)},
        emitters=[{"type": "constant", "radiance": [1.0] * 3}])
    img = np.asarray(render(scene, CFG))
    # ortho half-extent 0.5 < plane half-extent 1 -> every pixel hits the plane
    assert (img.mean(-1) > 0.05).all()


def test_flipped_sphere_emitter_nee_consistent():
    """flip_normals on an emissive sphere flips BOTH the hit-side eval
    and NEE's sampled normal: an inward-facing sphere contributes nothing
    to an outside receiver (regression: NEE used the outward normal)."""
    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene
    from mitsuba2_tpu.render.integrators import render
    import mitsuba2_tpu as mi

    def plate_lit_by_sphere(flip):
        plate = shapes.rectangle(bsdf={"type": "diffuse"}).transformed(
            np.asarray(Transform4.rotate([1, 0, 0], -90.0).matrix))
        sph = shapes.sphere(center=(0, 2, 0), radius=0.4,
                            bsdf={"type": "diffuse", "reflectance": [0] * 3},
                            emitter={"type": "area", "radiance": [5] * 3})
        if flip:
            sph = sph.flipped()
        cam = Transform4.look_at(origin=[0, 1.2, -3], target=[0, 0, 0],
                                 up=[0, 1, 0])
        return build_scene([plate, sph],
                           {"type": "perspective",
                            "to_world": np.asarray(cam.matrix), "fov": 30.0})

    cfg = mi.RenderConfig(width=16, height=16, spp=64, spp_per_pass=64,
                          max_depth=2)
    lit = np.asarray(render(plate_lit_by_sphere(False), cfg))
    dark = np.asarray(render(plate_lit_by_sphere(True), cfg))
    assert lit.mean() > 0.01
    assert dark.mean() < 1e-5


def test_envmap_spectral_coeff_bake_matches_lattice_path():
    """The baked per-texel coefficient path (EnvMapData.coeffs — 4 row
    gathers, no per-lane lattice traffic) must reproduce the lattice
    upsampling path: same spectra within the combined fit/interp
    tolerance, including HDR texels (radiance > 1)."""
    import dataclasses
    from mitsuba2_tpu.core import spectrum as sp
    from mitsuba2_tpu.core.spec import Spec
    from mitsuba2_tpu.core.vec import Vec3
    img = _env_image().copy()
    img[2:4, 5:8] = [9.0, 7.5, 4.0]          # HDR sun block
    env = em.build_envmap({"type": "envmap", "data": img, "scale": 1.3})
    assert env.coeffs is not None and env.coeffs.shape[-1] == 4

    rng = np.random.default_rng(5)
    n = 4096
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dv = Vec3(*map(jnp.asarray, d.T))
    wl, _ = sp.sample_hero_wavelengths(
        jnp.asarray(rng.uniform(size=n), jnp.float32))
    wla = jnp.asarray(wl)
    wls = wl if hasattr(wl, "ch") else Spec(
        tuple(wla[:, i] for i in range(wla.shape[1])) if wla.ndim == 2
        else (wla,))
    a = em.envmap_eval(env, dv, wls, "spectral")
    env_nolut = dataclasses.replace(env, coeffs=None)
    b = em.envmap_eval(env_nolut, dv, wls, "spectral")
    a0 = np.asarray(a.ch[0])
    b0 = np.asarray(b.ch[0])
    assert np.isfinite(a0).all()
    # both paths approximate the same texel spectra; agreement is
    # limited by lattice-interp error on path b (~1e-3) x HDR scale
    denom = np.maximum(np.abs(b0), 0.05 * np.abs(b0).mean())
    rel = np.abs(a0 - b0) / denom
    assert np.median(rel) < 0.02, np.median(rel)
    assert np.percentile(rel, 95) < 0.08, np.percentile(rel, 95)

    # and the rgb path is untouched by the bake
    rgb_a = em.envmap_eval(env, dv, None, "rgb")
    rgb_b = em.envmap_eval(env_nolut, dv, None, "rgb")
    np.testing.assert_array_equal(np.asarray(rgb_a.ch[0]),
                                  np.asarray(rgb_b.ch[0]))

"""Volumetric path tracer tests (volpath.cpp analog): Beer-Lambert
attenuation, phase-function correctness, in-scattering, heterogeneous
grids, and medium transmittance along shadow rays."""
import jax.numpy as jnp
import numpy as np

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.geometry import Transform4
from mitsuba2_tpu.render import media
from mitsuba2_tpu.render.integrators import render
from mitsuba2_tpu.scene import shapes
from mitsuba2_tpu.scene.scene import build_scene


def test_hg_phase_normalized():
    """∫ HG dω = 1 over the sphere for several g."""
    n = 256
    theta = (np.arange(n) + 0.5) / n * np.pi
    for g in (0.0, 0.3, -0.5, 0.8):
        vals = np.asarray(media.phase_hg_eval(jnp.float32(g),
                                              jnp.cos(jnp.asarray(theta))))
        integral = (vals * np.sin(theta)).sum() * (np.pi / n) * 2 * np.pi
        np.testing.assert_allclose(integral, 1.0, rtol=1e-3)


def test_hg_sample_matches_pdf():
    """Sampled cos-theta histogram vs analytic HG pdf."""
    rng = np.random.default_rng(0)
    g = jnp.float32(0.5)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (200_000, 3))
    u2 = jnp.asarray(rng.uniform(size=(200_000, 2)), jnp.float32)
    wo, pdf = media.phase_hg_sample(jnp.full(200_000, 0.5), wi, u2)
    # propagation dir is -wi = -z; cos_theta measured against it
    ct = np.asarray(-wo.z)
    hist, edges = np.histogram(ct, bins=64, range=(-1, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    expect = 2 * np.pi * np.asarray(
        media.phase_hg_eval(g, jnp.asarray(centers)))
    mask = expect > 0.05
    np.testing.assert_allclose(hist[mask], expect[mask], rtol=0.1)


def _slab_scene(medium, L=5.0, emitter_radiance=2.0, depth_extra=None):
    """Camera -> null-BSDF cube (filled with `medium`) -> emissive wall."""
    cube = shapes.cube(bsdf={"type": "null"}, id="vol").transformed(
        np.asarray((Transform4.translate([0, 0, 0]) @
                    Transform4.scale([2.0, 2.0, 0.5])).matrix))
    wall = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
        emitter={"type": "area", "radiance": [emitter_radiance] * 3},
        id="wall").transformed(
        np.asarray(Transform4.translate([0, 0, -2.0]).matrix))
    # wall normal +z faces the camera at +z
    cube.interior = medium
    cam = Transform4.look_at(origin=[0, 0, 4], target=[0, 0, 0], up=[0, 1, 0])
    return build_scene([cube, wall],
                       {"type": "perspective",
                        "to_world": np.asarray(cam.matrix), "fov": 25.0})


CFG = mi.RenderConfig(width=16, height=16, spp=64, spp_per_pass=64,
                      max_depth=6, rr_depth=99, integrator="volpath")


def test_beer_lambert_absorption():
    """Pure absorber slab: pixel = L * exp(-sigma_t * thickness).

    Free-flight survival is a Bernoulli per sample, so average a central
    block at decent spp to beat the MC noise."""
    sigma_t = 1.2
    thickness = 1.0  # cube scaled to half-extent 0.5 in z
    scene = _slab_scene({"type": "homogeneous", "sigma_t": sigma_t,
                         "albedo": 0.0})
    img = np.asarray(render(scene, CFG.replace(spp=256, spp_per_pass=64)))
    expect = 2.0 * np.exp(-sigma_t * thickness)
    np.testing.assert_allclose(img[6:10, 6:10].mean(), expect, rtol=0.06)


def test_vacuum_slab_transparent():
    """sigma_t = 0 medium: emitter seen at full radiance."""
    scene = _slab_scene({"type": "homogeneous", "sigma_t": 0.0,
                         "albedo": 0.5})
    img = np.asarray(render(scene, CFG))
    np.testing.assert_allclose(img[8, 8].mean(), 2.0, rtol=0.05)


def test_heterogeneous_constant_grid_matches_homogeneous():
    """A constant-density grid must reproduce the homogeneous result."""
    sigma_t = 0.8
    hom = _slab_scene({"type": "homogeneous", "sigma_t": sigma_t,
                       "albedo": 0.0})
    het = _slab_scene({"type": "heterogeneous", "sigma_t": sigma_t,
                       "albedo": 0.0,
                       "density": np.ones((4, 4, 4), np.float32),
                       "bbox_min": [-2, -2, -0.5],
                       "bbox_max": [2, 2, 0.5]})
    # patch + seed average: the per-sample estimator is ~Bernoulli in
    # the collision outcome (std ~0.12 at spp=64 for a SINGLE pixel),
    # so single-pixel single-seed comparisons flip on any change to the
    # draw-stream layout (caught when the delta-tracking loop gained
    # its early exit)
    a = np.mean([np.asarray(render(hom, CFG, seed=s))[6:10, 6:10].mean()
                 for s in range(4)])
    b = np.mean([np.asarray(render(het, CFG, seed=s))[6:10, 6:10].mean()
                 for s in range(4)])
    np.testing.assert_allclose(b, a, rtol=0.12)


def test_scattering_adds_inscatter():
    """With albedo ~1 the slab glows wider than the emitter (in-scatter),
    and total energy seen is larger than the pure absorber."""
    absorb = _slab_scene({"type": "homogeneous", "sigma_t": 2.0,
                          "albedo": 0.0})
    scatter = _slab_scene({"type": "homogeneous", "sigma_t": 2.0,
                           "albedo": 0.95})
    cfg = CFG.replace(spp=128, spp_per_pass=128, max_depth=8)
    ia = np.asarray(render(absorb, cfg))
    isc = np.asarray(render(scatter, cfg))
    assert isc.mean() > ia.mean() * 1.5
    assert np.isfinite(isc).all()


def test_shadow_transmittance_through_medium():
    """NEE shadow rays attenuate through an absorbing slab between the
    surface and the light instead of being fully blocked."""
    sigma_t = 1.0
    floor = shapes.rectangle(bsdf={"type": "diffuse",
                                   "reflectance": [0.8] * 3}, id="floor")
    cube = shapes.cube(bsdf={"type": "null"}, id="vol").transformed(
        np.asarray((Transform4.translate([0, 0, 1.0]) @
                    Transform4.scale([2.0, 2.0, 0.25])).matrix))
    cube.interior = {"type": "homogeneous", "sigma_t": sigma_t, "albedo": 0.0}
    light = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
        emitter={"type": "area", "radiance": [5.0] * 3},
        id="light").transformed(
        np.asarray((Transform4.translate([0, 0, 2.5]) @
                    Transform4.rotate([1, 0, 0], 180.0) @
                    Transform4.scale([0.3, 0.3, 1.0])).matrix))
    cam = Transform4.look_at(origin=[0, 0.5, 3], target=[0, 0, 0],
                             up=[0, 1, 0])
    mk = lambda shapes_: build_scene(
        shapes_, {"type": "perspective", "to_world": np.asarray(cam.matrix),
                  "fov": 45.0})
    with_slab = mk([floor, cube, light])
    no_slab = mk([floor, light])
    cfg = CFG.replace(max_depth=8)
    a = np.asarray(render(with_slab, cfg))[8, 8].mean()
    b = np.asarray(render(no_slab, cfg.replace(integrator="volpath")))[8, 8].mean()
    assert a < b  # attenuated
    assert a > 0.2 * b  # but not fully blocked (exp(-0.5) ~ 0.6 per crossing)


def test_hg_phase_chi2():
    """chi2 test of HG sampling vs its pdf (PhaseFunctionAdapter parity)."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba2_tpu import chi2
    from mitsuba2_tpu.render import media
    from mitsuba2_tpu.core.vec import Vec3

    wi = Vec3.full((1,), 0.0, 0.0, 1.0)

    def sample_fn(u):
        n = u.shape[0]
        w = Vec3.full((n,), 0.0, 0.0, 1.0)
        wo, _ = media.phase_hg_sample(jnp.full(n, 0.55), w,
                                      (u[:, 0], u[:, 1]))
        return wo

    def pdf_fn(d):
        flat = d.reshape(-1, 3)
        n = flat.shape[0]
        w = Vec3.full((n,), 0.0, 0.0, 1.0)
        return np.asarray(media.phase_eval(
            jnp.full(n, 0.55), w, Vec3.from_array(jnp.asarray(flat)))
        ).reshape(d.shape[:-1])

    t = chi2.ChiSquareTest(chi2.SphericalDomain(), sample_fn, pdf_fn,
                           sample_count=200_000, res=16, ires=16,
                           sample_dim=2)
    assert t.run(), "\n".join(t.messages)


def test_spectral_medium_matches_rgb_gray():
    """A gray medium must render identically (in expectation) in rgb and
    spectral modes; a COLORED medium must tint the transmitted light in
    spectral mode too (per-channel hero sigma, not gray fallback)."""
    import numpy as np
    import jax.numpy as jnp
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.geometry import Transform4
    from mitsuba2_tpu.render.integrators import render
    from mitsuba2_tpu.render import media as media_mod
    from mitsuba2_tpu.scene import shapes
    from mitsuba2_tpu.scene.scene import build_scene

    def scene_with_medium(sigma):
        cam = Transform4.look_at(origin=[0, -4, 0], target=[0, 0, 0],
                                 up=[0, 0, 1])
        cube = shapes.cube(bsdf={"type": "null"})
        sc = build_scene(
            [cube],
            {"type": "perspective", "to_world": np.asarray(cam.matrix),
             "fov": 30.0},
            emitters=[{"type": "constant", "radiance": [1.0] * 3}])
        mtype, mrow, _ = media_mod.pack_medium(
            {"type": "homogeneous", "sigma_t": sigma, "albedo": [0.0] * 3})
        return sc.replace(med_type=jnp.asarray([mtype]),
                          med_data=jnp.asarray(mrow)[None],
                          shape_interior=jnp.asarray([0], jnp.int32),
                          has_media=True)

    cfg = mi.RenderConfig(width=8, height=8, spp=128, spp_per_pass=64,
                          max_depth=3, rr_depth=99, integrator="volpath")
    # colored absorber: blue passes, red absorbed
    sc = scene_with_medium([2.0, 1.0, 0.2])
    img_rgb = np.asarray(render(sc, cfg, seed=1))
    img_spec = np.asarray(render(sc, cfg.replace(color_mode="spectral"),
                                 seed=1))
    c_rgb = img_rgb[3:5, 3:5].mean(axis=(0, 1))
    c_spec = img_spec[3:5, 3:5].mean(axis=(0, 1))
    # both modes: strong blue-over-red tint
    assert c_rgb[2] > 2.5 * c_rgb[0]
    assert c_spec[2] > 2.0 * c_spec[0], c_spec
    # and the two modes agree within spectral-upsampling tolerance
    assert np.abs(c_spec - c_rgb).max() < 0.12, (c_rgb, c_spec)


def test_volpathmis_spectral_mis_chromatic_medium():
    """volpathmis (VERDICT.md round-2 item on making it a genuine second
    integrator): for a strongly CHROMATIC absorber, the spectral-MIS
    estimator (per-channel distance techniques, balance heuristic) must
    agree with the analytic transmittance in every channel, and beat
    volpath's mean-rate proxy on variance in the optically thick channel.
    """
    sigma = [0.2, 1.2, 3.0]          # strongly chromatic
    thickness = 1.0
    med = {"type": "homogeneous", "sigma_t": sigma, "albedo": 0.0}
    expect = 2.0 * np.exp(-np.asarray(sigma) * thickness)

    cfg = CFG.replace(spp=32, spp_per_pass=32)
    cfg_mis = cfg.replace(integrator="volpathmis")

    # per-seed central-region means -> estimator mean + variance
    def stats(config, n_seeds=6):
        vals = []
        for s in range(n_seeds):
            scene = _slab_scene(med)
            img = np.asarray(render(scene, config, seed=s))
            vals.append(img[6:10, 6:10].mean((0, 1)))
        vals = np.stack(vals)
        return vals.mean(0), vals.var(0)

    mean_mis, var_mis = stats(cfg_mis)
    mean_std, var_std = stats(cfg)

    # both unbiased: agree with Beer-Lambert per channel
    np.testing.assert_allclose(mean_mis, expect, rtol=0.15)
    np.testing.assert_allclose(mean_std, expect, rtol=0.25)
    # spectral MIS controls the chromatic-channel variance: the mean-rate
    # proxy's weight explodes for the thick channel (sigma=3 vs mean 1.47)
    assert var_mis[2] < var_std[2] * 1.05, (var_mis, var_std)
    assert var_mis.sum() < var_std.sum() * 1.0 + 1e-9, (var_mis, var_std)

"""BSDF tests: chi^2 sampling, reciprocity, pointwise Fresnel values
(mirrors src/bsdfs/tests/test_*.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu import chi2
from mitsuba2_tpu.core.geometry import Frame, sph_dir
from mitsuba2_tpu.core.vec import Vec3
from mitsuba2_tpu.render import bsdf as B
from mitsuba2_tpu.render import fresnel as fr
from mitsuba2_tpu.render.spectra import LaneRows
from mitsuba2_tpu.core.vec import Vec2

CFG = mi.RenderConfig(color_mode="rgb")


def make_si(wi, n):
    wi = Vec3.from_array(jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3)))
    from mitsuba2_tpu.render.interaction import SurfaceInteraction
    from mitsuba2_tpu.core.geometry import Frame as F
    nrm = Vec3.full((n,), 0.0, 0.0, 1.0)
    return SurfaceInteraction(
        valid=jnp.ones(n, bool), t=jnp.ones(n), p=Vec3.zeros((n,)), n=nrm,
        sh_frame=F.from_n(nrm), uv=Vec2.zeros((n,)), wi=wi,
        shape=jnp.zeros(n, jnp.int32), prim_index=jnp.zeros(n, jnp.int32),
        wavelengths=None)


def build_row(props):
    mats = []
    idx = B.build_material(props, mats)
    return jnp.asarray(mats[idx][2])


def bsdf_chi2(cls, props, wi, sample_count=400_000, res=16, ires=16):
    row = build_row(props)

    def sample_fn(u):
        n = u.shape[0]
        si = make_si(wi, n)
        data = LaneRows.broadcast(row, n)
        bs, w = cls.sample(data, si, u[:, 0], (u[:, 1], u[:, 2]), CFG)
        ok = (bs.pdf > 0) & w.any_positive()
        from mitsuba2_tpu.core.vec import vwhere
        return vwhere(ok, bs.wo, Vec3.zeros(jnp.shape(ok)))

    def pdf_fn(d):
        n = d.reshape(-1, 3).shape[0]
        si = make_si(wi, n)
        data = LaneRows.broadcast(row, n)
        out = cls.pdf(data, si, Vec3.from_array(d.reshape(-1, 3)), CFG)
        return out.reshape(d.shape[:-1])

    t = chi2.ChiSquareTest(chi2.SphericalDomain(), sample_fn, pdf_fn,
                           sample_count=sample_count, res=res, ires=ires,
                           sample_dim=3)
    ok = t.run()
    assert ok, "\n".join(t.messages)


WI_30 = np.array([np.sin(np.pi / 6), 0.0, np.cos(np.pi / 6)])
WI_60 = np.array([np.sin(np.pi / 3), 0.0, np.cos(np.pi / 3)])


def test_chi2_diffuse():
    bsdf_chi2(B.Diffuse, {"type": "diffuse"}, WI_30)


@pytest.mark.parametrize("alpha,dist", [(0.3, "ggx"), (0.5, "beckmann")])
def test_chi2_roughconductor(alpha, dist):
    bsdf_chi2(B.RoughConductor,
              {"type": "roughconductor", "alpha": alpha, "distribution": dist,
               "material": "Au"}, WI_30)


def test_chi2_roughconductor_anisotropic():
    bsdf_chi2(B.RoughConductor,
              {"type": "roughconductor", "alpha_u": 0.2, "alpha_v": 0.45,
               "distribution": "ggx", "material": "Cu"}, WI_60)


@pytest.mark.parametrize("wi", [WI_30, -WI_30])
def test_chi2_roughdielectric(wi):
    bsdf_chi2(B.RoughDielectric,
              {"type": "roughdielectric", "alpha": 0.4, "int_ior": 1.5,
               "ext_ior": 1.0}, wi, sample_count=600_000)


def test_chi2_plastic():
    bsdf_chi2(B.Plastic, {"type": "plastic"}, WI_30)


def test_chi2_roughplastic():
    bsdf_chi2(B.RoughPlastic, {"type": "roughplastic", "alpha": 0.3}, WI_30)


def test_chi2_blend():
    row = build_row({"type": "blend", "weight": 0.3,
                     "bsdfs": [{"type": "diffuse"},
                               {"type": "roughconductor", "alpha": 0.3}]})
    # blend is a wrapper: dispatch through the scene-level API with a fake scene
    mats = []
    idx = B.build_material({"type": "blend", "weight": 0.3,
                            "bsdfs": [{"type": "diffuse"},
                                      {"type": "roughconductor", "alpha": 0.3}]},
                           mats)

    class FakeScene:
        mat_type = jnp.asarray([mt[0] for mt in mats], jnp.int32)
        mat_flags = jnp.asarray([mt[1] for mt in mats], jnp.int32)
        mat_data = jnp.asarray(np.stack([mt[2] for mt in mats]))
        shape_mat = jnp.asarray([idx], jnp.int32)
        mat_families = tuple(sorted({mt[0] for mt in mats}))

    sc = FakeScene()

    def sample_fn(u):
        n = u.shape[0]
        si = make_si(WI_30, n)
        bs, w = B.sample(sc, si, u[:, 0], (u[:, 1], u[:, 2]), CFG)
        ok = (bs.pdf > 0) & w.any_positive()
        from mitsuba2_tpu.core.vec import vwhere
        return vwhere(ok, bs.wo, Vec3.zeros(jnp.shape(ok)))

    def pdf_fn(d):
        flat = Vec3.from_array(d.reshape(-1, 3))
        si = make_si(WI_30, d.reshape(-1, 3).shape[0])
        return B.pdf(sc, si, flat, CFG).reshape(d.shape[:-1])

    t = chi2.ChiSquareTest(chi2.SphericalDomain(), sample_fn, pdf_fn,
                           sample_count=400_000, res=16, ires=16, sample_dim=3)
    assert t.run(), "\n".join(t.messages)


def test_fresnel_normal_incidence():
    # dielectric eta=1.5: F(0 deg) = ((1.5-1)/(1.5+1))^2 = 0.04
    F, cos_t, _, _ = fr.fresnel(jnp.asarray([1.0]), 1.5)
    np.testing.assert_allclose(np.asarray(F), [0.04], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cos_t), [-1.0], atol=1e-5)
    # conductor normal incidence: ((eta-1)^2 + k^2) / ((eta+1)^2 + k^2)
    eta, k = 0.2, 3.9
    expect = ((eta - 1) ** 2 + k ** 2) / ((eta + 1) ** 2 + k ** 2)
    Fc = fr.fresnel_conductor(jnp.asarray([1.0]), jnp.asarray([eta]), jnp.asarray([k]))
    np.testing.assert_allclose(np.asarray(Fc), [expect], rtol=1e-5)


def test_fresnel_tir():
    # from inside glass at grazing: TIR
    F, cos_t, _, _ = fr.fresnel(jnp.asarray([-0.2]), 1.5)
    np.testing.assert_allclose(np.asarray(F), [1.0], atol=1e-6)
    assert float(cos_t[0]) == 0.0


def test_snell_refraction_direction():
    # 45 deg into eta=1.5: sin_t = sin(45)/1.5
    ci = np.cos(np.deg2rad(45.0))
    F, cos_t, eta_it, eta_ti = fr.fresnel(jnp.asarray([ci], jnp.float32), 1.5)
    wi = Vec3.from_array(jnp.asarray([[np.sin(np.deg2rad(45)), 0.0, ci]],
                                     jnp.float32))
    wo = np.asarray(fr.refract(wi, cos_t, eta_ti).to_array())
    sin_t = np.sin(np.deg2rad(45)) / 1.5
    np.testing.assert_allclose(wo[0],
                               [-sin_t, 0.0, -np.sqrt(1 - sin_t ** 2)], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(wo[0]), 1.0, atol=1e-5)


def test_diffuse_reciprocity():
    row = build_row({"type": "diffuse", "reflectance": [0.3, 0.5, 0.7]})
    n = 1
    si_a = make_si(WI_30, n)
    wo = jnp.asarray([WI_60], jnp.float32)
    f_ab = np.asarray(B.Diffuse.eval(LaneRows.broadcast(row, 1), si_a, Vec3.from_array(wo), CFG).to_array()) / WI_60[2]
    si_b = make_si(WI_60, n)
    f_ba = np.asarray(B.Diffuse.eval(
        LaneRows.broadcast(row, 1), si_b,
        Vec3.from_array(jnp.asarray([WI_30], jnp.float32)), CFG).to_array()) / WI_30[2]
    np.testing.assert_allclose(f_ab, f_ba, rtol=1e-5)


def test_roughconductor_reciprocity():
    row = build_row({"type": "roughconductor", "alpha": 0.3, "material": "Au"})
    f_ab = np.asarray(B.RoughConductor.eval(
        LaneRows.broadcast(row, 1), make_si(WI_30, 1),
        Vec3.from_array(jnp.asarray([WI_60], jnp.float32)), CFG).to_array()) / WI_60[2]
    f_ba = np.asarray(B.RoughConductor.eval(
        LaneRows.broadcast(row, 1), make_si(WI_60, 1),
        Vec3.from_array(jnp.asarray([WI_30], jnp.float32)), CFG).to_array()) / WI_30[2]
    np.testing.assert_allclose(f_ab, f_ba, rtol=1e-4)


def test_twosided_diffuse_from_behind():
    mats = []
    idx = B.build_material({"type": "twosided", "bsdf": {"type": "diffuse"}}, mats)

    class FakeScene:
        mat_type = jnp.asarray([mt[0] for mt in mats], jnp.int32)
        mat_flags = jnp.asarray([mt[1] for mt in mats], jnp.int32)
        mat_data = jnp.asarray(np.stack([mt[2] for mt in mats]))
        shape_mat = jnp.asarray([idx], jnp.int32)
        mat_families = tuple(sorted({mt[0] for mt in mats}))

    sc = FakeScene()
    # hit from behind: wi.z < 0 must behave like the front
    wi_back = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    si = make_si(wi_back, 1)
    wo_back = Vec3.from_array(jnp.asarray([[0.5, 0.0, -np.sqrt(0.75)]],
                                          jnp.float32))
    val = np.asarray(B.eval_(sc, si, wo_back, CFG).to_array())
    assert val.min() > 0, "twosided diffuse black from behind"
    # one-sided diffuse is black from behind
    mats2 = []
    idx2 = B.build_material({"type": "diffuse"}, mats2)
    sc2 = FakeScene()
    sc2.mat_type = jnp.asarray([mats2[idx2][0]], jnp.int32)
    sc2.mat_flags = jnp.asarray([mats2[idx2][1]], jnp.int32)
    sc2.mat_data = jnp.asarray(mats2[idx2][2])[None]
    sc2.mat_families = (B.DIFFUSE,)
    val2 = np.asarray(B.eval_(sc2, si, wo_back, CFG).to_array())
    assert val2.max() == 0


def test_dielectric_energy_split():
    """Smooth dielectric at eta=1.5, normal incidence: 4% reflect, 96%
    transmit, transmitted weight carries the eta^-2 radiance compression."""
    row = build_row({"type": "dielectric", "int_ior": 1.5, "ext_ior": 1.0})
    n = 100_000
    si = make_si([0.0, 0.0, 1.0], n)
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.random(n, np.float64).astype(np.float32))
    u2 = jnp.asarray(rng.random((n, 2), np.float64).astype(np.float32))
    bs, w = B.Dielectric.sample(LaneRows.broadcast(row, n), si, u1,
                                (u2[:, 0], u2[:, 1]), CFG)
    refl = np.asarray((bs.sampled_flags & B.F_DELTA_R) != 0)
    np.testing.assert_allclose(refl.mean(), 0.04, atol=2e-3)
    # transmitted rays continue straight at normal incidence
    wo_t = np.asarray(bs.wo.to_array())[~refl]
    np.testing.assert_allclose(wo_t[:, 2], -1.0, atol=1e-5)
    # eta bookkeeping
    eta_t = np.asarray(bs.eta)[~refl]
    np.testing.assert_allclose(eta_t, 1.5, atol=1e-5)

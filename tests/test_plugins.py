"""User-defined BSDF plugins (register_bsdf).

The reference lets users define plugins in Python via pybind trampoline
classes (src/python/render bindings, SURVEY.md §2.5 "Python-defined
plugins"); here the equivalent is registering a class of pure static
methods with render.bsdf.register_bsdf — after which the name works in
XML, load_dict, and the wavefront dispatch like any built-in.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core import warp
from mitsuba2_tpu.core.geometry import Frame
from mitsuba2_tpu.render import bsdf as B

from test_bsdf import WI_30, bsdf_chi2


class HemiDiffuse:
    """Lambertian surface sampled with a UNIFORM (not cosine) hemisphere
    warp — deliberately different sampling vs eval so the chi² test and
    the furnace test both exercise real plugin math."""
    id = None                    # auto-assigned by register_bsdf
    flags = B.F_DIFFUSE_R

    @staticmethod
    def pack(props, build_child):
        data = np.zeros(B.MAT_W, np.float32)
        data[0:B.SLOT_W] = B._rgb_slot(props.get("reflectance",
                                                 [0.5, 0.5, 0.5]))
        return data

    @staticmethod
    def sample(data, si, u1, u2, config):
        cos_i = Frame.cos_theta(si.wi)
        wo = warp.square_to_uniform_hemisphere(u2)
        pdf = warp.square_to_uniform_hemisphere_pdf(wo)
        active = cos_i > 0
        # weight = eval / pdf = (albedo/pi * cos_o) / (1/2pi) = 2 albedo cos_o
        value = B._spec(data, 0, si, config) * (2.0 * Frame.cos_theta(wo))
        bs = B.BSDFSample(
            wo=wo, pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            sampled_flags=jnp.where(active, B.F_DIFFUSE_R, 0)
            .astype(jnp.int32))
        return bs, value.masked(active)

    @staticmethod
    def eval(data, si, wo, config):
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        active = (cos_i > 0) & (cos_o > 0)
        value = B._spec(data, 0, si, config)
        return (value * (warp.INV_PI * cos_o)).masked(active)

    @staticmethod
    def pdf(data, si, wo, config):
        cos_i = Frame.cos_theta(si.wi)
        cos_o = Frame.cos_theta(wo)
        return jnp.where((cos_i > 0) & (cos_o > 0),
                         warp.square_to_uniform_hemisphere_pdf(wo), 0.0)


@pytest.fixture(scope="module")
def registered():
    if "hemi_diffuse" not in B._BY_NAME:
        B.register_bsdf("hemi_diffuse", HemiDiffuse)
    return B._BY_NAME["hemi_diffuse"]


def test_register_validation(registered):
    with pytest.raises(ValueError):
        B.register_bsdf("hemi_diffuse", HemiDiffuse)  # duplicate name
    with pytest.raises(TypeError):
        B.register_bsdf("broken", type("Broken", (), {"flags": 0}))
    assert registered.id >= 1000  # user id space


def test_plugin_chi2(registered):
    """Sampler matches its pdf through the standard chi² oracle."""
    bsdf_chi2(HemiDiffuse, {"type": "hemi_diffuse"}, WI_30)


def test_plugin_renders_from_xml(registered):
    xml = """
    <scene version="2.0.0">
      <integrator type="path"><integer name="max_depth" value="3"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="to_world">
          <lookat origin="0, 0, 2" target="0, 0, -2" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="16"/><integer name="height" value="16"/>
        </film>
        <sampler type="independent"><integer name="sample_count" value="8"/></sampler>
      </sensor>
      <shape type="rectangle">
        <transform name="to_world"><translate z="-2"/></transform>
        <bsdf type="hemi_diffuse">
          <rgb name="reflectance" value="0.7 0.4 0.2"/>
        </bsdf>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1 1 1"/></emitter>
    </scene>
    """
    scene, config = mi.load_string(xml)
    img = np.asarray(mi.render(scene, config))
    assert np.isfinite(img).all()
    assert (img > 0).any()


def test_plugin_furnace(registered):
    """Energy conservation through the custom plugin: albedo-1 surface in
    a uniform emitter furnace returns the emitter radiance (the same
    analytic oracle the built-in diffuse furnace test uses). Validates
    that the plugin's sample weight (2 albedo cos) integrates to 1."""
    scene2, _ = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 16, "rr_depth": 64},
        "sensor": {
            "type": "perspective", "fov": 45.0,
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 256},
        },
        "white": {"type": "hemi_diffuse", "reflectance": [1.0, 1.0, 1.0]},
        "ball": {"type": "sphere", "radius": 0.5,
                 "center": [0.0, 0.0, -3.0], "bsdf": "white"},
        "sky": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
    })
    img = np.asarray(mi.render(scene2, mi.RenderConfig(
        width=8, height=8, spp=256, max_depth=16, rr_depth=64)))
    # every pixel (sphere or background) sees radiance 1
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean(), 1.0, rtol=0.05)

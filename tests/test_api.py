"""Top-level convenience API (the Mitsuba 2 Python surface).

The reference exposes mitsuba.load_file/load_dict/load_string, set_variant,
traverse, and the autodiff helpers at package level
(src/python/python/__init__.py, util.py, autodiff.py — SURVEY.md §2.5);
these tests pin our lazy re-export layer to the same ergonomics.
"""
import numpy as np
import pytest

import mitsuba2_tpu as mi


CBOX_XML = """
<scene version="2.0.0">
  <integrator type="path"><integer name="max_depth" value="2"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <film type="hdrfilm">
      <integer name="width" value="8"/><integer name="height" value="8"/>
    </film>
    <sampler type="independent"><integer name="sample_count" value="4"/></sampler>
  </sensor>
  <shape type="rectangle">
    <transform name="to_world">
      <translate x="0" y="0" z="-3"/>
    </transform>
    <emitter type="area">
      <rgb name="radiance" value="1.0 1.0 1.0"/>
    </emitter>
  </shape>
</scene>
"""


def test_lazy_exports_resolve():
    for name in ("render", "render_any", "render_and_grad", "traverse",
                 "Transform4", "shapes", "presets", "register_bsdf",
                 "scene_with", "read_bitmap", "write_bitmap", "build_scene",
                 "make_mesh", "render_sharded", "load_file", "load_dict",
                 "load_string", "set_variant", "variants", "RenderConfig"):
        v = getattr(mi, name)
        assert callable(v) or name in ("variants", "shapes", "presets")
    assert "render" in dir(mi)
    with pytest.raises(AttributeError):
        mi.not_a_real_symbol


def test_variants_vocabulary():
    vs = mi.variants()
    assert "rgb" in vs and "spectral_polarized" in vs \
        and "mono_double" in vs and len(vs) == 12
    kw = mi.parse_variant("spectral_polarized")
    assert kw == {"color_mode": "spectral", "polarized": True,
                  "dtype": "float32"}
    with pytest.raises(ValueError):
        mi.parse_variant("gpu_rgb")  # the scalar/packet/gpu axis is XLA's


def test_config_variant_roundtrip():
    for name in mi.variants():
        cfg = mi.RenderConfig(**mi.parse_variant(name))
        assert cfg.variant == name


def test_set_variant_applies_to_loaded_scenes():
    try:
        mi.set_variant("mono")
        scene, config = mi.load_string(CBOX_XML)
        assert config.color_mode == "mono" and not config.polarized
    finally:
        mi.set_variant("rgb")
    # and back to rgb on the next load
    scene, config = mi.load_string(CBOX_XML)
    assert config.color_mode == "rgb"


def test_end_to_end_through_top_level_api(tmp_path):
    scene, config = mi.load_string(CBOX_XML)
    img = mi.render_any(scene, config)
    assert img.shape == (8, 8, 3)
    assert np.all(np.isfinite(np.asarray(img)))
    out = tmp_path / "api.exr"
    mi.write_bitmap(str(out), np.asarray(img))
    back = mi.read_bitmap(str(out))
    np.testing.assert_allclose(back, np.asarray(img), rtol=1e-3, atol=1e-4)


def test_traverse_through_top_level_api():
    scene, config = mi.load_string(CBOX_XML)
    params = mi.traverse(scene)
    assert len(list(params.keys())) > 0

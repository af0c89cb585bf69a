"""Mitsuba .vol grid-volume codec (core/io_vol.py) — round-trips, the
pack_medium filename path, XML <volume> tags, and render equivalence
between a .vol-loaded grid and the same in-memory array."""
import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.core.io_vol import read_vol, write_vol
from mitsuba2_tpu.render import media


def _grid(shape=(5, 4, 3), ch=None, seed=0):
    rng = np.random.default_rng(seed)
    s = shape if ch is None else (*shape, ch)
    return rng.uniform(0.0, 1.0, s).astype(np.float32)


@pytest.mark.parametrize("enc,tol", [("float32", 0.0), ("float16", 1e-3),
                                     ("uint8", 1 / 255.0)])
def test_roundtrip_encodings(tmp_path, enc, tol):
    data = _grid()
    p = str(tmp_path / f"g_{enc}.vol")
    write_vol(p, data, bbox_min=[-1, -2, -3], bbox_max=[4, 5, 6],
              encoding=enc)
    out, bmn, bmx = read_vol(p)
    assert out.shape == data.shape
    np.testing.assert_allclose(out, data, atol=max(tol, 1e-7))
    np.testing.assert_array_equal(bmn, [-1, -2, -3])
    np.testing.assert_array_equal(bmx, [4, 5, 6])


def test_multichannel_roundtrip(tmp_path):
    data = _grid(ch=3)
    p = str(tmp_path / "rgb.vol")
    write_vol(p, data)
    out, _, _ = read_vol(p)
    np.testing.assert_allclose(out, data)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.vol"
    p.write_bytes(b"NOT A VOL FILE")
    with pytest.raises(ValueError, match="magic"):
        read_vol(str(p))


def test_pack_medium_from_vol_file(tmp_path):
    """pack_medium accepts a .vol filename for density; bbox defaults to
    the file header and explicit bbox keys override it."""
    data = _grid((4, 4, 4))
    p = str(tmp_path / "d.vol")
    write_vol(p, data, bbox_min=[0, 0, 0], bbox_max=[2, 2, 2])
    t, row, grid = media.pack_medium(
        {"type": "heterogeneous", "density": p, "sigma_t": 1.0})
    assert t == media.MEDIUM_HETEROGENEOUS
    np.testing.assert_allclose(grid["density"], data)
    np.testing.assert_array_equal(grid["bbox_max"], [2, 2, 2])
    # explicit bbox wins over the header
    _, _, grid2 = media.pack_medium(
        {"type": "heterogeneous", "filename": p, "bbox_max": [9, 9, 9]})
    np.testing.assert_array_equal(grid2["bbox_max"], [9, 9, 9])


def test_scalar_density_lifts_to_constant_grid():
    _, _, grid = media.pack_medium(
        {"type": "heterogeneous", "density": 0.7})
    assert grid["density"].shape == (2, 2, 2)
    np.testing.assert_allclose(grid["density"], 0.7)


def test_xml_volume_tag(tmp_path):
    """<volume type='gridvolume'> resolves the .vol next to the scene and
    <volume type='constvolume'> passes its value through."""
    from mitsuba2_tpu.scene import loader
    data = _grid((3, 3, 3), seed=2)
    write_vol(str(tmp_path / "smoke.vol"), data,
              bbox_min=[-1, -1, -1], bbox_max=[1, 1, 1])
    xml = """<scene version="2.0.0">
      <shape type="cube">
        <bsdf type="null"/>
        <medium type="heterogeneous" name="interior">
          <volume name="density" type="gridvolume">
            <string name="filename" value="smoke.vol"/>
          </volume>
          <volume name="albedo" type="constvolume">
            <float name="value" value="0.25"/>
          </volume>
        </medium>
      </shape>
      <sensor type="perspective"/>
    </scene>"""
    path = tmp_path / "scene.xml"
    path.write_text(xml)
    scene, _ = loader.load_file(str(path))
    assert scene.medium_grid is not None
    np.testing.assert_allclose(np.asarray(scene.medium_grid.data), data)
    # albedo constvolume landed in the medium row
    np.testing.assert_allclose(np.asarray(scene.med_data[0, 3:6]), 0.25)


def test_vol_render_matches_inline_grid(tmp_path):
    """Rendering a slab whose density came from a .vol file matches the
    identical in-memory grid bit-for-bit (same build path)."""
    from tests.test_volpath import _slab_scene, CFG
    from mitsuba2_tpu.render.integrators import render
    data = (0.8 * np.ones((4, 4, 4), np.float32))
    p = str(tmp_path / "slab.vol")
    write_vol(p, data, bbox_min=[-2, -2, -0.5], bbox_max=[2, 2, 0.5])
    inline = _slab_scene({"type": "heterogeneous", "sigma_t": 1.0,
                          "albedo": 0.0, "density": data,
                          "bbox_min": [-2, -2, -0.5],
                          "bbox_max": [2, 2, 0.5]})
    from_file = _slab_scene({"type": "heterogeneous", "sigma_t": 1.0,
                             "albedo": 0.0, "density": p})
    a = np.asarray(render(inline, CFG))
    b = np.asarray(render(from_file, CFG))
    np.testing.assert_array_equal(a, b)

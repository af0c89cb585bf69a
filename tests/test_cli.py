"""CLI variant-string parsing (the reference's variant switcher surface:
mitsuba -m <variant> scene.xml; SURVEY.md §2.5 CLI row)."""
import os

import numpy as np

from mitsuba2_tpu import cli
from mitsuba2_tpu.core import io_bitmap

XML = """
<scene version="2.0.0">
  <integrator type="path"><integer name="max_depth" value="2"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="to_world">
      <lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="16"/>
      <integer name="height" value="16"/>
    </film>
    <sampler type="independent"><integer name="sample_count" value="4"/></sampler>
  </sensor>
  <shape type="rectangle">
    <bsdf type="diffuse"/>
    <emitter type="area"><rgb name="radiance" value="1,1,1"/></emitter>
  </shape>
</scene>
"""


def _run(tmp_path, mode):
    scene = tmp_path / "s.xml"
    scene.write_text(XML)
    out = tmp_path / f"out_{mode}.exr"
    rc = cli.main([str(scene), "-m", mode, "-o", str(out)])
    assert rc == 0 and out.exists()
    img = io_bitmap.read_exr(str(out))
    assert np.isfinite(img).all()
    return img


def test_cli_variant_strings(tmp_path):
    _run(tmp_path, "rgb")
    _run(tmp_path, "mono_polarized")
    # polarized variants must run the Mueller transport and export the
    # Stokes planes, not silently fall back to scalar transport
    assert (tmp_path / "out_mono_polarized_s1.exr").exists()


def test_cli_rejects_bad_variant(tmp_path, capsys):
    scene = tmp_path / "s.xml"
    scene.write_text(XML)
    import pytest
    with pytest.raises(SystemExit):
        cli.main([str(scene), "-m", "rgb_duble"])

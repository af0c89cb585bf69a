"""Bitmap I/O round-trips (src/libcore/tests/test_bitmap.py analog)."""
import numpy as np
import pytest

from mitsuba2_tpu.core import io_bitmap as io


@pytest.fixture
def img():
    rng = np.random.default_rng(7)
    return (rng.uniform(0, 4, (33, 17, 3)) ** 2).astype(np.float32)


def test_exr_roundtrip_float(tmp_path, img):
    p = str(tmp_path / "t.exr")
    io.write_exr(p, img, half=False)
    out = io.read_exr(p)
    np.testing.assert_array_equal(out, img)


def test_exr_roundtrip_half(tmp_path, img):
    p = str(tmp_path / "t.exr")
    io.write_exr(p, img, half=True)
    out = io.read_exr(p)
    # exactly the float16 quantization, nothing more
    np.testing.assert_array_equal(out, img.astype(np.float16).astype(np.float32))


def test_exr_single_channel(tmp_path):
    img = np.linspace(0, 10, 64, dtype=np.float32).reshape(8, 8)
    p = "/tmp/claude-0/t1.exr"
    import os
    os.makedirs(os.path.dirname(p), exist_ok=True)
    io.write_exr(p, img, half=False)
    out = io.read_exr(p)
    np.testing.assert_array_equal(out[..., 0], img)


def test_pfm_roundtrip(tmp_path, img):
    p = str(tmp_path / "t.pfm")
    io.write_pfm(p, img)
    np.testing.assert_array_equal(io.read_pfm(p), img)


def test_png_roundtrip(tmp_path):
    img = np.clip(np.random.default_rng(1).uniform(0, 1, (16, 16, 3)), 0, 1)
    img = img.astype(np.float32)
    p = str(tmp_path / "t.png")
    io.write(p, img)
    out = io.srgb_to_linear(io.read(p))
    np.testing.assert_allclose(out, img, atol=0.01)


def test_srgb_transfer_involution():
    x = np.linspace(0, 1, 256, dtype=np.float32)
    np.testing.assert_allclose(io.srgb_to_linear(io.linear_to_srgb(x)), x,
                               atol=1e-6)


def test_rgbe_roundtrip(tmp_path):
    import numpy as np
    from mitsuba2_tpu.core import io_bitmap as io
    rng = np.random.default_rng(5)
    img = (rng.random((13, 17, 3)).astype(np.float32) * 10.0) ** 2
    p = str(tmp_path / "t.hdr")
    io.write(p, img)
    back = io.read(p)
    # shared-exponent format: 8-bit mantissa relative to the pixel max
    tol = img.max(-1, keepdims=True) / 256.0 + 1e-6
    assert (np.abs(back - img) <= tol).all()


def test_tga_bmp_roundtrip(tmp_path):
    import numpy as np
    from mitsuba2_tpu.core import io_bitmap as io
    rng = np.random.default_rng(6)
    img = rng.random((9, 14, 3)).astype(np.float32)
    for ext in ("tga", "bmp"):
        p = str(tmp_path / f"t.{ext}")
        io.write(p, img)
        back = io.read(p)
        assert back.shape == img.shape
        # 8-bit sRGB quantization round trip
        np.testing.assert_allclose(io.srgb_to_linear(back), img, atol=0.01)


def test_ppm_pgm_roundtrip(tmp_path):
    """P6/P5 write + P6/P5/P3 read (8-bit sRGB, like the other LDR
    codecs)."""
    from mitsuba2_tpu.core import io_bitmap as io
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.ppm")
    io.write(p, img)
    back = io.read(p)
    assert back.shape == (7, 5, 3)
    np.testing.assert_allclose(io.srgb_to_linear(back), img, atol=1.5 / 255)
    # single channel -> PGM
    g = str(tmp_path / "g.pgm")
    io.write(g, img[..., :1])
    bg = io.read(g)
    assert bg.shape == (7, 5, 1)
    # ascii P3 with comments
    a = tmp_path / "a.ppm"
    a.write_text("P3\n# comment\n2 1\n255\n255 0 0  0 255 0\n")
    ba = io.read(str(a))
    np.testing.assert_allclose(ba[0, 0], [1, 0, 0])
    np.testing.assert_allclose(ba[0, 1], [0, 1, 0])

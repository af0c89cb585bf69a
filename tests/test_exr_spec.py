"""Independent structural validation of the EXR writer (VERDICT.md round-2
item 10).

No external OpenEXR reader exists in this offline environment (imageio's
EXR plugin needs a freeimage binary download), so this module implements a
minimal scanline-EXR reader FROM THE SPEC (OpenEXRFileLayout.pdf semantics:
magic/version, attribute stream, chunk offset table, ZIP chunk layout with
the ImfZip delta+interleave predictor) sharing no code with
core/io_bitmap.py — a genuinely independent implementation of the format,
which is what interop with the reference's OpenEXR output rides on.
"""
import os
import struct
import zlib

import numpy as np
import pytest

from mitsuba2_tpu.core import io_bitmap

MAGIC = 0x01312F76
PT_UINT, PT_HALF, PT_FLOAT = 0, 1, 2


def _read_cstr(buf, pos):
    end = buf.index(b"\0", pos)
    return buf[pos:end].decode(), end + 1


def parse_exr(path):
    """Spec-following parse: returns (attrs, channels, (H, W), pixels
    dict name -> (H, W) float array)."""
    buf = open(path, "rb").read()
    magic, version = struct.unpack_from("<iI", buf, 0)
    assert magic == MAGIC, hex(magic)
    assert (version & 0xFF) == 2, "must be version-2 EXR"
    assert (version & 0x200) == 0, "single-part scanline expected"
    pos = 8

    attrs = {}
    while True:
        if buf[pos] == 0:
            pos += 1
            break
        name, pos = _read_cstr(buf, pos)
        typ, pos = _read_cstr(buf, pos)
        size = struct.unpack_from("<i", buf, pos)[0]
        pos += 4
        attrs[name] = (typ, buf[pos:pos + size])
        pos += size

    # required headers (spec table: every file must have these)
    for req in ("channels", "compression", "dataWindow", "displayWindow",
                "lineOrder", "pixelAspectRatio", "screenWindowCenter",
                "screenWindowWidth"):
        assert req in attrs, f"missing required attribute {req}"
    assert attrs["channels"][0] == "chlist"
    assert attrs["dataWindow"][0] == "box2i"

    xmin, ymin, xmax, ymax = struct.unpack("<iiii", attrs["dataWindow"][1])
    H, W = ymax - ymin + 1, xmax - xmin + 1
    comp = attrs["compression"][1][0]
    assert comp in (0, 3), "NO_COMPRESSION or ZIP_COMPRESSION"
    block = 16 if comp == 3 else 1

    # channel list: names must be alphabetically sorted (spec requirement)
    chans = []
    cpos = 0
    cbuf = attrs["channels"][1]
    while cbuf[cpos] != 0:
        cname, cpos = _read_cstr(cbuf, cpos)
        ptype, plin, sx, sy = struct.unpack_from("<iiii", cbuf, cpos)
        cpos += 16
        assert ptype in (PT_HALF, PT_FLOAT)
        assert sx == 1 and sy == 1, "no subsampling in scanline images"
        chans.append((cname, ptype))
    assert chans == sorted(chans, key=lambda c: c[0]), \
        "channel list must be alphabetical"

    # scanline offset table: one uint64 per chunk, increasing, pointing
    # at chunks whose y coordinates march through the data window
    n_chunks = (H + block - 1) // block
    offsets = struct.unpack_from(f"<{n_chunks}Q", buf, pos)
    pos += 8 * n_chunks
    assert all(b > a for a, b in zip(offsets, offsets[1:]))
    assert offsets[0] == pos, "first chunk must follow the offset table"

    bpp = {PT_HALF: 2, PT_FLOAT: 4}
    pixels = {c: np.zeros((H, W), np.float32) for c, _ in chans}
    for ci, off in enumerate(offsets):
        y, ln = struct.unpack_from("<ii", buf, off)
        assert y == ymin + ci * block, "chunk y coordinate mismatch"
        rows = min(block, ymax - y + 1)
        expect_raw = rows * W * sum(bpp[pt] for _, pt in chans)
        data = buf[off + 8: off + 8 + ln]
        if comp == 3 and ln < expect_raw:
            d = np.frombuffer(zlib.decompress(data), np.uint8).astype(np.int64)
            # reverse ImfZip predictor: un-delta (v[0] = d[0];
            # v[i] = v[i-1] + d[i] - 128) then de-interleave
            d[1:] -= 128
            d = (np.cumsum(d) % 256).astype(np.uint8)
            half_n = (len(d) + 1) // 2
            raw = np.empty(len(d), np.uint8)
            raw[0::2] = d[:half_n]
            raw[1::2] = d[half_n:]
            raw = raw.tobytes()
        else:
            raw = data
        assert len(raw) == expect_raw, (len(raw), expect_raw)
        rp = 0
        for ry in range(rows):
            for cname, ptype in chans:
                n = W * bpp[ptype]
                rowbytes = raw[rp:rp + n]
                rp += n
                dt = np.float16 if ptype == PT_HALF else np.float32
                pixels[cname][y - ymin + ry] = np.frombuffer(
                    rowbytes, dt).astype(np.float32)
    return attrs, chans, (H, W), pixels


@pytest.mark.parametrize("shape", [(17, 23, 3), (64, 64, 3), (5, 200, 1),
                                   (33, 7, 4)])
def test_exr_writer_spec_compliance(tmp_path, shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = (rng.random(shape) * 4.0).astype(np.float32)
    p = os.path.join(tmp_path, "out.exr")
    io_bitmap.write_exr(p, img)
    attrs, chans, (H, W), pixels = parse_exr(p)
    assert (H, W) == shape[:2]
    names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["A", "B", "G", "R"]}[shape[2]]
    assert sorted(c for c, _ in chans) == sorted(names)
    layout = {1: {"Y": 0}, 3: {"R": 0, "G": 1, "B": 2},
              4: {"R": 0, "G": 1, "B": 2, "A": 3}}[shape[2]]
    for cname, idx in layout.items():
        np.testing.assert_allclose(pixels[cname], img[:, :, idx],
                                   atol=2e-3, rtol=2e-3)  # half precision


def test_exr_float_precision(tmp_path):
    img = np.linspace(0, 1000, 48).reshape(4, 4, 3).astype(np.float32)
    p = os.path.join(tmp_path, "f32.exr")
    io_bitmap.write_exr(p, img, half=False)
    _, chans, _, pixels = parse_exr(p)
    assert all(pt == PT_FLOAT for _, pt in chans)
    np.testing.assert_array_equal(pixels["R"], img[:, :, 0])  # bit-exact

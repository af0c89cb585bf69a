"""Mesh loader round-trips (obj/ply/serialized — src/shapes tests analog)."""
import numpy as np

from mitsuba2_tpu.scene import mesh_io, shapes


def _cube():
    return shapes.cube()


def test_obj_roundtrip(tmp_path):
    p = str(tmp_path / "m.obj")
    cube = _cube()
    with open(p, "w") as f:
        for v in cube.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for n in cube.normals:
            f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        for uv in cube.uvs:
            f.write(f"vt {uv[0]} {uv[1]}\n")
        for face in cube.faces:
            f.write("f " + " ".join(f"{i+1}/{i+1}/{i+1}" for i in face) + "\n")
    m = mesh_io.load_obj(p, flip_tex_coords=False)
    assert m.faces.shape == cube.faces.shape
    # same triangle soup (vertex order may differ)
    a = np.sort(m.vertices[m.faces].reshape(-1, 9), axis=0)
    b = np.sort(cube.vertices[cube.faces].reshape(-1, 9), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert m.normals is not None and m.uvs is not None


def test_obj_quad_triangulation_and_negative_indices(tmp_path):
    p = str(tmp_path / "q.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("f -4 -3 -2 -1\n")  # quad with negative indices
    m = mesh_io.load_obj(p)
    assert m.faces.shape == (2, 3)
    assert m.vertices.shape == (4, 3)


def test_ply_binary_roundtrip(tmp_path):
    cube = _cube()
    p = str(tmp_path / "m.ply")
    with open(p, "wb") as f:
        hdr = (f"ply\nformat binary_little_endian 1.0\n"
               f"element vertex {len(cube.vertices)}\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property float nx\nproperty float ny\nproperty float nz\n"
               "property float u\nproperty float v\n"
               f"element face {len(cube.faces)}\n"
               "property list uchar int vertex_indices\nend_header\n")
        f.write(hdr.encode())
        inter = np.concatenate([cube.vertices, cube.normals, cube.uvs], -1)
        f.write(inter.astype("<f4").tobytes())
        for face in cube.faces:
            f.write(bytes([3]) + face.astype("<i4").tobytes())
    m = mesh_io.load_ply(p)
    np.testing.assert_allclose(m.vertices, cube.vertices)
    np.testing.assert_allclose(m.normals, cube.normals)
    np.testing.assert_allclose(m.uvs, cube.uvs)
    np.testing.assert_array_equal(m.faces, cube.faces)


def test_ply_ascii(tmp_path):
    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 3\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\n"
                "property list uchar int vertex_indices\nend_header\n"
                "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    m = mesh_io.load_ply(p)
    assert m.vertices.shape == (3, 3)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2]])


def test_serialized_roundtrip(tmp_path):
    cube = _cube()
    p = str(tmp_path / "m.serialized")
    mesh_io.save_serialized(p, cube, name="cube")
    m = mesh_io.load_serialized(p)
    np.testing.assert_allclose(m.vertices, cube.vertices)
    np.testing.assert_allclose(m.normals, cube.normals)
    np.testing.assert_allclose(m.uvs, cube.uvs)
    np.testing.assert_array_equal(m.faces, cube.faces)
    assert m.id == "cube"


def test_native_obj_parser_matches_python(tmp_path):
    """The C++ OBJ parser must produce the same mesh as the Python oracle
    (same split-vertex dedup, fan triangulation, negative indices)."""
    import numpy as np
    import pytest
    from mitsuba2_tpu.scene import mesh_io
    from mitsuba2_tpu import native as native_mod
    if not native_mod.available():
        pytest.skip("no native toolchain")
    obj = """
# test mesh
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
f -4/-4/-1 -2/-2/-1 -1/-1/-1
"""
    p = str(tmp_path / "t.obj")
    open(p, "w").write(obj)
    m_native = mesh_io.load_obj(p)
    m_py = mesh_io._load_obj_py(p)
    assert m_native.faces.shape == m_py.faces.shape
    # same geometry after dereference (vertex order may differ)
    tri_n = np.sort(m_native.vertices[m_native.faces].reshape(-1, 9), axis=0)
    tri_p = np.sort(m_py.vertices[m_py.faces].reshape(-1, 9), axis=0)
    np.testing.assert_allclose(tri_n, tri_p, atol=1e-6)
    np.testing.assert_allclose(
        np.sort(m_native.uvs[m_native.faces].reshape(-1, 6), axis=0),
        np.sort(m_py.uvs[m_py.faces].reshape(-1, 6), axis=0), atol=1e-6)
    np.testing.assert_allclose(m_native.normals, [[0, 0, 1]] * len(m_native.normals))


def test_ply_uniform_fast_path_quad_order(tmp_path):
    """The vectorized uniform-list PLY path must emit fan triangles in
    the same per-row order as the general row loop (prim indices are
    load-bearing for area CDFs and golden renders)."""
    import numpy as np
    nv, nf = 64, 37
    rng = np.random.default_rng(1)
    v = rng.normal(size=(nv, 3)).astype("<f4")
    q = rng.integers(0, nv, (nf, 4)).astype("<i4")
    hdr = ("ply\nformat binary_little_endian 1.0\n"
           f"element vertex {nv}\nproperty float x\nproperty float y\n"
           f"property float z\nelement face {nf}\n"
           "property list uchar int vertex_indices\nend_header\n")
    p = tmp_path / "quads.ply"
    with open(p, "wb") as fh:
        fh.write(hdr.encode())
        fh.write(v.tobytes())
        rows = np.empty(nf, dtype=[("c", "u1"), ("i", "<i4", (4,))])
        rows["c"] = 4
        rows["i"] = q
        fh.write(rows.tobytes())
    m = mesh_io.load_ply(str(p))
    expect = []
    for row in q:
        for k in range(1, 3):
            expect.append([row[0], row[k], row[k + 1]])
    np.testing.assert_array_equal(m.faces, np.asarray(expect, np.int32))


def test_ply_mixed_arity_falls_back(tmp_path):
    """Mixed tri/quad rows can't take the uniform fast path; the row
    loop must still parse them."""
    import numpy as np
    v = np.zeros((8, 3), "<f4")
    hdr = ("ply\nformat binary_little_endian 1.0\n"
           "element vertex 8\nproperty float x\nproperty float y\n"
           "property float z\nelement face 2\n"
           "property list uchar int vertex_indices\nend_header\n")
    p = tmp_path / "mixed.ply"
    with open(p, "wb") as fh:
        fh.write(hdr.encode())
        fh.write(v.tobytes())
        fh.write(np.uint8(3).tobytes() + np.array([0, 1, 2], "<i4").tobytes())
        fh.write(np.uint8(4).tobytes() + np.array([3, 4, 5, 6], "<i4").tobytes())
    m = mesh_io.load_ply(str(p))
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [3, 4, 5], [3, 5, 6]])

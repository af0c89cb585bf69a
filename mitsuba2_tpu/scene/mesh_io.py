"""Mesh file loaders: OBJ, PLY, Mitsuba `.serialized`.

TPU-native rebuild of mitsuba2's mesh shape plugins
(src/shapes/{obj,ply,serialized}.cpp). The reference parses in C++ for
speed; here parsing is host-side numpy (vectorized, fast enough for scene
load which happens once) producing the same MeshData the procedural
constructors emit. Per-face-vertex splitting (OBJ's v/vt/vn triples)
matches the reference's vertex-duplication behavior.
"""
from __future__ import annotations

import struct as _struct
import zlib
from typing import Optional

import numpy as np

from .shapes import MeshData


# ---------------------------------------------------------------------------
# OBJ (src/shapes/obj.cpp — custom fast parser)
# ---------------------------------------------------------------------------

def load_obj(path: str, bsdf=None, emitter=None, id: str = "",
             face_normals: bool = False, flip_tex_coords: bool = True
             ) -> MeshData:
    """Wavefront OBJ -> MeshData. Supports v/vt/vn, polygon fans, negative
    indices; materials/groups are ignored (single mesh), like the reference
    plugin when given one shape. Parses with the native C++ parser
    (native/obj_parser.cpp, the obj.cpp fast-parser counterpart) when the
    toolchain is available, else the pure-Python path below."""
    try:
        from .. import native as native_mod
        verts, faces, normals, uvs = native_mod.parse_obj_native(
            path, flip_tex_coords)
        if face_normals:
            normals = None
        return MeshData(vertices=verts, faces=faces, normals=normals,
                        uvs=uvs, bsdf=bsdf, emitter=emitter, id=id)
    except Exception:
        pass  # toolchain missing or parse failure: pure-Python fallback
    return _load_obj_py(path, bsdf, emitter, id, face_normals,
                        flip_tex_coords)


def _load_obj_py(path: str, bsdf=None, emitter=None, id: str = "",
                 face_normals: bool = False, flip_tex_coords: bool = True
                 ) -> MeshData:
    """Pure-Python OBJ parser (fallback + oracle for the native parser)."""
    vs, vts, vns = [], [], []
    tris = []  # each: 3 x (vi, vti, vni)

    with open(path, "r", errors="replace") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                vs.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif tag == "vt":
                vts.append([float(parts[1]),
                            float(parts[2]) if len(parts) > 2 else 0.0])
            elif tag == "vn":
                vns.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif tag == "f":
                corners = []
                for tok in parts[1:]:
                    comp = tok.split("/")
                    vi = int(comp[0])
                    vti = int(comp[1]) if len(comp) > 1 and comp[1] else 0
                    vni = int(comp[2]) if len(comp) > 2 and comp[2] else 0
                    corners.append((vi, vti, vni))
                for k in range(1, len(corners) - 1):  # fan triangulation
                    tris.append((corners[0], corners[k], corners[k + 1]))

    v = np.asarray(vs, np.float32).reshape(-1, 3)
    vt = np.asarray(vts, np.float32).reshape(-1, 2)
    vn = np.asarray(vns, np.float32).reshape(-1, 3)

    def _fix(i, n):
        return i - 1 if i > 0 else n + i  # negative indices are relative

    # unique (v, vt, vn) triples -> split vertices (obj.cpp behavior)
    triples = np.array([[( _fix(c[0], len(v)),
                           _fix(c[1], len(vt)) if c[1] else -1,
                           _fix(c[2], len(vn)) if c[2] else -1)
                         for c in tri] for tri in tris],
                       np.int64).reshape(-1, 3)
    uniq, inverse = np.unique(triples, axis=0, return_inverse=True)
    faces = inverse.reshape(-1, 3).astype(np.int32)

    verts = v[uniq[:, 0]]
    normals = None
    if len(vn) and (uniq[:, 2] >= 0).all():
        normals = vn[uniq[:, 2]]
        normals /= np.maximum(
            np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20)
    uvs = None
    if len(vt) and (uniq[:, 1] >= 0).all():
        uvs = vt[uniq[:, 1]].copy()
        if flip_tex_coords:
            uvs[:, 1] = 1.0 - uvs[:, 1]
    if face_normals:
        normals = None
    return MeshData(vertices=verts.astype(np.float32), faces=faces,
                    normals=normals, uvs=uvs, bsdf=bsdf, emitter=emitter,
                    id=id)


# ---------------------------------------------------------------------------
# PLY (src/shapes/ply.cpp)
# ---------------------------------------------------------------------------

_PLY_DTYPES = {"char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
               "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
               "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
               "float": "f4", "float32": "f4", "double": "f8", "float64": "f8"}


def load_ply(path: str, bsdf=None, emitter=None, id: str = "",
             face_normals: bool = False) -> MeshData:
    """PLY (ascii / binary little & big endian) -> MeshData."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype, is_list, cdtype)])
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            if line == "end_header":
                break
            p = line.split()
            if not p:
                continue
            if p[0] == "format":
                fmt = p[1]
            elif p[0] == "element":
                elements.append((p[1], int(p[2]), []))
            elif p[0] == "property":
                if p[1] == "list":
                    elements[-1][2].append((p[4], _PLY_DTYPES[p[3]], True,
                                            _PLY_DTYPES[p[2]]))
                else:
                    elements[-1][2].append((p[2], _PLY_DTYPES[p[1]], False, None))
        body = f.read()

    end = "<" if fmt == "binary_little_endian" else ">"
    data = {}
    pos = 0
    if fmt == "ascii":
        tokens = body.split()
        ti = 0
        for name, count, props in elements:
            cols = {pn: [] for pn, _, _, _ in props}
            for _ in range(count):
                for pn, dt, is_list, _ in props:
                    if is_list:
                        n = int(tokens[ti]); ti += 1
                        cols[pn].append([float(tokens[ti + k]) for k in range(n)])
                        ti += n
                    else:
                        cols[pn].append(float(tokens[ti])); ti += 1
            data[name] = cols
    else:
        for name, count, props in elements:
            if any(isl for _, _, isl, _ in props):
                # Fast path: a single list property with a uniform arity
                # (the overwhelmingly common case: triangle/quad faces).
                # One structured-dtype frombuffer instead of a Python
                # row loop — ~40x on big meshes.
                uniform = None
                if count and len(props) == 1:
                    pn, dt, _, cdt = props[0]
                    (n0,) = np.frombuffer(body, end + cdt, 1, pos)
                    n0 = int(n0)
                    rdt = np.dtype([("c", end + cdt), ("i", end + dt, (n0,))])
                    if n0 > 0 and pos + count * rdt.itemsize <= len(body):
                        arr = np.frombuffer(body, rdt, count, pos)
                        if (arr["c"] == n0).all():
                            uniform = arr["i"]
                            pos += count * rdt.itemsize
                            data[name] = {pn: uniform}
                if uniform is None:
                    # general case: mixed arities / extra properties
                    cols = {pn: [] for pn, _, _, _ in props}
                    for _ in range(count):
                        for pn, dt, is_list, cdt in props:
                            if is_list:
                                (n,) = np.frombuffer(body, end + cdt, 1, pos)
                                pos += np.dtype(cdt).itemsize
                                row = np.frombuffer(body, end + dt, int(n), pos)
                                pos += int(n) * np.dtype(dt).itemsize
                                cols[pn].append(row)
                            else:
                                (val,) = np.frombuffer(body, end + dt, 1, pos)
                                pos += np.dtype(dt).itemsize
                                cols[pn].append(val)
                    data[name] = cols
            else:
                dt = np.dtype([(pn, end + d) for pn, d, _, _ in props])
                arr = np.frombuffer(body, dt, count, pos)
                pos += count * dt.itemsize
                data[name] = {pn: arr[pn] for pn, _, _, _ in props}

    vert = data.get("vertex", {})
    verts = np.stack([np.asarray(vert[k], np.float32)
                      for k in ("x", "y", "z")], -1)
    normals = None
    if "nx" in vert and not face_normals:
        normals = np.stack([np.asarray(vert[k], np.float32)
                            for k in ("nx", "ny", "nz")], -1)
    uvs = None
    for ukey, vkey in (("u", "v"), ("s", "t"),
                       ("texture_u", "texture_v")):
        if ukey in vert:
            uvs = np.stack([np.asarray(vert[ukey], np.float32),
                            np.asarray(vert[vkey], np.float32)], -1)
            break

    face_el = data.get("face", {})
    idx_rows = None
    for key in ("vertex_indices", "vertex_index"):
        if key in face_el:
            idx_rows = face_el[key]
            break
    if isinstance(idx_rows, np.ndarray) and idx_rows.ndim == 2:
        # uniform arity: vectorized fan triangulation
        rows = np.asarray(idx_rows, np.int64)
        k = rows.shape[1]
        # (count, k-2, 3) keeps the per-row fan order of the loop below
        faces = np.stack(
            [np.stack([rows[:, 0], rows[:, j], rows[:, j + 1]], -1)
             for j in range(1, k - 1)], 1).reshape(-1, 3).astype(np.int32)
    else:
        faces = []
        for row in idx_rows:
            row = np.asarray(row, np.int64)
            for k in range(1, len(row) - 1):
                faces.append([row[0], row[k], row[k + 1]])
        faces = np.asarray(faces, np.int32).reshape(-1, 3)
    return MeshData(vertices=verts, faces=faces, normals=normals, uvs=uvs,
                    bsdf=bsdf, emitter=emitter, id=id)


# ---------------------------------------------------------------------------
# Mitsuba .serialized (src/shapes/serialized.cpp)
# ---------------------------------------------------------------------------

_MTS_MAGIC = 0x041C
_F_HAS_NORMALS = 0x0001
_F_HAS_TEXCOORDS = 0x0002
_F_HAS_COLORS = 0x0008
_F_FACE_NORMALS = 0x0010
_F_SINGLE = 0x1000
_F_DOUBLE = 0x2000


def load_serialized(path: str, shape_index: int = 0, bsdf=None, emitter=None,
                    id: str = "", face_normals: bool = False) -> MeshData:
    """Mitsuba `.serialized` mesh container (zlib streams + offset table)."""
    with open(path, "rb") as f:
        blob = f.read()
    magic, version = _struct.unpack_from("<HH", blob, 0)
    if magic != _MTS_MAGIC:
        raise ValueError(f"{path}: bad magic {magic:#x}")
    (count,) = _struct.unpack_from("<I", blob, len(blob) - 4)
    if version >= 4:
        table = _struct.unpack_from(f"<{count}Q", blob,
                                    len(blob) - 4 - 8 * count)
    else:
        table = _struct.unpack_from(f"<{count}I", blob,
                                    len(blob) - 4 - 4 * count)
    off = table[shape_index]
    # each mesh record: uint16 magic, uint16 version, zlib stream
    stream = zlib.decompress(blob[off + 4:])
    pos = 0
    (flags,) = _struct.unpack_from("<I", stream, pos)
    pos += 4
    name = ""
    if version >= 4:
        end = stream.index(b"\0", pos)
        name = stream[pos:end].decode("utf-8", "replace")
        pos = end + 1
    v_count, f_count = _struct.unpack_from("<QQ", stream, pos)
    pos += 16
    fdt = np.dtype("<f8") if flags & _F_DOUBLE else np.dtype("<f4")

    def take(n):
        nonlocal pos
        arr = np.frombuffer(stream, fdt, n, pos)
        pos += n * fdt.itemsize
        return arr.astype(np.float32)

    verts = take(3 * v_count).reshape(-1, 3)
    normals = None
    if flags & _F_HAS_NORMALS:
        normals = take(3 * v_count).reshape(-1, 3)
    uvs = None
    if flags & _F_HAS_TEXCOORDS:
        uvs = take(2 * v_count).reshape(-1, 2)
    if flags & _F_HAS_COLORS:
        take(3 * v_count)  # vertex colors: parsed, unused
    faces = np.frombuffer(stream, "<u4", 3 * f_count, pos
                          ).reshape(-1, 3).astype(np.int32)
    if face_normals or (flags & _F_FACE_NORMALS):
        normals = None
    return MeshData(vertices=verts, faces=faces, normals=normals, uvs=uvs,
                    bsdf=bsdf, emitter=emitter, id=id or name)


def save_serialized(path: str, mesh: MeshData, name: str = "") -> None:
    """Write a (single-mesh) `.serialized` file — round-trip support for
    sharing geometry with reference builds."""
    flags = _F_SINGLE
    body = b""
    if mesh.normals is not None:
        flags |= _F_HAS_NORMALS
    if mesh.uvs is not None:
        flags |= _F_HAS_TEXCOORDS
    stream = _struct.pack("<I", flags)
    stream += name.encode() + b"\0"
    stream += _struct.pack("<QQ", len(mesh.vertices), len(mesh.faces))
    stream += mesh.vertices.astype("<f4").tobytes()
    if mesh.normals is not None:
        stream += mesh.normals.astype("<f4").tobytes()
    if mesh.uvs is not None:
        stream += mesh.uvs.astype("<f4").tobytes()
    stream += mesh.faces.astype("<u4").tobytes()
    with open(path, "wb") as f:
        f.write(_struct.pack("<HH", _MTS_MAGIC, 4))
        f.write(zlib.compress(stream))
        f.write(_struct.pack("<Q", 0))
        f.write(_struct.pack("<I", 1))


def load_mesh(path: str, **kw) -> MeshData:
    """Dispatch by extension (obj / ply / serialized)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "obj":
        return load_obj(path, **kw)
    if ext == "ply":
        return load_ply(path, **kw)
    if ext == "serialized":
        return load_serialized(path, **kw)
    raise ValueError(f"unsupported mesh format .{ext}")

"""Scene: a frozen pytree of SoA device arrays + host build pipeline.

TPU-native rebuild of mitsuba2's Scene/Shape/Mesh layer
(src/librender/scene.cpp, shape.cpp, mesh.cpp). The reference holds a graph
of refcounted C++ objects and an OptiX/kd-tree accel; here the entire scene
is ONE immutable pytree of arrays built on the host:

- packed primitive soup in BVH order (triangles + analytic spheres)
- flattened threaded BVH (see scene/bvh.py)
- material table (see render/bsdf.py), emitter table, camera parameters
- per-emitter area-CDFs over their prims for NEE sampling

`traverse()`-style differentiable parameters are simply leaves of this
pytree (diff/params.py); `parameters_changed()` is a functional rebuild of
the derived arrays.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as m
from ..core.geometry import Frame, Ray, normalize, dot
from ..core.vec import Vec2, Vec3
from ..render import bsdf as bsdf_mod
from ..render import emitters as emitters_mod
from ..render.interaction import PreliminaryIntersection, SurfaceInteraction
from . import bvh as bvh_mod
from .shapes import MeshData

PRIM_TRI = 0
PRIM_SPHERE = 1


@struct.dataclass
class SceneData:
    # --- packed prims (BVH order) -------------------------------------------
    prim_p0: jnp.ndarray    # (P, 3) tri vertex 0 / sphere center
    prim_e1: jnp.ndarray    # (P, 3) tri edge 1 / (radius, 0, 0)
    prim_e2: jnp.ndarray    # (P, 3) tri edge 2 / unused
    prim_n0: jnp.ndarray    # (P, 3) per-corner shading normals
    prim_n1: jnp.ndarray
    prim_n2: jnp.ndarray
    prim_uv0: jnp.ndarray   # (P, 2)
    prim_uv1: jnp.ndarray
    prim_uv2: jnp.ndarray
    prim_type: jnp.ndarray  # (P,) i32
    prim_shape: jnp.ndarray  # (P,) i32
    prim_area: jnp.ndarray  # (P,)
    # --- BVH -----------------------------------------------------------------
    bvh_min: jnp.ndarray        # (B, 3)
    bvh_max: jnp.ndarray        # (B, 3)
    bvh_leaf_start: jnp.ndarray  # (B,) i32, -1 = inner
    bvh_leaf_count: jnp.ndarray  # (B,) i32
    bvh_miss: jnp.ndarray        # (B,) i32
    # --- shapes ---------------------------------------------------------------
    shape_mat: jnp.ndarray      # (S,) i32
    shape_emitter: jnp.ndarray  # (S,) i32, -1 = none
    # --- materials -------------------------------------------------------------
    mat_type: jnp.ndarray   # (M,) i32
    mat_flags: jnp.ndarray  # (M,) i32
    mat_data: jnp.ndarray   # (M, MAT_W)
    # --- emitters ---------------------------------------------------------------
    emitter_type: jnp.ndarray      # (E,) i32
    emitter_data: jnp.ndarray      # (E, EMIT_W)
    emitter_shape: jnp.ndarray     # (E,) i32, -1 for non-area
    emitter_prims: jnp.ndarray     # (E, Fmax) i32, padded -1
    emitter_prim_cdf: jnp.ndarray  # (E, Fmax) area cumsum (unnormalized)
    emitter_area: jnp.ndarray      # (E,) total area
    # --- sensor -------------------------------------------------------------------
    cam_to_world: jnp.ndarray  # (4, 4)
    cam_fov_x: jnp.ndarray     # () degrees
    # (8,): [aperture, focus_dist, ortho_sx, ortho_sy,
    #        scene_bbox_cx, cy, cz, scene_bounding_radius]
    cam_data: jnp.ndarray = None
    cam_weight: jnp.ndarray = None  # () sensor importance (pi for irradiancemeter)
    # --- octant-ordered threaded BVH links (bvh.py::build_octant_links) -------
    # flat (B*8,) i32, node*8 + octant; None on scenes built before round 2
    bvh_hit8: jnp.ndarray = None
    bvh_miss8: jnp.ndarray = None
    # --- MXU leaf clusters (bvh.py::cluster_cut + cut_tree_tables;
    # traverse_pallas MXU path). The walk runs on the PRUNED cut-tree
    # (cut nodes + ancestors, R ~ 2*C rows — O(C) VMEM, not O(P)):
    # mxu_node_f: (R, 16) f32 [min.xyz, max.xyz, slot, inst, c.xyz, 0*5]
    # where slot (col 6, f32-exact) = cluster_index * CLUSTER_K at cut
    # nodes, -1 else; col 7 is -1 except on INSTANCED scenes' TLAS
    # instance leaves where it holds the instance id (the two-level MXU
    # walk, bvh.py::build_two_level_mxu — instanced scenes stitch
    # [TLAS | per-group cut trees] here with LOCAL-space clusters);
    # c (cols 8:11) is the cluster centroid the
    # kernels recenter ray features at (precision — see the RECENTRING
    # note at the feature build);
    # mxu_link: (R, 16) i32 [hit8 | miss8] compact-remapped octant links;
    # cluster_slot_prim: (C * CLUSTER_K,) i32 global prim id per padded
    # cluster slot (-1 padding); mxu_feat: (16, 4*C*CLUSTER_K) f32
    # host-precomputed Möller–Trumbore plane rows (p0 RECENTRED about the
    # cluster centroid) TRANSPOSED (slot axis on lanes — Mosaic HBM
    # slices must be 128-aligned in the minor dim), CLUSTER-MAJOR:
    # cluster c owns columns [4*K*c, 4*K*(c+1)) as four contiguous
    # K-column plane blocks [det; u; v; t] — one cluster visit = one
    # contiguous (16, 4*K) DMA
    mxu_node_f: jnp.ndarray = None
    mxu_link: jnp.ndarray = None
    cluster_slot_prim: jnp.ndarray = None
    mxu_feat: jnp.ndarray = None
    # (C, 8) f32 per-cluster centroids [c.xyz, 0*5] in SLOT order — the
    # dense cluster-sweep kernels read row i per visit (the walk kernels
    # read the same centroid off the cut-tree row instead)
    mxu_ccs: jnp.ndarray = None
    # --- BVH8 child-testing walk tables (bvh.py::collapse_bvh8; the
    # round-3 traversal candidate, walk-model 6-7.4x fewer steps).
    # bvh8_child: (M*8, 8) f32 [min.xyz, max.xyz, kind, count];
    # bvh8_order: (M*8, 8) i32 per-octant near-first child permutations.
    bvh8_child: jnp.ndarray = None
    bvh8_order: jnp.ndarray = None
    # --- composed BVH8-walk x MXU-cluster-leaf tables (collapse_bvh8 cut
    # mode over the cluster-cut tree; traverse_pallas
    # ray_intersect_bvh8mxu): child rows (Mc*8, 16) f32 with the cluster
    # slot base in col 6 and the recentring centroid in cols 8:11
    bvh8c_child: jnp.ndarray = None
    bvh8c_order: jnp.ndarray = None
    # --- sensor motion (core/geometry.py::AnimatedTransform) ------------------
    # camera motion blur: keyframed to_world; rays sample a shutter time
    # uniformly over the key range. None = static camera. Shape motion is
    # out of scope (the accel structure is a static BVH; the reference's
    # kd-tree likewise has no shape motion support in mitsuba2).
    cam_motion: Any = None
    # --- media ---------------------------------------------------------------------
    med_type: jnp.ndarray = None      # (Md,) i32
    med_data: jnp.ndarray = None      # (Md, MED_W)
    shape_interior: jnp.ndarray = None  # (S,) i32 medium index, -1 = vacuum
    medium_grid: Any = None           # GridVolume or None
    # --- shared-BLAS instancing (instance.cpp / OptiX-IAS analog) -------------
    # Present iff the scene was built with shapes.Instance records. The
    # BVH node tables above are then the STITCHED two-level structure
    # (bvh.py::build_two_level): TLAS rows first (instance leaves have
    # leaf_count == 0 and leaf_start == instance id), then the shared
    # per-group BLAS blocks in local space; the prim tables hold each
    # group's prims ONCE, in instance-local coordinates (the world group
    # is instance 0 with the identity transform).
    # inst_inv: (K, 16) f32 [world->local 3x4 row-major | blas_root
    # (f32-exact, col 12) | CUT-tree blas root (col 13, the instanced
    # MXU walk's entry) | pad]; inst_fwd: (K, 16) f32 [local->world 3x4 |
    # uniform det-scale | pad].
    inst_inv: jnp.ndarray = None
    inst_fwd: jnp.ndarray = None
    # --- optional neural occlusion oracle (render/nif.py; APPROXIMATE,
    # opt-in via scene.replace(shadow_nif=train_shadow_nif(scene))) -----------
    shadow_nif: Any = None
    # --- textures (None = scene has no textured parameters) -----------------------
    textures: Any = None
    # --- environment map (None = constant env or none) -----------------------------
    envmap: Any = None
    # --- measured-BSDF tables (None = no measured materials) ------------------------
    measured: Any = None
    # --- static metadata (not traced) ----------------------------------------------
    mat_families: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    n_emitters: int = struct.field(pytree_node=False, default=0)
    env_emitter: int = struct.field(pytree_node=False, default=-1)
    n_shapes: int = struct.field(pytree_node=False, default=0)
    has_spheres: bool = struct.field(pytree_node=False, default=True)
    has_instances: bool = struct.field(pytree_node=False, default=False)
    inst_fuel: int = struct.field(pytree_node=False, default=0)
    # walk bound for the instanced MXU cluster kernels (TLAS + each
    # instance's cut tree once; 0 = tables absent)
    inst_mxu_fuel: int = struct.field(pytree_node=False, default=0)
    bvh8_depth: int = struct.field(pytree_node=False, default=0)
    bvh8c_depth: int = struct.field(pytree_node=False, default=0)
    emitter_kinds: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # MXU cluster size this scene's tables were built with (static; the
    # kernels size their VMEM feature scratch from it). Chosen by the
    # measured scale policy at build time — see _pick_cluster_k.
    cluster_k: int = struct.field(pytree_node=False, default=128)
    cam_type: str = struct.field(pytree_node=False, default="perspective")
    has_media: bool = struct.field(pytree_node=False, default=False)
    # Differentiable-parameter index (diff/params.py traverse):
    # tuple of (name, table_attr, row, col0, col1, kind)
    param_paths: Tuple = struct.field(pytree_node=False, default=())

    @property
    def n_prims(self) -> int:
        return self.prim_p0.shape[0]


# ---------------------------------------------------------------------------
# Host build (xml/dict loader -> MeshData list -> SceneData)
# ---------------------------------------------------------------------------

def build_scene(shapes: List[MeshData], sensor: dict,
                emitters: List[dict] = ()) -> SceneData:
    """Pack shapes + sensor (+ shapeless emitters like `constant`) into a
    frozen SceneData. Mirrors Scene::Scene(Properties) + accel build
    (scene.cpp), emitter set_scene hooks, and area-CDF precomputation."""
    from ..render import spectra as spectra_mod
    from ..render import texture as texture_mod
    from ..render import measured as measured_mod
    staging = spectra_mod.begin_texture_staging()
    m_staging = measured_mod.begin_staging()
    try:
        return _build_scene_impl(shapes, sensor, emitters,
                                 staging, texture_mod, m_staging)
    finally:
        spectra_mod.end_texture_staging()
        measured_mod.end_staging()


def _prim_count(m) -> int:
    return 1 if m.sphere_center is not None else len(m.faces)


def _pick_cluster_k(n_prims: int) -> int:
    """MEASURED scale policy (docs/TPU_TRAVERSAL.md "Big scenes",
    round-5 hardware sweep): CK=128 wins at the 31k-tri gallery, CK=256
    wins +3-7% on every workload at 491k tris (CK=512 loses at both).
    The 250k-prim threshold is the midpoint of the two measured scenes
    on a log scale — unmeasured in between, so treat a ±3-7% swing near
    the threshold as tunable, not noise. Explicit overrides
    (MI_CLUSTER_K env / bvh.set_cluster_k) win over the policy."""
    if bvh_mod.CK_FORCED:
        return bvh_mod.CLUSTER_K
    return 256 if n_prims >= 250_000 else bvh_mod.CLUSTER_K


def _should_flatten_instances(inst_records, plain) -> bool:
    """Auto-flatten policy for instanced scenes (see the call site for
    the phase-5 measurements that set it)."""
    mode = os.environ.get("MI_FLATTEN_INSTANCES", "auto").lower()
    if mode in ("0", "false"):
        return False
    if mode in ("1", "true"):
        return True
    # 4M effective prims x ~0.5 KB/prim (prim tables + 4x16 f32 feature
    # rows) ~= 2 GB of the chip's 16 GB HBM — comfortably clear of render
    # wavefront arrays. Above it, shared-BLAS keeps memory O(stored).
    cap = int(os.environ.get("MI_FLATTEN_MAX", "4000000"))
    eff = sum(_prim_count(m) for m in plain)
    for rec in inst_records:
        eff += sum(_prim_count(m) for m in rec.group)
    return eff <= cap


def _build_scene_impl(shapes, sensor, emitters, tex_staging, texture_mod,
                      measured_staging):
    # --- shared-BLAS instancing: split Instance records from plain shapes ---
    # (instance.cpp / OptiX IAS; docs/TPU_TRAVERSAL.md). Each DISTINCT
    # group (by identity) contributes its shapes/prims ONCE, in local
    # space; the plain shapes form the "world group", entered as instance
    # 0 with the identity transform.
    from .shapes import Instance
    inst_records = [s for s in shapes if isinstance(s, Instance)]
    plain = [s for s in shapes if not isinstance(s, Instance)]
    if inst_records and _should_flatten_instances(inst_records, plain):
        # MEASURED POLICY (hardware phase 5, 2026-08-20, instanced_field
        # n=64 subdiv=3 = 82k effective tris, sorted 262k rays): the
        # flattened scene rides the MXU cluster path at 10.0 Mrays/s
        # coherent closest vs the shared-BLAS instanced scalar walk's
        # 1.14 (sorted) / 0.16 (unsorted) — ~9-60x. Auto mode therefore
        # FLATTENS instances (K x prim memory, ~0.5 KB/effective prim)
        # up to MI_FLATTEN_MAX effective prims (default 4M ~= 2 GB HBM,
        # the arithmetic at _should_flatten_instances);
        # beyond that, shared-BLAS keeps the memory scaling that is
        # instancing's point. MI_FLATTEN_INSTANCES=0|1 forces either.
        for rec in inst_records:
            for i, m in enumerate(rec.group):
                # same restrictions as the shared-BLAS path — semantics
                # must not depend on which side of the size cap a scene
                # lands (instance.cpp rejects these regardless)
                if isinstance(m, Instance):
                    raise ValueError("nested instancing is unsupported "
                                     "(shapegroup inside shapegroup)")
                if m.emitter is not None:
                    raise ValueError(
                        "emitters inside instanced shapegroups are "
                        "unsupported (matches the reference: "
                        "instance.cpp rejects nested emitters)")
                if m.interior is not None:
                    raise ValueError(
                        "interior media inside instanced shapegroups "
                        "are unsupported")
                mi_ = m.transformed(rec.to_world) \
                    if rec.to_world is not None else m.copy()
                mi_.id = f"{rec.id}_g{i}" if rec.id else f"{m.id}_flat{i}"
                plain.append(mi_)
        inst_records = []
        shapes = plain
    groups, group_of = [], {}
    for rec in inst_records:
        k = id(rec.group)
        if k not in group_of:
            group_of[k] = len(groups)
            groups.append(rec.group)
    if inst_records:
        for g, grp in enumerate(groups):
            if len(grp) == 0:
                raise ValueError("instanced shapegroup is empty")
            for sh in grp:
                if isinstance(sh, Instance):
                    raise ValueError("nested instancing is unsupported "
                                     "(shapegroup inside shapegroup)")
                if sh.emitter is not None:
                    raise ValueError(
                        "emitters inside instanced shapegroups are "
                        "unsupported (matches the reference: "
                        "instance.cpp rejects nested emitters)")
                if sh.interior is not None:
                    raise ValueError(
                        "interior media inside instanced shapegroups "
                        "are unsupported")
        # ordered shape list: plain shapes, then each group's shapes once.
        # group g owns shape indices [group_shape0[g], group_shape0[g+1])
        shapes = list(plain)
        group_shape0 = []
        for grp in groups:
            group_shape0.append(len(shapes))
            shapes.extend(grp)
        group_shape0.append(len(shapes))

    # --- materials (dedupe identical descriptors; wrappers append children) --
    mats, mat_key2idx = [], {}

    def add_material(desc) -> int:
        desc = desc or {"type": "diffuse"}
        key = repr(desc)
        if key not in mat_key2idx:
            mat_key2idx[key] = bsdf_mod.build_material(desc, mats)
        return mat_key2idx[key]

    # --- collect prims -------------------------------------------------------
    p0s, e1s, e2s, n0s, n1s, n2s, uv0s, uv1s, uv2s = ([] for _ in range(9))
    ptypes, pshapes, pareas = [], [], []
    shape_mat, shape_emitter = [], []
    emitter_descs: List[Tuple[dict, int]] = []   # (desc, shape_id or -1)
    for e_desc in emitters:
        emitter_descs.append((e_desc, -1))

    for s_idx, sh in enumerate(shapes):
        shape_mat.append(add_material(sh.bsdf))
        if sh.emitter is not None:
            shape_emitter.append(len(emitter_descs))
            emitter_descs.append((sh.emitter, s_idx))
        else:
            shape_emitter.append(-1)

        if sh.sphere_center is not None:
            c = np.asarray(sh.sphere_center, np.float32)
            r = float(sh.sphere_radius)
            p0s.append(c[None])
            # e1 = [radius, normal sign (-1 = flip_normals, 0/+1 = out), 0]
            e1s.append(np.array(
                [[r, -1.0 if getattr(sh, "sphere_flip", False) else 1.0, 0]],
                np.float32))
            e2s.append(np.zeros((1, 3), np.float32))
            z3, z2 = np.zeros((1, 3), np.float32), np.zeros((1, 2), np.float32)
            n0s.append(z3); n1s.append(z3); n2s.append(z3)
            uv0s.append(z2); uv1s.append(z2); uv2s.append(z2)
            ptypes.append(np.array([PRIM_SPHERE], np.int32))
            pshapes.append(np.array([s_idx], np.int32))
            pareas.append(np.array([4.0 * np.pi * r * r], np.float32))
            continue

        v, f = sh.vertices, sh.faces
        if f.shape[0] == 0:
            continue
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        e1, e2 = b - a, c - a
        face_n = np.cross(e1, e2)
        face_area = 0.5 * np.linalg.norm(face_n, axis=-1)
        face_n = face_n / np.maximum(np.linalg.norm(face_n, axis=-1, keepdims=True), 1e-20)
        if sh.normals is not None:
            nn0, nn1, nn2 = (sh.normals[f[:, k]] for k in range(3))
        else:
            nn0 = nn1 = nn2 = face_n.astype(np.float32)
        if sh.uvs is not None:
            u0, u1, u2 = (sh.uvs[f[:, k]] for k in range(3))
        else:
            u0 = u1 = u2 = np.zeros((f.shape[0], 2), np.float32)
        p0s.append(a.astype(np.float32))
        e1s.append(e1.astype(np.float32))
        e2s.append(e2.astype(np.float32))
        n0s.append(nn0.astype(np.float32)); n1s.append(nn1.astype(np.float32))
        n2s.append(nn2.astype(np.float32))
        uv0s.append(u0.astype(np.float32)); uv1s.append(u1.astype(np.float32))
        uv2s.append(u2.astype(np.float32))
        ptypes.append(np.full(f.shape[0], PRIM_TRI, np.int32))
        pshapes.append(np.full(f.shape[0], s_idx, np.int32))
        pareas.append(face_area.astype(np.float32))

    p0 = np.concatenate(p0s); e1 = np.concatenate(e1s); e2 = np.concatenate(e2s)
    n0 = np.concatenate(n0s); n1 = np.concatenate(n1s); n2 = np.concatenate(n2s)
    uv0 = np.concatenate(uv0s); uv1 = np.concatenate(uv1s); uv2 = np.concatenate(uv2s)
    ptype = np.concatenate(ptypes); pshape = np.concatenate(pshapes)
    parea = np.concatenate(pareas)

    # --- prim AABBs + BVH -----------------------------------------------------
    is_sph = ptype == PRIM_SPHERE
    tri_min = np.minimum(np.minimum(p0, p0 + e1), p0 + e2)
    tri_max = np.maximum(np.maximum(p0, p0 + e1), p0 + e2)
    r = e1[:, 0:1]
    bb_min = np.where(is_sph[:, None], p0 - r, tri_min)
    bb_max = np.where(is_sph[:, None], p0 + r, tri_max)

    inst_inv16 = inst_fwd16 = None
    inst_fuel = inst_mxu_fuel = 0
    if inst_records:
        # --- two-level accel: one BLAS per group + a TLAS over instances ---
        # group prim ranges (prims were appended in shape order, so each
        # group's prims are contiguous); the world group is the plain
        # shapes' range [0, group prims start)
        shape_bounds = np.concatenate([[0], np.cumsum(
            np.bincount(pshape, minlength=len(shapes)))]).astype(np.int64)
        blas_list, perm_parts = [], []
        g_ranges = [(shape_bounds[group_shape0[g]],
                     shape_bounds[group_shape0[g + 1]])
                    for g in range(len(groups))]
        world_range = (0, shape_bounds[group_shape0[0]])
        all_ranges = ([world_range] if world_range[1] > 0 else []) + g_ranges
        world_blas = 0 if world_range[1] > 0 else None
        for (pb, pe) in all_ranges:
            if pe == pb:
                raise ValueError("instanced shapegroup has no primitives")
            tree_g = bvh_mod.build_bvh(bb_min[pb:pe], bb_max[pb:pe])
            h8, m8 = bvh_mod.build_octant_links(tree_g)
            blas_list.append((tree_g, h8, m8, int(pb)))
            perm_parts.append(tree_g.prim_order + pb)
        perm = np.concatenate(perm_parts).astype(np.int32)

        # instance list: world group first (identity), then the records
        inst_group, inst_mats = [], []
        if world_blas is not None:
            inst_group.append(0)
            inst_mats.append(np.eye(4, dtype=np.float32))
        goff = 1 if world_blas is not None else 0
        for rec in inst_records:
            inst_group.append(goff + group_of[id(rec.group)])
            inst_mats.append(np.eye(4, dtype=np.float32)
                             if rec.to_world is None else rec.to_world)
        K = len(inst_group)
        ib_min = np.empty((K, 3), np.float32)
        ib_max = np.empty((K, 3), np.float32)
        inst_inv16 = np.zeros((K, 16), np.float32)
        inst_fwd16 = np.zeros((K, 16), np.float32)
        for k, (g, M) in enumerate(zip(inst_group, inst_mats)):
            root_lo = blas_list[g][0].bounds_min[0]
            root_hi = blas_list[g][0].bounds_max[0]
            corners = np.array([[root_lo[0] if i & 1 else root_hi[0],
                                 root_lo[1] if i & 2 else root_hi[1],
                                 root_lo[2] if i & 4 else root_hi[2]]
                                for i in range(8)], np.float32)
            wc = corners @ M[:3, :3].T + M[:3, 3]
            ib_min[k], ib_max[k] = wc.min(0), wc.max(0)
            R3 = M[:3, :3]
            det = float(np.linalg.det(R3))
            if abs(det) < 1e-20:
                raise ValueError("singular instance to_world transform")
            inv = np.linalg.inv(M.astype(np.float64))[:3].astype(np.float32)
            pb, pe = all_ranges[g]
            if (ptype[pb:pe] == PRIM_SPHERE).any():
                # analytic spheres stay spheres only under uniform scale
                # (sphere.cpp has the same restriction)
                s = np.cbrt(abs(det))
                if not np.allclose(R3.T @ R3, (s * s) * np.eye(3),
                                   rtol=1e-3, atol=1e-5 * s * s):
                    raise ValueError(
                        "instanced shapegroups with analytic spheres "
                        "require a uniform-scale rigid transform")
            inst_inv16[k, 0:12] = inv.reshape(-1)
            inst_fwd16[k, 0:12] = M[:3].reshape(-1)
            inst_fwd16[k, 12] = np.cbrt(abs(det))
        stitched = bvh_mod.build_two_level(blas_list, inst_group,
                                           ib_min, ib_max)
        for k in range(K):
            inst_inv16[k, 12] = float(stitched["blas_root"][inst_group[k]])
        n_min, n_max = stitched["node_min"], stitched["node_max"]
        n_leaf_start, n_leaf_count = (stitched["leaf_start"],
                                      stitched["leaf_count"])
        n_miss = stitched["miss"]
        oct_hit8, oct_miss8 = stitched["hit8"], stitched["miss8"]
        inst_fuel = int(stitched["fuel"])
        # Instanced MXU cluster path (round 4): TLAS + per-group CUT
        # trees; cluster features are built below from the LOCAL prim
        # tables (local centroids) and the kernel rebuilds its ray
        # matrices per instance entry, so one feature table serves every
        # instance of a group.
        CK = _pick_cluster_k(p0.shape[0])
        two = bvh_mod.build_two_level_mxu(blas_list, inst_group,
                                          ib_min, ib_max, CK)
        mxu_node_f = two["node_f"]
        mxu_link = two["link"]
        slot_prim = two["slot_prim"]
        mxu_row_cluster = two["row_cluster"]
        for k in range(K):
            # col 13: the group's CUT-tree root (the MXU walk's BLAS
            # entry point; col 12 stays the full-table root for the
            # scalar instanced kernels)
            inst_inv16[k, 13] = float(two["blas_root"][inst_group[k]])
        inst_mxu_fuel = int(two["fuel"])
        feat = mxu_ccs = None  # built below from slot_prim
        bvh8_child = bvh8_order = None
        bvh8_depth = 0
        bvh8c_child = bvh8c_order = None
        bvh8c_depth = 0
    else:
        tree = bvh_mod.build_bvh(bb_min, bb_max)
        oct_hit8, oct_miss8 = bvh_mod.build_octant_links(tree)
        n_min, n_max = tree.bounds_min, tree.bounds_max
        n_leaf_start, n_leaf_count = tree.leaf_start, tree.leaf_count
        n_miss = tree.miss
        # MXU leaf clusters (traverse_pallas CK-prim batched leaf tests;
        # CK from the measured scale policy)
        CK = _pick_cluster_k(p0.shape[0])
        cl_id, cl_starts, cl_counts = bvh_mod.cluster_cut(tree, max_prims=CK)
        cut_min, cut_max, cut_hit8, cut_miss8, cl_id_c = \
            bvh_mod.cut_tree_tables(tree, cl_id, oct_hit8, oct_miss8)
        R = cut_min.shape[0]
        mxu_slot = np.where(cl_id_c >= 0, cl_id_c * CK, -1).astype(np.int32)
        mxu_row_cluster = cl_id_c
        assert len(cl_starts) * CK < (1 << 24), \
            "cluster slot ids exceed f32 exact-integer range"
        # slot rides node_f col 6 (exact in f32 up to 2^24) — one scalar row
        # load per walk step instead of two
        # cols [0:6] bbox, 6 slot, 7 pad, [8:11] cluster centroid (the
        # MXU kernels recenter the ray features per visit — see the
        # RECENTRING note at the feature-table build below), [11:16] pad
        mxu_node_f = np.concatenate(
            [cut_min, cut_max, mxu_slot[:, None].astype(np.float32),
             np.zeros((R, 9), np.float32)], -1)
        mxu_link = np.concatenate(
            [cut_hit8.reshape(R, 8), cut_miss8.reshape(R, 8)], -1)
        slot_prim = np.full(max(len(cl_starts), 1) * CK, -1, np.int32)
        for c, (s0, cnt) in enumerate(zip(cl_starts, cl_counts)):
            slot_prim[c * CK: c * CK + cnt] = np.arange(s0, s0 + cnt)
        perm = tree.prim_order
        # BVH8 child-testing walk tables (skipped for brute-force-sized
        # scenes — the collapse is a host python loop over nodes)
        bvh8_child = bvh8_order = None
        bvh8_depth = 0
        if tree.miss.shape[0] > 96:
            bvh8_child, bvh8_order, bvh8_depth = \
                bvh_mod.collapse_bvh8(tree)
    p0, e1, e2 = p0[perm], e1[perm], e2[perm]
    n0, n1, n2 = n0[perm], n1[perm], n2[perm]
    uv0, uv1, uv2 = uv0[perm], uv1[perm], uv2[perm]
    ptype, pshape, parea = ptype[perm], pshape[perm], parea[perm]

    # MXU feature table, host-built once: (4*S, 16) f32 plane rows for the
    # Möller–Trumbore bilinear forms (kernels/traverse_pallas.py MXU path).
    # Built here rather than at trace time — the per-slot prim gathers are
    # pathological as XLA device ops (~0.15 G elem/s on TPU).
    if slot_prim is None:
        feat = mxu_ccs = None  # brute-force-sized scenes skip MXU tables
    else:
        sidx = np.maximum(slot_prim, 0)
        valid = (slot_prim >= 0)[:, None].astype(np.float32)
        cp0 = p0[sidx] * valid
        ce1 = e1[sidx] * valid
        ce2 = e2[sidx] * valid
        Sn = slot_prim.shape[0]          # = C * CK, C >= 1
        C = Sn // CK
        # RECENTRING: the planes are built about each cluster's centroid
        # (p0' = p0 - c) and the kernel feeds the MXU o' = o - c per
        # visit. The plane form's products scale with |o - ref| while the
        # result scales with t, so the bf16-split dot's error floor is
        # amplified by |o - ref|/t; recentring at the cluster bounds that
        # at ~(1 + r_cluster/t) because a hit inside the cluster has
        # |o - c| <= t + r_cluster (the round-2 red-test root cause:
        # raw origins gave amp ~600x -> 2.3e-3 rel t errors).
        vcnt = np.maximum(valid.reshape(C, CK).sum(1), 1.0)
        cl_c = (cp0.reshape(C, CK, 3).sum(1) / vcnt[:, None]).astype(
            np.float32)
        cp0 = cp0 - np.repeat(cl_c, CK, 0) * valid
        cn = np.cross(ce1, ce2)
        # cluster-major: (C, 4 planes, CK slots, 16) -> TRANSPOSED
        # (16, 4*Sn). Mosaic requires HBM memref slices to be 128-aligned
        # in the minor dim, so the slot axis must live on lanes; each MXU
        # kernel visit DMAs a (16, 4*CK) lane slice (4*CK >= 512).
        fv = np.zeros((C, 4, CK, 16), np.float32)
        fv[:, 0, :, 0:3] = -cn.reshape(C, CK, 3)
        fv[:, 1, :, 0:3] = np.cross(cp0, ce2).reshape(C, CK, 3)
        fv[:, 1, :, 3:6] = ce2.reshape(C, CK, 3)
        fv[:, 2, :, 0:3] = -np.cross(cp0, ce1).reshape(C, CK, 3)
        fv[:, 2, :, 3:6] = -ce1.reshape(C, CK, 3)
        fv[:, 3, :, 6:9] = cn.reshape(C, CK, 3)
        fv[:, 3, :, 9] = -np.sum(cp0 * cn, -1).reshape(C, CK)
        feat = np.ascontiguousarray(fv.reshape(4 * Sn, 16).T)
        # kernel-visible copy of each cut node's cluster centroid
        is_cl_node = mxu_row_cluster >= 0
        mxu_node_f[is_cl_node, 8:11] = cl_c[mxu_row_cluster[is_cl_node]]
        mxu_ccs = np.zeros((C, 8), np.float32)
        mxu_ccs[:, 0:3] = cl_c
        # composed BVH8-walk x MXU-leaf tables: collapse the cut tree
        # with cluster leaves (same size gate as the prim BVH8; a cut
        # root means the whole scene is one cluster — MXU alone covers it)
        bvh8c_child = bvh8c_order = None
        bvh8c_depth = 0
        if not inst_records and tree.miss.shape[0] > 96 and cl_id[0] < 0:
            bvh8c_child, bvh8c_order, bvh8c_depth = bvh_mod.collapse_bvh8(
                tree, cluster_id=cl_id, cluster_c=cl_c, cluster_k=CK)

    # --- emitter tables ----------------------------------------------------------
    E = max(len(emitter_descs), 1)
    emitter_rows = np.zeros((E, emitters_mod.EMIT_W), np.float32)
    emitter_types = np.zeros(E, np.int32)
    emitter_shapes = np.full(E, -1, np.int32)
    env_emitter = -1
    envmap_data = None
    shape_of_emitter = {}
    for e_idx, (desc, s_idx) in enumerate(emitter_descs):
        etype, row, aux = emitters_mod.pack_emitter(desc)
        emitter_types[e_idx] = etype
        emitter_rows[e_idx] = row
        emitter_shapes[e_idx] = s_idx
        shape_of_emitter[e_idx] = s_idx
        if etype in (emitters_mod.CONSTANT, emitters_mod.ENVMAP):
            if env_emitter >= 0:
                raise ValueError("only one environment emitter is supported")
            env_emitter = e_idx
        if aux is not None:
            envmap_data = aux

    # per-emitter prim CDFs (area-weighted NEE sampling over shape prims)
    Fmax = 1
    prim_lists = []
    for e_idx in range(E):
        s_idx = shape_of_emitter.get(e_idx, -1)
        if s_idx >= 0:
            prims = np.nonzero(pshape == s_idx)[0].astype(np.int32)
        else:
            prims = np.zeros(0, np.int32)
        prim_lists.append(prims)
        Fmax = max(Fmax, len(prims))
    emitter_prims = np.full((E, Fmax), -1, np.int32)
    emitter_cdf = np.zeros((E, Fmax), np.float32)
    emitter_area = np.zeros(E, np.float32)
    for e_idx, prims in enumerate(prim_lists):
        if len(prims) == 0:
            continue
        emitter_prims[e_idx, :len(prims)] = prims
        cs = np.cumsum(parea[prims].astype(np.float64))
        emitter_cdf[e_idx, :len(prims)] = cs
        emitter_cdf[e_idx, len(prims):] = cs[-1]
        emitter_area[e_idx] = cs[-1]

    # --- sensor -------------------------------------------------------------------
    cam_motion = None
    if "to_world_keys" in sensor:
        # camera motion blur: keyframed to_world (AnimatedTransform).
        # The static cam_to_world falls back to the first key (used by
        # sensor types without motion support + scene introspection).
        from ..core.geometry import AnimatedTransform
        keys = sensor["to_world_keys"]
        cam_motion = AnimatedTransform.from_keys(
            [float(t) for t, _ in keys], [m for _, m in keys])
        sensor = dict(sensor)
        sensor["to_world"] = keys[0][1]
    cam_to_world = np.asarray(sensor["to_world"], np.float32).reshape(4, 4)
    fov_x = float(sensor.get("fov", 45.0))
    cam_type = sensor.get("type", "perspective")
    cam_data = np.zeros(12, np.float32)
    # [8]=near_clip, [9]=far_clip (projective_camera.cpp: rays start at
    # near and end at far along the local ray direction)
    cam_data[8] = float(sensor.get("near_clip", 0.0))
    cam_data[9] = float(sensor.get("far_clip", np.inf))
    # [10]=shutter_open, [11]=shutter_close (sensor.cpp): clamp the
    # sampled time range of a keyframed camera
    cam_data[10] = float(sensor.get("shutter_open", -np.inf))
    cam_data[11] = float(sensor.get("shutter_close", np.inf))
    if cam_type == "orthographic":
        # extent from the to_world scale columns (sensors/orthographic.cpp)
        sx = float(np.linalg.norm(cam_to_world[:3, 0]))
        sy = float(np.linalg.norm(cam_to_world[:3, 1]))
        cam_to_world = cam_to_world.copy()
        cam_to_world[:3, 0] /= max(sx, 1e-20)
        cam_to_world[:3, 1] /= max(sy, 1e-20)
        cam_data[2:4] = [sx, sy]
    else:
        cam_data[0] = float(sensor.get("aperture_radius", 0.0))
        cam_data[1] = float(sensor.get("focus_distance", 1.0))
    # scene bounds (distant sensor's ray-gen plane; generally useful).
    # The accel root is the WORLD bbox in both layouts (instanced scenes'
    # prim AABBs are local-space, so bb_min/max would be wrong there).
    scene_min = n_min[0]
    scene_max = n_max[0]
    cam_data[4:7] = 0.5 * (scene_min + scene_max)
    cam_data[7] = max(float(np.linalg.norm(scene_max - scene_min)) * 0.5, 1e-3)
    # sensor importance: cosine-sampled irradiancemeter integrates E with
    # pdf = cos/pi -> estimator weight pi (sensors/irradiancemeter.cpp)
    cam_weight = np.pi if cam_type == "irradiancemeter" else 1.0

    # --- media ------------------------------------------------------------------
    from ..render import media as media_mod
    med_types_l, med_rows, med_key2idx = [], [], {}
    shape_interior = np.full(max(len(shapes), 1), -1, np.int32)
    medium_grid = None
    for s_idx, sh in enumerate(shapes):
        if sh.interior is None:
            continue
        key = repr(sh.interior)
        if key not in med_key2idx:
            mtype, mrow, grid_desc = media_mod.pack_medium(sh.interior)
            med_key2idx[key] = len(med_rows)
            med_types_l.append(mtype)
            med_rows.append(mrow)
            if grid_desc is not None:
                if medium_grid is not None:
                    raise ValueError("only one heterogeneous grid supported")
                medium_grid = media_mod.GridVolume(
                    data=jnp.asarray(grid_desc["density"]),
                    bbox_min=jnp.asarray(grid_desc["bbox_min"]),
                    bbox_max=jnp.asarray(grid_desc["bbox_max"]))
        shape_interior[s_idx] = med_key2idx[key]
    if not med_rows:
        med_types_l, med_rows = [0], [np.zeros(media_mod.MED_W, np.float32)]

    # --- texture atlas ----------------------------------------------------------
    atlas = texture_mod.pack_atlas(tex_staging)
    if atlas is not None:
        # static flag: any roughness texture? (bsdf.py ALPHA_SLOT kind col)
        atlas = atlas.replace(any_alpha_tex=bool(any(
            mt[2][bsdf_mod.ALPHA_SLOT + 7] != 0 for mt in mats)))

    # --- measured-BSDF tables -----------------------------------------------------
    measured_data = None
    if measured_staging:
        from ..render import measured as measured_mod
        measured_data = measured_mod.build_measured(measured_staging)

    # --- differentiable-parameter index (mitsuba's traverse() paths) ------------
    param_paths = []

    def _add_mat_params(prefix, m_idx):
        cls = bsdf_mod.FAMILIES[mats[m_idx][0]]
        for pname, (ptype, loc) in getattr(cls, "param_spec", {}).items():
            if ptype == "slot":
                c0 = loc * bsdf_mod.SLOT_W
                param_paths.append((f"{prefix}.{pname}", "mat_data",
                                    m_idx, c0, c0 + 3, "rgb"))
            else:
                param_paths.append((f"{prefix}.{pname}", "mat_data",
                                    m_idx, loc, loc + 1, "scalar"))

    seen_rows = set()
    for s_idx, sh in enumerate(shapes):
        sid = sh.id or f"shape{s_idx}"
        m_idx = shape_mat[s_idx]
        if m_idx not in seen_rows:
            seen_rows.add(m_idx)
            _add_mat_params(f"{sid}.bsdf", m_idx)
    for e_idx, (desc, s_idx) in enumerate(emitter_descs):
        pname = emitters_mod.PARAM_NAME.get(emitter_types[e_idx])
        if pname is None:
            continue
        ename = (f"{shapes[s_idx].id or f'shape{s_idx}'}.emitter"
                 if s_idx >= 0 else desc.get("id") or f"emitter{e_idx}")
        param_paths.append((f"{ename}.{pname}", "emitter_data",
                            e_idx, 0, 3, "rgb"))
    for t_idx, tb in enumerate(tex_staging):
        tname = tb.name or f"texture{t_idx}"
        param_paths.append((f"{tname}.data", "textures.data",
                            t_idx, -1, -1, "image"))
    # media (medium.cpp's sigma_t/albedo/phase traverse entries; rows
    # store raw RGB, so these are "vec"/"scalar" kinds, not spectrum
    # slots). The shared heterogeneous grid is one whole-table entry.
    seen_med = set()
    for s_idx, sh in enumerate(shapes):
        m_row = int(shape_interior[s_idx])
        if m_row < 0 or m_row in seen_med:
            continue
        seen_med.add(m_row)
        mname = f"{sh.id or f'shape{s_idx}'}.interior"
        param_paths.append((f"{mname}.sigma_t", "med_data",
                            m_row, 0, 3, "vec"))
        param_paths.append((f"{mname}.albedo", "med_data",
                            m_row, 3, 6, "vec"))
        param_paths.append((f"{mname}.phase_g", "med_data",
                            m_row, 6, 7, "scalar"))
        param_paths.append((f"{mname}.scale", "med_data",
                            m_row, 7, 8, "scalar"))
    if medium_grid is not None:
        param_paths.append(("medium.density.data", "medium_grid.data",
                            -1, -1, -1, "full"))

    dev = jnp.asarray
    return SceneData(
        prim_p0=dev(p0), prim_e1=dev(e1), prim_e2=dev(e2),
        prim_n0=dev(n0), prim_n1=dev(n1), prim_n2=dev(n2),
        prim_uv0=dev(uv0), prim_uv1=dev(uv1), prim_uv2=dev(uv2),
        prim_type=dev(ptype), prim_shape=dev(pshape), prim_area=dev(parea),
        bvh_min=dev(n_min), bvh_max=dev(n_max),
        bvh_leaf_start=dev(n_leaf_start), bvh_leaf_count=dev(n_leaf_count),
        bvh_miss=dev(n_miss),
        bvh_hit8=dev(oct_hit8), bvh_miss8=dev(oct_miss8),
        mxu_node_f=(None if mxu_node_f is None
                    else dev(mxu_node_f.astype(np.float32))),
        mxu_link=None if mxu_link is None else dev(mxu_link.astype(np.int32)),
        cluster_slot_prim=None if slot_prim is None else dev(slot_prim),
        mxu_feat=None if feat is None else dev(feat),
        mxu_ccs=None if mxu_ccs is None else dev(mxu_ccs),
        bvh8_child=None if bvh8_child is None else dev(bvh8_child),
        bvh8_order=None if bvh8_order is None else dev(bvh8_order),
        bvh8_depth=bvh8_depth,
        bvh8c_child=None if bvh8c_child is None else dev(bvh8c_child),
        bvh8c_order=None if bvh8c_order is None else dev(bvh8c_order),
        bvh8c_depth=bvh8c_depth,
        inst_inv=None if inst_inv16 is None else dev(inst_inv16),
        inst_fwd=None if inst_fwd16 is None else dev(inst_fwd16),
        has_instances=bool(inst_records),
        inst_fuel=inst_fuel,
        inst_mxu_fuel=inst_mxu_fuel,
        shape_mat=dev(np.asarray(shape_mat, np.int32)),
        shape_emitter=dev(np.asarray(shape_emitter, np.int32)),
        mat_type=dev(np.asarray([mt[0] for mt in mats], np.int32)),
        mat_flags=dev(np.asarray([mt[1] for mt in mats], np.int32)),
        mat_data=dev(np.stack([mt[2] for mt in mats])),
        emitter_type=dev(emitter_types), emitter_data=dev(emitter_rows),
        emitter_shape=dev(emitter_shapes), emitter_prims=dev(emitter_prims),
        emitter_prim_cdf=dev(emitter_cdf), emitter_area=dev(emitter_area),
        cam_to_world=dev(cam_to_world), cam_fov_x=jnp.float32(fov_x),
        cam_motion=cam_motion,
        cam_data=dev(cam_data), cam_weight=jnp.float32(cam_weight),
        cam_type=cam_type,
        med_type=dev(np.asarray(med_types_l, np.int32)),
        med_data=dev(np.stack(med_rows)),
        shape_interior=dev(shape_interior),
        medium_grid=medium_grid,
        has_media=bool(med_key2idx),
        textures=atlas,
        envmap=envmap_data,
        measured=measured_data,
        mat_families=tuple(sorted({mt[0] for mt in mats})),
        n_emitters=len(emitter_descs),
        env_emitter=env_emitter,
        n_shapes=len(shapes),
        cluster_k=CK,
        has_spheres=bool((ptype == PRIM_SPHERE).any()),
        emitter_kinds=tuple(sorted(set(emitter_types[:len(emitter_descs)].tolist()))),
        param_paths=tuple(param_paths))


# ---------------------------------------------------------------------------
# Device: two-phase intersection (Shape::ray_intersect ->
# compute_surface_interaction, shape.cpp/mesh.cpp)
# ---------------------------------------------------------------------------

def refresh_mxu_feat(scene: SceneData) -> SceneData:
    """Derived rebuild of the MXU Möller–Trumbore plane table from the
    CURRENT prim tables. `mxu_feat` is host-precomputed at scene build
    and does NOT track `scene.replace(prim_p0=...)` — call this after
    functionally updating geometry (vertex optimization steps) or the
    MXU traversal path would intersect stale triangles. Traced-safe
    plain jnp (per-slot gathers: ~1 ms per 45k slots on TPU — per
    optimizer step, not per ray); detached (intersection is
    stop_gradient territory)."""
    if scene.mxu_feat is None:
        return scene
    sg = jax.lax.stop_gradient
    sp = scene.cluster_slot_prim
    idx = jnp.maximum(sp, 0)
    valid = (sp >= 0)[:, None].astype(jnp.float32)
    p0 = sg(scene.prim_p0)[idx] * valid
    e1 = sg(scene.prim_e1)[idx] * valid
    e2 = sg(scene.prim_e2)[idx] * valid
    S = sp.shape[0]
    CK = scene.cluster_k
    C = S // CK
    # recentring (must mirror the host build + kernel EXACTLY): planes
    # about the per-cluster centroid; the kernel reads the matching c
    # from mxu_node_f cols 8:11, refreshed below from the slot column
    vcnt = jnp.maximum(valid.reshape(C, CK).sum(1), 1.0)
    cl_c = p0.reshape(C, CK, 3).sum(1) / vcnt[:, None]
    p0 = p0 - jnp.repeat(cl_c, CK, 0) * valid
    n = jnp.cross(e1, e2)

    def blk(rows3, cols):
        # place (S, 3) rows at column offset `cols` of a (C, CK, 16) block
        pad_l = jnp.zeros((S, cols), jnp.float32)
        pad_r = jnp.zeros((S, 16 - cols - 3), jnp.float32)
        return jnp.concatenate([pad_l, rows3, pad_r], -1).reshape(C, CK, 16)

    det = blk(-n, 0)
    u = blk(jnp.cross(p0, e2), 0) + blk(e2, 3)
    v = blk(-jnp.cross(p0, e1), 0) + blk(-e1, 3)
    p0n = jnp.sum(p0 * n, -1, keepdims=True)
    t = blk(n, 6)
    t = t.at[:, :, 9].set(-p0n.reshape(C, CK))
    feat = jnp.stack([det, u, v, t], axis=1).reshape(4 * S, 16).T
    slot = scene.mxu_node_f[:, 6].astype(jnp.int32)
    node_c = jnp.where((slot >= 0)[:, None],
                       cl_c[jnp.maximum(slot, 0) // CK], 0.0)
    node_f = scene.mxu_node_f.at[:, 8:11].set(node_c)
    ccs = scene.mxu_ccs
    if ccs is not None:
        ccs = ccs.at[:, 0:3].set(cl_c)
    return scene.replace(mxu_feat=feat, mxu_node_f=node_f, mxu_ccs=ccs)


def compute_surface_interaction(scene: SceneData, ray: Ray,
                                pi: PreliminaryIntersection) -> SurfaceInteraction:
    """PreliminaryIntersection -> full shading record.

    Internals are COMPONENT-PLANAR (x/y/z as separate (N,) arrays): TPU
    tiles pad an (N, 3) op's minor dim 3 -> 128 lanes, so vec3 math in that
    layout wastes ~40x VPU throughput (see kernels/brute.py). The (N, 3)
    outputs are stacked once at the end."""
    idx = jnp.maximum(pi.prim_index, 0)
    valid = pi.valid & (pi.prim_index >= 0)
    from ..kernels import gather as _gth
    ptype = _gth.scalar(scene.prim_type, idx)
    u = pi.prim_uv.x
    v = pi.prim_uv.y
    w = 1.0 - u - v

    from ..kernels import gather as gth

    if scene.prim_p0.shape[0] > gth.COLUMN_MAX:
        # ONE (N, 24) row gather instead of nine (N, 2-3) table gathers:
        # per-gather dispatch overhead dominates row gathers at this
        # table size (measured in the r05 phase ladder — csi was ~2.3%
        # of the gallery pass x3 call sites). The packed table is
        # CONCATENATED AT TRACE TIME from the live prim tables (a ~3 MB
        # (P, 24) copy, trivial next to the 1M-lane gathers), so
        # functional geometry updates (scene.replace(prim_p0=...)) and
        # vertex gradients (d p / d prim_p0, the reparam follow
        # contract) flow through unchanged.
        packed = jnp.concatenate(
            [scene.prim_p0, scene.prim_e1, scene.prim_e2,
             scene.prim_n0, scene.prim_n1, scene.prim_n2,
             scene.prim_uv0, scene.prim_uv1, scene.prim_uv2], -1)[idx]

        def g3(table, _o={id(scene.prim_p0): 0, id(scene.prim_e1): 3,
                          id(scene.prim_e2): 6, id(scene.prim_n0): 9,
                          id(scene.prim_n1): 12, id(scene.prim_n2): 15}):
            c = _o[id(table)]
            return packed[:, c], packed[:, c + 1], packed[:, c + 2]

        def g2(table, _o={id(scene.prim_uv0): 18, id(scene.prim_uv1): 20,
                          id(scene.prim_uv2): 22}):
            c = _o[id(table)]
            return packed[:, c], packed[:, c + 1]
    else:
        def g3(table):
            return gth.rows3(table, idx)

        def g2(table):
            return gth.rows2(table, idx)

    p0x, p0y, p0z = g3(scene.prim_p0)
    e1x, e1y, e1z = g3(scene.prim_e1)
    e2x, e2y, e2z = g3(scene.prim_e2)

    # --- shared-BLAS instancing: lift the gathered LOCAL prim attributes
    # to world space per lane, then everything downstream (positions,
    # normals, uv partials, sphere reprojection) is world math unchanged.
    # fwd = local->world 3x4 (+ uniform scale in col 12 for sphere radii);
    # normals use the inverse-transpose = columns of inst_inv's 3x3.
    inst_on = scene.has_instances and getattr(pi, "inst", None) is not None
    if inst_on:
        iid = jnp.maximum(pi.inst, 0)
        fw = [gth.scalar(scene.inst_fwd[:, j], iid) for j in range(13)]
        iv = [gth.scalar(scene.inst_inv[:, j], iid) for j in range(12)]

        def w_point(x, y, z):
            return (fw[0] * x + fw[1] * y + fw[2] * z + fw[3],
                    fw[4] * x + fw[5] * y + fw[6] * z + fw[7],
                    fw[8] * x + fw[9] * y + fw[10] * z + fw[11])

        def w_vec(x, y, z):
            return (fw[0] * x + fw[1] * y + fw[2] * z,
                    fw[4] * x + fw[5] * y + fw[6] * z,
                    fw[8] * x + fw[9] * y + fw[10] * z)

        def w_normal(x, y, z):
            # inverse-transpose rows = inst_inv columns (renormalized later)
            return (iv[0] * x + iv[4] * y + iv[8] * z,
                    iv[1] * x + iv[5] * y + iv[9] * z,
                    iv[2] * x + iv[6] * y + iv[10] * z)

        is_tri_l = ptype == PRIM_TRI
        cpx, cpy, cpz = w_point(p0x, p0y, p0z)
        p0x, p0y, p0z = cpx, cpy, cpz      # tri vertex 0 / sphere center
        v1 = w_vec(e1x, e1y, e1z)
        # sphere e1 = [radius, flip-sign, 0]: scale the radius, keep the
        # sign channel (uniform scale enforced at build for spheres)
        e1x = jnp.where(is_tri_l, v1[0], e1x * fw[12])
        e1y = jnp.where(is_tri_l, v1[1], e1y)
        e1z = jnp.where(is_tri_l, v1[2], 0.0)
        v2 = w_vec(e2x, e2y, e2z)
        e2x = jnp.where(is_tri_l, v2[0], 0.0)
        e2y = jnp.where(is_tri_l, v2[1], 0.0)
        e2z = jnp.where(is_tri_l, v2[2], 0.0)

    def norm3(x, y, z):
        inv = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
        return x * inv, y * inv, z * inv

    # Exact f32 Möller–Trumbore RE-SOLVE of the winning triangle. The
    # verts are already gathered (the expensive part), so re-deriving
    # (u, v, t) here costs ~25 planar FLOPs and makes the shading record
    # independent of the intersector's precision mode — the MXU cluster
    # kernels track winners through a bf16-split plane form (~1e-4 rel t,
    # kernels/traverse_pallas.py MXU_PRECISION) and skip per-visit u/v
    # winner extraction entirely (they emit u=v=0). Barycentrics are
    # affine-invariant, so the world-space solve is equally valid for
    # instanced hits. Kernel u/v survive only as the non-tri (sphere)
    # parameterization and as the fallback for degenerate dets.
    mt_pvx = ray.d.y * e2z - ray.d.z * e2y
    mt_pvy = ray.d.z * e2x - ray.d.x * e2z
    mt_pvz = ray.d.x * e2y - ray.d.y * e2x
    mt_det = e1x * mt_pvx + e1y * mt_pvy + e1z * mt_pvz
    mt_inv = jnp.where(jnp.abs(mt_det) < 1e-18, 0.0, 1.0 / mt_det)
    mt_tvx, mt_tvy, mt_tvz = ray.o.x - p0x, ray.o.y - p0y, ray.o.z - p0z
    mt_qvx = mt_tvy * e1z - mt_tvz * e1y
    mt_qvy = mt_tvz * e1x - mt_tvx * e1z
    mt_qvz = mt_tvx * e1y - mt_tvy * e1x
    u_x = (mt_tvx * mt_pvx + mt_tvy * mt_pvy + mt_tvz * mt_pvz) * mt_inv
    v_x = (ray.d.x * mt_qvx + ray.d.y * mt_qvy + ray.d.z * mt_qvz) * mt_inv
    t_x = (e2x * mt_qvx + e2y * mt_qvy + e2z * mt_qvz) * mt_inv
    # DETACHED, like the kernel outputs they replace: this re-solve is a
    # PRIMAL precision fix only. Differentiable barycentrics here would
    # be w.r.t. the FIXED ray — under a vertex perturbation the hit point
    # p = p0 + u e1 + v e2 would then slide along the ray instead of
    # following the surface, which zeroes the reparameterized boundary
    # gradient (diff/reparam.py::_follow_point depends on fixed-
    # barycentric geometry following; caught by
    # tests/test_reparam.py::test_depth2_shadow_boundary_gradient).
    u_x, v_x, t_x = (jax.lax.stop_gradient(a) for a in (u_x, v_x, t_x))
    ok_x = (valid & (ptype == PRIM_TRI) & (mt_inv != 0.0) &
            jnp.isfinite(t_x) & (t_x > 0.0))
    u = jnp.where(ok_x, u_x, u)
    v = jnp.where(ok_x, v_x, v)
    w = 1.0 - u - v
    t_ref = jnp.where(ok_x, t_x, pi.t)

    # Triangle: position from barycentrics (better precision than o + t d)
    ptx = p0x + e1x * u + e2x * v
    pty = p0y + e1y * u + e2y * v
    ptz = p0z + e1z * u + e2z * v
    ngx, ngy, ngz = norm3(e1y * e2z - e1z * e2y,
                          e1z * e2x - e1x * e2z,
                          e1x * e2y - e1y * e2x)
    n0x, n0y, n0z = g3(scene.prim_n0)
    n1x, n1y, n1z = g3(scene.prim_n1)
    n2x, n2y, n2z = g3(scene.prim_n2)
    if inst_on:
        n0x, n0y, n0z = w_normal(n0x, n0y, n0z)
        n1x, n1y, n1z = w_normal(n1x, n1y, n1z)
        n2x, n2y, n2z = w_normal(n2x, n2y, n2z)
    nsx, nsy, nsz = norm3(n0x * w + n1x * u + n2x * v,
                          n0y * w + n1y * u + n2y * v,
                          n0z * w + n1z * u + n2z * v)
    u0x, u0y = g2(scene.prim_uv0)
    u1x, u1y = g2(scene.prim_uv1)
    u2x, u2y = g2(scene.prim_uv2)
    uvx = u0x * w + u1x * u + u2x * v
    uvy = u0y * w + u1y * u + u2y * v

    if scene.has_spheres:
        # Sphere (center p0, radius e1.x). t clamped on MISS lanes:
        # pi.t = inf there, and o + inf*d = NaN would flow into
        # acos/arctan2 — masked in the image but poisoning gradients
        # (0-cotangent x NaN-derivative, see core/math.py safe_sqrt).
        t_safe = jnp.where(valid, pi.t, 1.0)
        r_sph = jnp.maximum(e1x, 1e-20)
        sx, sy, sz = norm3(ray.o.x + ray.d.x * t_safe - p0x,
                           ray.o.y + ray.d.y * t_safe - p0y,
                           ray.o.z + ray.d.z * t_safe - p0z)
        psx = p0x + sx * r_sph  # re-projected for precision (sphere.cpp)
        psy = p0y + sy * r_sph
        psz = p0z + sz * r_sph
        theta = m.safe_acos(sz)
        phi = jnp.arctan2(sy, sx)
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)

        is_tri = ptype == PRIM_TRI
        ptx = jnp.where(is_tri, ptx, psx)
        pty = jnp.where(is_tri, pty, psy)
        ptz = jnp.where(is_tri, ptz, psz)
        # e1.y < 0 marks flip_normals spheres (inward shading/geo normal);
        # the position reprojection above uses the UNflipped s
        sgn = jnp.where(e1y < 0, -1.0, 1.0)
        ngx = jnp.where(is_tri, ngx, sx * sgn)
        ngy = jnp.where(is_tri, ngy, sy * sgn)
        ngz = jnp.where(is_tri, ngz, sz * sgn)
        nsx = jnp.where(is_tri, nsx, sx * sgn)
        nsy = jnp.where(is_tri, nsy, sy * sgn)
        nsz = jnp.where(is_tri, nsz, sz * sgn)
        uvx = jnp.where(is_tri, uvx, phi * (0.5 / jnp.pi))
        uvy = jnp.where(is_tri, uvy, theta / jnp.pi)

    p = Vec3(ptx, pty, ptz)
    ng = Vec3(ngx, ngy, ngz)
    ns = Vec3(nsx, nsy, nsz)
    uv = Vec2(uvx, uvy)

    sh_frame = Frame.from_n(ns)
    wi_world = -ray.d

    # --- screen-space uv partials (interaction.h::compute_uv_partials) ------
    # Present iff the camera ray carried differentials: intersect the two
    # offset rays with the tangent plane at p, convert the position deltas
    # to barycentric deltas via the 2x2 normal equations of (e1, e2), then
    # to uv deltas through the triangle's uv parameterization.
    duv_dx = duv_dy = None
    if getattr(ray, "o_x", None) is not None:
        a11 = e1x * e1x + e1y * e1y + e1z * e1z
        a12 = e1x * e2x + e1y * e2y + e1z * e2z
        a22 = e2x * e2x + e2y * e2y + e2z * e2z
        det = a11 * a22 - a12 * a12
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, jnp.inf, det)

        def plane_delta(o_off, d_off):
            denom = d_off.x * ngx + d_off.y * ngy + d_off.z * ngz
            denom = jnp.where(jnp.abs(denom) < 1e-12, jnp.inf, denom)
            tt = ((ptx - o_off.x) * ngx + (pty - o_off.y) * ngy +
                  (ptz - o_off.z) * ngz) / denom
            dpx = o_off.x + d_off.x * tt - ptx
            dpy = o_off.y + d_off.y * tt - pty
            dpz = o_off.z + d_off.z * tt - ptz
            b1 = dpx * e1x + dpy * e1y + dpz * e1z
            b2 = dpx * e2x + dpy * e2y + dpz * e2z
            du_b = (a22 * b1 - a12 * b2) * inv_det
            dv_b = (a11 * b2 - a12 * b1) * inv_det
            ok = valid & (ptype == PRIM_TRI) & jnp.isfinite(tt)
            return Vec2(
                jnp.where(ok, (u1x - u0x) * du_b + (u2x - u0x) * dv_b, 0.0),
                jnp.where(ok, (u1y - u0y) * du_b + (u2y - u0y) * dv_b, 0.0))

        duv_dx = plane_delta(ray.o_x, ray.d_x)
        duv_dy = plane_delta(ray.o_y, ray.d_y)

    si = SurfaceInteraction(
        valid=valid,
        t=jnp.where(valid, t_ref, jnp.inf),
        p=p, n=ng, sh_frame=sh_frame, uv=uv,
        wi=sh_frame.to_local(wi_world),
        shape=jnp.where(valid, _gth.scalar(scene.prim_shape, idx), -1),
        prim_index=jnp.where(valid, idx, -1),
        wavelengths=ray.wavelengths,
        tex=scene.textures,
        duv_dx=duv_dx, duv_dy=duv_dy)
    return si


# Intersection backend selection. "auto": gather-free brute force for tiny
# scenes (fastest: no traversal overhead), the Pallas packet kernel on TPU
# for everything bigger, the per-lane jnp walker elsewhere. Override via
# set_backend for tests/benchmarks.
_BACKEND = "auto"


def set_backend(name: str) -> None:
    """Force the intersection backend: auto | brute | jnp | pallas |
    bvh8 (the child-testing walk) | bvh8mxu (the composed BVH8 walk +
    MXU cluster leaves, kernels/traverse_pallas.py — opt-in until
    compiled-on-TPU validation)."""
    global _BACKEND
    assert name in ("auto", "brute", "jnp", "pallas", "bvh8",
                    "bvh8mxu"), name
    _BACKEND = name


def _pick_backend(scene) -> str:
    from ..kernels import brute
    if _BACKEND != "auto":
        if scene.has_instances and _BACKEND in ("brute", "bvh8",
                                                "bvh8mxu"):
            raise ValueError(f"{_BACKEND} backend cannot intersect "
                             "shared-BLAS instanced scenes (prim tables "
                             "are instance-local); use jnp or pallas")
        if _BACKEND == "bvh8" and scene.bvh8_child is None:
            raise ValueError("bvh8 backend needs BVH8 tables (scene too "
                             "small; brute force covers it)")
        if _BACKEND == "bvh8mxu":
            if getattr(scene, "bvh8c_child", None) is None:
                raise ValueError("bvh8mxu backend needs the composed "
                                 "cut-tree tables (scene too small)")
            if scene.has_spheres:
                raise ValueError("bvh8mxu backend is triangle-only "
                                 "(spheres have no bilinear plane form); "
                                 "use pallas or bvh8")
        return _BACKEND
    if scene.has_instances:
        # instanced scenes need instance-aware walkers: the per-lane jnp
        # walker on CPU, the instanced Pallas packet kernels on TPU
        # (brute force and the MXU cluster path see local-space prims)
        import jax
        return ("pallas" if jax.devices()[0].platform == "tpu" else "jnp")
    if scene.n_prims <= brute.MAX_BRUTE_PRIMS:
        return "brute"
    import jax
    if jax.devices()[0].platform == "tpu":
        # NEVER pick "jnp" on TPU: the per-lane while_loop walker triggers a
        # reproducible XLA:TPU device fault on the axon runtime (wedges the
        # chip for hours). The Pallas packet kernel is the TPU big-scene
        # path; the jnp walker serves CPU + oracle duty.
        return "pallas"
    return "jnp"


# Wavefront presort for the block-synchronous packet kernel: sort lanes by
# (origin Morton cell, direction octant) so each 1024-lane block is
# spatially and directionally coherent — the property the packet kernel
# converts into node culling. The permutation is applied by carrying the
# ray arrays as lax.sort PAYLOADS (multi-operand sort, ~15 ms/M lanes);
# gather-based permutation would be ~10x slower on TPU (kernels/gather.py
# measured rules). "auto" enables it for big-scene pallas wavefronts.
_SORT_RAYS = "auto"
_SORT_MIN_LANES = 16384


def set_ray_sort(mode) -> None:
    """Force wavefront presorting: True | False | 'auto'."""
    global _SORT_RAYS
    assert mode in (True, False, "auto")
    _SORT_RAYS = mode


def _want_sort(n_lanes: int) -> bool:
    if _SORT_RAYS == "auto":
        return n_lanes >= _SORT_MIN_LANES
    return bool(_SORT_RAYS)


_SORT_DIRBITS = int(os.environ.get("MI_SORT_DIRBITS", "9"))
assert _SORT_DIRBITS % 3 == 0 and 3 <= _SORT_DIRBITS <= 15, _SORT_DIRBITS


def _coherence_key(scene, ray_o, ray_d, t_max=None):
    """Wavefront sort key: origin Morton cell (major) + a direction
    bucket (MI_SORT_DIRBITS total, 3 bits/axis -> default a 9-bit
    ~45-degree cone), so each 1024-lane packet covers a compact cone
    from a compact region — much tighter traversal unions than the
    octant-only key (direction spread, not origin spread, is what makes
    a block sweep the whole tree). The default was re-swept in round 5
    against 6/12 dir bits on the bounce wavefront (docs/TPU_TRAVERSAL.md
    round-5 section). Dead lanes (maxt <= 0) sort to the back so their
    packets exit at the root."""
    from ..kernels import compact
    morton = compact.morton3(ray_o, scene.bvh_min[0], scene.bvh_max[0])
    db = _SORT_DIRBITS
    b = db // 3
    half = float(1 << (b - 1))
    top = float((1 << b) - 1)

    def qb(c):  # direction component -> b bits
        return jnp.clip(((c + 1.0) * half), 0.0, top).astype(jnp.uint32)

    dbucket = (qb(ray_d.x) << (2 * b)) | (qb(ray_d.y) << b) | qb(ray_d.z)
    key = (((morton >> db) << db) | dbucket)
    if t_max is not None:
        key = jnp.where(t_max <= 0.0, jnp.uint32(0xFFFFFFFF), key)
    return key


def _sorted_pallas_intersect(scene, ray_o, ray_d, t_max, intersect_fn=None):
    from ..kernels import traverse_pallas
    ox, oy, oz = ray_o.x, ray_o.y, ray_o.z
    dx, dy, dz = ray_d.x, ray_d.y, ray_d.z
    n = ox.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    key = _coherence_key(scene, ray_o, ray_d, t_max)
    lane = jnp.arange(n, dtype=jnp.int32)
    key, ox, oy, oz, dx, dy, dz, t_max, lane = jax.lax.sort(
        (key, ox, oy, oz, dx, dy, dz, t_max, lane), num_keys=1)
    if scene.has_instances:
        t, prim, u, v, inst = traverse_pallas.ray_intersect_instanced(
            scene, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t_max)
        _, t, prim, u, v, inst = jax.lax.sort(
            (lane, t, prim, u, v, inst), num_keys=1)
        return t, prim, u, v, inst
    default_fn = intersect_fn is None
    if intersect_fn is None:
        intersect_fn = traverse_pallas.ray_intersect_preliminary
    t, prim, u, v = intersect_fn(
        scene, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t_max)
    # unsort: original lane index as the sort key carries results back.
    # The MXU cluster path emits u = v = 0 (the shading stage re-solves
    # them exactly) — dropping the two all-zero payloads cuts the unsort
    # from 5 operands to 3 on every sorted closest-hit call.
    if default_fn and not traverse_pallas.emits_uv(scene):
        _, t, prim = jax.lax.sort((lane, t, prim), num_keys=1)
        z = jnp.zeros_like(t)
        return t, prim, z, z
    _, t, prim, u, v = jax.lax.sort((lane, t, prim, u, v), num_keys=1)
    return t, prim, u, v


def _sorted_pallas_ray_test(scene, ray_o, ray_d, t_max, test_fn=None):
    from ..kernels import traverse_pallas
    ox, oy, oz = ray_o.x, ray_o.y, ray_o.z
    dx, dy, dz = ray_d.x, ray_d.y, ray_d.z
    n = ox.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    key = _coherence_key(scene, ray_o, ray_d, t_max)
    lane = jnp.arange(n, dtype=jnp.int32)
    key, ox, oy, oz, dx, dy, dz, t_max, lane = jax.lax.sort(
        (key, ox, oy, oz, dx, dy, dz, t_max, lane), num_keys=1)
    if test_fn is None:
        test_fn = (traverse_pallas.ray_test_instanced if scene.has_instances
                   else traverse_pallas.ray_test)
    occ = test_fn(scene, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t_max)
    _, occ = jax.lax.sort((lane, occ.astype(jnp.int32)), num_keys=1)
    return occ != 0


def _preliminary_dispatch(scene: SceneData, ray: Ray, sort=None):
    """Backend-dispatched closest-hit query: (t, prim, u, v, inst|None).

    The traversal half of Scene::ray_intersect — shared by the full
    shading-record path (`ray_intersect`) and the minimal hit-position
    path (`ray_intersect_positions`). `sort=None` -> the auto presort
    policy; True/False force it (integrators pass False for PRIMARY
    camera wavefronts, whose (spp, H, W) pixel order is already
    block-coherent: measured r05 phase ladder, the pixel-order kernel
    costs +23 ms on the 1M-lane gallery primary vs a ~40-50 ms presort
    bracket — a net ~25 ms/pass win)."""
    from ..kernels import brute, traverse_jnp, traverse_pallas
    backend = _pick_backend(scene)
    inst = None

    def want():
        return (_want_sort(jnp.shape(ray.o.x)[0]) if sort is None
                else bool(sort))

    if scene.has_instances:
        sg = jax.lax.stop_gradient
        if backend == "pallas":
            t, prim, u, v, inst = _sorted_pallas_intersect(
                scene, ray.o, ray.d, ray.maxt) \
                if want() else \
                traverse_pallas.ray_intersect_instanced(
                    scene, ray.o, ray.d, ray.maxt)
        else:
            t, prim, u, v, inst = traverse_jnp._ray_intersect_instanced(
                sg(scene), sg(ray.o), sg(ray.d), sg(ray.maxt))
    elif backend == "brute":
        t, prim, u, v = brute.ray_intersect_brute(scene, ray.o, ray.d, ray.maxt)
    elif backend in ("bvh8", "bvh8mxu"):
        # the child-testing walks benefit from the block-coherence
        # presort exactly like the scalar packet kernel
        fn = (traverse_pallas.ray_intersect_bvh8 if backend == "bvh8"
              else traverse_pallas.ray_intersect_bvh8mxu)
        if want():
            t, prim, u, v = _sorted_pallas_intersect(
                scene, ray.o, ray.d, ray.maxt, intersect_fn=fn)
        else:
            t, prim, u, v = fn(scene, ray.o, ray.d, ray.maxt)
    elif backend == "pallas":
        if want():
            t, prim, u, v = _sorted_pallas_intersect(
                scene, ray.o, ray.d, ray.maxt)
        else:
            t, prim, u, v = traverse_pallas.ray_intersect_preliminary(
                scene, ray.o, ray.d, ray.maxt)
    else:
        t, prim, u, v = traverse_jnp.ray_intersect_preliminary(
            scene, ray.o, ray.d, ray.maxt)
    return t, prim, u, v, inst


def ray_intersect(scene: SceneData, ray: Ray,
                  sort=None) -> SurfaceInteraction:
    """Scene::ray_intersect — full wavefront closest hit + shading record.

    `sort`: None = auto presort policy; False skips the coherence
    presort (callers with an already-coherent wavefront, e.g. primary
    camera rays in pixel order)."""
    t, prim, u, v, inst = _preliminary_dispatch(scene, ray, sort=sort)
    pi = PreliminaryIntersection(t=t, prim_index=prim, prim_uv=Vec2(u, v),
                                 inst=inst)
    return compute_surface_interaction(scene, ray, pi)


def ray_intersect_positions(scene: SceneData, ray: Ray):
    """Minimal differentiable closest-hit positions: (p: Vec3, t, valid).

    The reparameterization warp (diff/reparam.py, Loubet 2019) traces
    K auxiliary rays per reparameterized direction and consumes ONLY the
    geometry-following hit position — the full SurfaceInteraction's
    normals, frames, uv and screen-space partials (2/3 of
    compute_surface_interaction's gather traffic and VPU math) are dead
    weight there. This path re-derives the position from the vertex
    tables at DETACHED barycentrics, so p follows the geometry under
    differentiation exactly like si.p does:
      triangle: p = p0 + u e1 + v e2 with (u, v) an exact detached f32
                Möller–Trumbore re-solve of the winning prim;
      sphere:   p = c + r * s with the unit offset s detached — p follows
                center translations and radius scaling.
    `t` is returned DETACHED (the warp's boundary weights stop-grad it
    anyway)."""
    from ..kernels import gather as gth
    sg = jax.lax.stop_gradient
    t, prim, u, v, inst = _preliminary_dispatch(scene, ray)
    idx = jnp.maximum(prim, 0)
    valid = jnp.isfinite(t) & (prim >= 0)
    ptype = gth.scalar(scene.prim_type, idx)
    p0x, p0y, p0z = gth.rows3(scene.prim_p0, idx)
    e1x, e1y, e1z = gth.rows3(scene.prim_e1, idx)
    e2x, e2y, e2z = gth.rows3(scene.prim_e2, idx)
    if scene.has_instances and inst is not None:
        iid = jnp.maximum(inst, 0)
        fw = [gth.scalar(scene.inst_fwd[:, j], iid) for j in range(13)]
        is_tri_l = ptype == PRIM_TRI
        p0x, p0y, p0z = (fw[0] * p0x + fw[1] * p0y + fw[2] * p0z + fw[3],
                         fw[4] * p0x + fw[5] * p0y + fw[6] * p0z + fw[7],
                         fw[8] * p0x + fw[9] * p0y + fw[10] * p0z + fw[11])
        v1 = (fw[0] * e1x + fw[1] * e1y + fw[2] * e1z,
              fw[4] * e1x + fw[5] * e1y + fw[6] * e1z,
              fw[8] * e1x + fw[9] * e1y + fw[10] * e1z)
        e1x = jnp.where(is_tri_l, v1[0], e1x * fw[12])  # sphere: scale r
        e1y = jnp.where(is_tri_l, v1[1], e1y)
        e1z = jnp.where(is_tri_l, v1[2], 0.0)
        v2 = (fw[0] * e2x + fw[1] * e2y + fw[2] * e2z,
              fw[4] * e2x + fw[5] * e2y + fw[6] * e2z,
              fw[8] * e2x + fw[9] * e2y + fw[10] * e2z)
        e2x = jnp.where(is_tri_l, v2[0], 0.0)
        e2y = jnp.where(is_tri_l, v2[1], 0.0)
        e2z = jnp.where(is_tri_l, v2[2], 0.0)
    # exact detached MT re-solve (same discipline as
    # compute_surface_interaction: kernel u/v are the precision-limited
    # MXU-path fallback)
    mt_pvx = ray.d.y * e2z - ray.d.z * e2y
    mt_pvy = ray.d.z * e2x - ray.d.x * e2z
    mt_pvz = ray.d.x * e2y - ray.d.y * e2x
    mt_det = e1x * mt_pvx + e1y * mt_pvy + e1z * mt_pvz
    mt_inv = jnp.where(jnp.abs(mt_det) < 1e-18, 0.0, 1.0 / mt_det)
    tvx, tvy, tvz = ray.o.x - p0x, ray.o.y - p0y, ray.o.z - p0z
    u_x = (tvx * mt_pvx + tvy * mt_pvy + tvz * mt_pvz) * mt_inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v_x = (ray.d.x * qvx + ray.d.y * qvy + ray.d.z * qvz) * mt_inv
    t_x = (e2x * qvx + e2y * qvy + e2z * qvz) * mt_inv
    is_tri = ptype == PRIM_TRI
    # acceptance mask must mirror compute_surface_interaction's ok_x
    # EXACTLY (incl. the isfinite/positive-t guards): a lane where the
    # two paths disagree would hand the reparam warp a followed point
    # far from si.p (r05 review finding)
    ok_x = (valid & is_tri & (mt_inv != 0.0) &
            jnp.isfinite(t_x) & (t_x > 0.0))
    u = sg(jnp.where(ok_x, u_x, u))
    v = sg(jnp.where(ok_x, v_x, v))
    px = p0x + e1x * u + e2x * v
    py = p0y + e1y * u + e2y * v
    pz = p0z + e1z * u + e2z * v
    if scene.has_spheres:
        # mirrors compute_surface_interaction's sphere reprojection
        # EXACTLY (same derivative structure — the reparam FD tests pin
        # the geometry-following behavior of si.p)
        t_safe = jnp.where(valid, t, 1.0)
        r_sph = jnp.maximum(e1x, 1e-20)
        slen = jnp.sqrt(jnp.maximum(
            (ray.o.x + ray.d.x * t_safe - p0x) ** 2 +
            (ray.o.y + ray.d.y * t_safe - p0y) ** 2 +
            (ray.o.z + ray.d.z * t_safe - p0z) ** 2, 1e-30))
        sx = (ray.o.x + ray.d.x * t_safe - p0x) / slen
        sy = (ray.o.y + ray.d.y * t_safe - p0y) / slen
        sz = (ray.o.z + ray.d.z * t_safe - p0z) / slen
        px = jnp.where(is_tri, px, p0x + sx * r_sph)
        py = jnp.where(is_tri, py, p0y + sy * r_sph)
        pz = jnp.where(is_tri, pz, p0z + sz * r_sph)
    return Vec3(px, py, pz), sg(t), valid


def ray_test(scene: SceneData, ray: Ray) -> jnp.ndarray:
    """Scene::ray_test — occlusion query."""
    from ..kernels import brute, traverse_jnp, traverse_pallas
    if scene.shadow_nif is not None:
        # opt-in neural occlusion oracle (render/nif.py): dense matmuls
        # instead of traversal — approximate by design, off by default
        from ..render.nif import nif_ray_test
        return nif_ray_test(scene.shadow_nif, ray.o, ray.d, ray.maxt)
    backend = _pick_backend(scene)
    if scene.has_instances:
        if backend == "pallas":
            if _want_sort(jnp.shape(ray.o.x)[0]):
                return _sorted_pallas_ray_test(scene, ray.o, ray.d, ray.maxt)
            return traverse_pallas.ray_test_instanced(
                scene, ray.o, ray.d, ray.maxt)
        sg = jax.lax.stop_gradient
        return traverse_jnp._ray_test_instanced(
            sg(scene), sg(ray.o), sg(ray.d), sg(ray.maxt))
    if backend == "brute":
        return brute.ray_test_brute(scene, ray.o, ray.d, ray.maxt)
    if backend in ("bvh8", "bvh8mxu"):
        fn = (traverse_pallas.ray_test_bvh8 if backend == "bvh8"
              else traverse_pallas.ray_test_bvh8mxu)
        if _want_sort(jnp.shape(ray.o.x)[0]):
            return _sorted_pallas_ray_test(
                scene, ray.o, ray.d, ray.maxt, test_fn=fn)
        return fn(scene, ray.o, ray.d, ray.maxt)
    if backend == "pallas":
        if _want_sort(jnp.shape(ray.o.x)[0]):
            return _sorted_pallas_ray_test(scene, ray.o, ray.d, ray.maxt)
        return traverse_pallas.ray_test(scene, ray.o, ray.d, ray.maxt)
    return traverse_jnp.ray_test(scene, ray.o, ray.d, ray.maxt)

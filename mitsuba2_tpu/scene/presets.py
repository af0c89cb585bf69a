"""Built-in test scenes (host constructors).

The Cornell box mirrors the classic scene used by the reference's tests and
BASELINE.json configs (resources/data/scenes/cbox upstream): white walls,
red left / green right, area light under the ceiling, two rotated boxes.
Built procedurally (the reference loads OBJ; geometry is equivalent).
"""
from __future__ import annotations

import numpy as np

from ..core.geometry import Transform4
from . import shapes
from .scene import SceneData, build_scene

# Classic Cornell albedos / radiance (Cornell box data, public measurements)
WHITE = [0.730, 0.735, 0.729]
RED = [0.611, 0.0555, 0.062]
GREEN = [0.117, 0.449, 0.115]
LIGHT = [18.4, 15.6, 8.0]


def _quad(p00, p10, p11, p01, bsdf=None, emitter=None, id=""):
    """Two-triangle quad; normal follows CCW winding of (p00,p10,p11,p01)."""
    v = np.asarray([p00, p10, p11, p01], np.float32)
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return shapes.mesh(v, f, uvs=uv, bsdf=bsdf, emitter=emitter, id=id)


def cornell_box(light_radiance=LIGHT, boxes: bool = True) -> SceneData:
    """Unit Cornell box in [0,1]^3; camera on -z looking +z."""
    white = {"type": "diffuse", "reflectance": WHITE}
    red = {"type": "diffuse", "reflectance": RED}
    green = {"type": "diffuse", "reflectance": GREEN}

    s = []
    # floor y=0 (normal +y): CCW seen from above
    s.append(_quad([0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0], bsdf=white, id="floor"))
    # ceiling y=1 (normal -y)
    s.append(_quad([0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1], bsdf=white, id="ceiling"))
    # back wall z=1 (normal -z)
    s.append(_quad([0, 0, 1], [0, 1, 1], [1, 1, 1], [1, 0, 1], bsdf=white, id="back"))
    # viewer-left wall x=1 (normal -x) — red  (camera faces +z, up +y, so
    # the viewer's left is +x; classic Cornell shows red on the left)
    s.append(_quad([1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0], bsdf=red, id="left"))
    # viewer-right wall x=0 (normal +x) — green
    s.append(_quad([0, 0, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1], bsdf=green, id="right"))
    # area light just under the ceiling (normal -y), 0.25 x 0.21
    lx0, lx1 = 0.37, 0.63
    lz0, lz1 = 0.40, 0.61
    ly = 0.9995
    s.append(_quad([lx0, ly, lz0], [lx1, ly, lz0], [lx1, ly, lz1], [lx0, ly, lz1],
                   bsdf=white, emitter={"type": "area", "radiance": light_radiance},
                   id="light"))
    if boxes:
        # tall box: 0.30 x 0.60 x 0.30, rotated +17 deg about y, left/back
        t_tall = (Transform4.translate([0.66, 0.30, 0.65]) @
                  Transform4.rotate([0, 1, 0], 17.0) @
                  Transform4.scale([0.15, 0.30, 0.15]))
        s.append(shapes.cube(bsdf=white, id="tall_box")
                 .transformed(np.asarray(t_tall.matrix)))
        # short box: 0.30 cube, rotated -18 deg, right/front
        t_short = (Transform4.translate([0.33, 0.15, 0.35]) @
                   Transform4.rotate([0, 1, 0], -18.0) @
                   Transform4.scale([0.15, 0.15, 0.15]))
        s.append(shapes.cube(bsdf=white, id="short_box")
                 .transformed(np.asarray(t_short.matrix)))

    cam = Transform4.look_at(origin=[0.5, 0.5, -1.39], target=[0.5, 0.5, 0.5],
                             up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix),
              "fov": 39.5}
    return build_scene(s, sensor)


def veach_mis(envmap: bool = False) -> SceneData:
    """Veach MIS test scene: four increasingly rough metal plates lit by
    four spherical emitters of decreasing size and increasing radiance
    (the classic multiple-importance-sampling stress test; mirrors the
    reference's veach_mis test scene layout). BSDF sampling wins on the
    smooth plates / small lights; NEE wins on rough plates / large lights —
    only MIS renders all 16 combinations with low variance.

    envmap=True adds a dim procedural sky dome (BASELINE config 3 pairs
    area + envmap emitters on this scene), exercising the alias-table
    envmap importance sampling alongside the area-light NEE."""
    plates = []
    alphas = [0.005, 0.02, 0.05, 0.1]
    # plates recede in z and rise in y, tilted to reflect the lights
    for i, a in enumerate(alphas):
        bsdf = {"type": "roughconductor", "material": "Al", "alpha": a}
        t = (Transform4.translate([0.0, -1.6 + 0.45 * i, -2.0 - 0.6 * i]) @
             Transform4.rotate([1, 0, 0], -90 + 25 - 3 * i) @
             Transform4.scale([2.0, 0.25, 1.0]))
        plates.append(shapes.rectangle(bsdf=bsdf, id=f"plate{i}")
                      .transformed(np.asarray(t.matrix)))
    # floor + back wall (diffuse, dim)
    grey = {"type": "diffuse", "reflectance": [0.3, 0.3, 0.3]}
    t_floor = (Transform4.translate([0, -2.0, -3]) @
               Transform4.rotate([1, 0, 0], -90) @
               Transform4.scale([6, 6, 1]))
    plates.append(shapes.rectangle(bsdf=grey, id="floor")
                  .transformed(np.asarray(t_floor.matrix)))
    t_back = (Transform4.translate([0, 0, -6]) @ Transform4.scale([6, 6, 1]))
    plates.append(shapes.rectangle(bsdf=grey, id="back")
                  .transformed(np.asarray(t_back.matrix)))

    # spherical emitters: equal power -> radiance ~ 1/r^2
    radii = [0.30, 0.12, 0.05, 0.02]
    xs = [-1.5, -0.5, 0.5, 1.5]
    for i, (r, x) in enumerate(zip(radii, xs)):
        L = 2.0 * (radii[0] / r) ** 2
        plates.append(shapes.sphere(
            center=(x, 1.2, -3.0), radius=r,
            bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
            emitter={"type": "area", "radiance": [L, L, L]},
            id=f"light{i}"))

    cam = Transform4.look_at(origin=[0, 0.3, 3.0], target=[0, -0.6, -2.5],
                             up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix),
              "fov": 38.0}
    emitters = []
    if envmap:
        # dim gradient sky + bright horizon sun blob: low average radiance
        # (keeps the MIS variance structure of the classic scene) but a
        # strongly peaked distribution so alias-table importance sampling
        # is actually load-bearing, not uniform.
        H, W = 16, 32
        th = (np.arange(H) + 0.5) / H * np.pi
        sky = np.zeros((H, W, 3), np.float32)
        sky[..., 2] = 0.04 + 0.08 * np.cos(th)[:, None]
        sky[..., 0] = 0.02
        sky[..., 1] = 0.03
        sky[4:6, 7:9] = [1.5, 1.3, 0.9]
        emitters = [{"type": "envmap", "data": sky, "scale": 1.0}]
    return build_scene(plates, sensor, emitters=emitters)


def _icosphere(subdiv: int):
    """Unit icosphere: 20 * 4^subdiv triangles. Deterministic midpoint
    subdivision (no RNG)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    for _ in range(subdiv):
        vlist = list(verts)
        cache = {}

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = 0.5 * (vlist[a] + vlist[b])
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c],
                          [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts.astype(np.float32), faces.astype(np.int32)


def _displace(verts, seed: int, amp: float = 0.22):
    """Smooth deterministic radial displacement (sinusoid mix, seeded by
    phase offsets) — turns the sphere into a lumpy blob so the BVH gets
    real depth variation."""
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    s = float(seed)
    bump = (np.sin(4.1 * x + 1.3 * s) * np.sin(3.7 * y + 0.7 * s)
            + 0.6 * np.sin(5.3 * z + 2.1 * s) * np.sin(2.9 * x - s)
            + 0.4 * np.sin(7.1 * y + 0.5 * s))
    r = 1.0 + amp * bump / 2.0
    return verts * r[:, None].astype(np.float32)


def mesh_gallery(subdiv: int = 4, grid: tuple = (3, 2)) -> SceneData:
    """The BVH-bound benchmark scene (VERDICT.md round-2 item 2): a
    Cornell-style room containing a grid of displaced-icosphere blobs —
    20*4^subdiv tris each (subdiv=4, 3x2 grid -> 30 720 blob tris + room),
    enough geometry that traversal (not shading) dominates, the regime
    where the reference leans on its kd-tree/OptiX accel
    (include/mitsuba/render/kdtree.h, scene_optix.inl)."""
    white = {"type": "diffuse", "reflectance": WHITE}
    s = []
    # room [0,3]x[0,2]x[0,3]
    X, Y, Z = 3.0, 2.0, 3.0
    s.append(_quad([0, 0, 0], [0, 0, Z], [X, 0, Z], [X, 0, 0],
                   bsdf=white, id="floor"))
    s.append(_quad([0, Y, 0], [X, Y, 0], [X, Y, Z], [0, Y, Z],
                   bsdf=white, id="ceiling"))
    s.append(_quad([0, 0, Z], [0, Y, Z], [X, Y, Z], [X, 0, Z],
                   bsdf=white, id="back"))
    s.append(_quad([X, 0, 0], [X, 0, Z], [X, Y, Z], [X, Y, 0],
                   bsdf={"type": "diffuse", "reflectance": RED}, id="left"))
    s.append(_quad([0, 0, 0], [0, Y, 0], [0, Y, Z], [0, 0, Z],
                   bsdf={"type": "diffuse", "reflectance": GREEN}, id="right"))
    lx0, lx1, lz0, lz1, ly = 1.1, 1.9, 1.2, 1.8, Y - 5e-4
    s.append(_quad([lx0, ly, lz0], [lx1, ly, lz0], [lx1, ly, lz1],
                   [lx0, ly, lz1], bsdf=white,
                   emitter={"type": "area", "radiance": LIGHT}, id="light"))

    base_v, faces = _icosphere(subdiv)
    nx, nz = grid
    k = 0
    for i in range(nx):
        for j in range(nz):
            v = _displace(base_v.copy(), seed=k)
            scale = 0.34
            cx = (i + 0.5) * X / nx
            cz = (j + 0.75) * Z / (nz + 0.5)
            cy = 0.45 + 0.1 * ((i + j) % 3)
            v = v * scale + np.asarray([cx, cy, cz], np.float32)
            albedo = [[0.7, 0.3, 0.25], [0.3, 0.55, 0.7], [0.65, 0.6, 0.3],
                      [0.5, 0.5, 0.65], [0.35, 0.6, 0.4], [0.6, 0.4, 0.6]]
            s.append(shapes.mesh(
                v, faces,
                bsdf={"type": "diffuse", "reflectance": albedo[k % 6]},
                id=f"blob{k}"))
            k += 1

    cam = Transform4.look_at(origin=[X / 2, 1.0, -2.6],
                             target=[X / 2, 0.8, 1.5], up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix),
              "fov": 50.0}
    return build_scene(s, sensor)


def furnace(albedo=0.8, radiance=1.0) -> SceneData:
    """A diffuse sphere in a constant environment — the analytic furnace
    test: with max_depth=D the sphere radiance is L * sum_{k=1..D-1} rho^k
    ... converging to L * rho/(1-rho); with NEE-counted depth-2 it is
    exactly L * rho (+ L for escaped rays)."""
    s = [shapes.sphere(center=(0, 0, 0), radius=1.0,
                       bsdf={"type": "diffuse", "reflectance": [albedo] * 3})]
    cam = Transform4.look_at(origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix), "fov": 39.0}
    return build_scene(s, sensor,
                       emitters=[{"type": "constant", "radiance": [radiance] * 3}])


def kitchen_sink() -> SceneData:
    """Integration preset exercising many subsystems in ONE scene:
    envmap emitter (procedural sky, Marginal2D importance sampling),
    bitmap-textured diffuse floor, roughconductor with a checkerboard
    roughness TEXTURE, a dielectric sphere, a homogeneous absorber cube,
    an area light, and a thinlens camera (depth of field). Deterministic
    (all data procedural) — used by the golden regression tests."""
    rng = np.random.default_rng(42)

    # procedural sky: horizon-to-zenith gradient + a bright sun blob
    H, W = 32, 64
    th = (np.arange(H) + 0.5) / H * np.pi
    sky = np.zeros((H, W, 3), np.float32)
    sky[..., 2] = 0.3 + 0.5 * np.cos(th)[:, None]          # blue up top
    sky[..., 0] = 0.15 + 0.1 * np.sin(th)[:, None]
    sky[..., 1] = 0.2
    sky[6:9, 10:13] = [6.0, 5.4, 4.2]                      # sun
    envmap = {"type": "envmap", "data": sky, "scale": 1.0}

    # bitmap-textured floor (procedural tiles)
    tex = np.zeros((16, 16, 3), np.float32)
    tex[::2, ::2] = [0.7, 0.3, 0.2]
    tex[1::2, 1::2] = [0.7, 0.3, 0.2]
    tex += rng.uniform(0, 0.1, tex.shape).astype(np.float32)
    floor = shapes.rectangle(
        bsdf={"type": "diffuse",
              "reflectance": {"type": "bitmap", "data": tex}}).transformed(
        np.asarray((Transform4.translate([0, -1.0, 0])
                    @ Transform4.rotate([1, 0, 0], -90.0)
                    @ Transform4.scale([4.0, 4.0, 1.0])).matrix))

    # rough conductor cube with spatially-varying roughness
    metal = shapes.cube(
        bsdf={"type": "roughconductor", "material": "Au",
              "alpha": {"type": "checkerboard", "color0": [0.05] * 3,
                        "color1": [0.4] * 3}}).transformed(
        np.asarray((Transform4.translate([-1.4, -0.5, 0.6])
                    @ Transform4.rotate([0, 1, 0], 25.0)
                    @ Transform4.scale([0.5, 0.5, 0.5])).matrix))

    # smooth glass sphere (focus target)
    glass = shapes.sphere(center=(0.0, -0.4, 0.0), radius=0.6,
                          bsdf={"type": "dielectric", "int_ior": 1.5})

    # absorbing medium in a null cube
    fog = shapes.cube(bsdf={"type": "null"}).transformed(
        np.asarray((Transform4.translate([1.5, -0.55, -0.2])
                    @ Transform4.scale([0.45, 0.45, 0.45])).matrix))
    fog.interior = {"type": "homogeneous", "sigma_t": 1.2, "albedo": 0.6,
                    "g": 0.4}

    # small warm area light
    light = _quad([0.6, 1.4, -0.9], [1.4, 1.4, -0.9],
                  [1.4, 1.4, -0.1], [0.6, 1.4, -0.1],
                  bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
                  emitter={"type": "area", "radiance": [9.0, 7.0, 4.0]},
                  id="klight")

    cam = Transform4.look_at(origin=[0.3, 0.4, -3.4], target=[0, -0.4, 0],
                             up=[0, 1, 0])
    sensor = {"type": "thinlens", "to_world": np.asarray(cam.matrix),
              "fov": 42.0, "aperture_radius": 0.06,
              "focus_distance": float(np.linalg.norm([0.3, 0.8, -3.4]))}
    return build_scene([floor, metal, glass, fog, light], sensor,
                       emitters=[envmap])


def instanced_field(n: int = 64, subdiv: int = 3,
                    flatten: bool = False) -> SceneData:
    """Shared-BLAS instancing stress scene: an n-instance field of ONE
    displaced-icosphere blob (20*4^subdiv tris stored once) over a ground
    plane, under a constant sky. With subdiv=3 and n=64 the scene
    resolves 64 * 5120 = 327k EFFECTIVE triangles from 5.1k stored prims
    — the regime the reference handles with OptiX instance acceleration
    structures (IAS) and the flattened build cannot scale to in HBM.
    flatten=True duplicates the transformed prims instead (the
    flatten-vs-shared bake-off arm: flat scenes reach the MXU cluster
    backend at K x the prim memory)."""
    rng = np.random.default_rng(7)
    base_v, faces = _icosphere(subdiv)
    v = _displace(base_v.copy(), seed=3)
    grp = shapes.shapegroup([shapes.mesh(
        v, faces, bsdf={"type": "diffuse", "reflectance": [0.55, 0.5, 0.4]},
        id="blob")], id="blob_grp")

    side = int(np.ceil(np.sqrt(n)))
    s = [_quad([-side, 0, -side], [-side, 0, side], [side, 0, side],
               [side, 0, -side], bsdf={"type": "diffuse",
                                       "reflectance": WHITE}, id="ground")]
    for k in range(n):
        i, j = divmod(k, side)
        t = (Transform4.translate([2.0 * i - side + 1.0,
                                   0.45 + 0.15 * float(rng.uniform()),
                                   2.0 * j - side + 1.0])
             @ Transform4.rotate([0, 1, 0], float(rng.uniform(0, 360)))
             @ Transform4.scale([0.35 + 0.15 * float(rng.uniform())] * 3))
        inst = shapes.instance(grp, np.asarray(t.matrix), id=f"b{k}",
                               flatten=flatten)
        s.extend(inst) if flatten else s.append(inst)

    cam = Transform4.look_at(origin=[0.0, side * 0.8, -side * 1.6],
                             target=[0.0, 0.3, 0.0], up=[0, 1, 0])
    sensor = {"type": "perspective", "to_world": np.asarray(cam.matrix),
              "fov": 55.0}
    return build_scene(s, sensor,
                       [{"type": "constant", "radiance": [0.9, 0.95, 1.0]}])


def smoke_box(res: int = 32) -> SceneData:
    """Volumetric benchmark preset: a procedural smoke plume (res^3
    heterogeneous density grid, scattering albedo 0.7, HG g=0.3) in a
    null-boundary box over a diffuse floor, lit by an area light above —
    the volpath transport bench scene (bench.py's volumetric metric) and
    the scaled-up version of examples/smoke_recovery.py's slab.
    Deterministic (procedural turbulence from a fixed seed)."""
    rng = np.random.default_rng(7)
    # plume: vertical Gaussian column modulated by octave noise
    z, y, x = np.meshgrid(np.linspace(-1, 1, res),
                          np.linspace(-1, 1, res),
                          np.linspace(-1, 1, res), indexing="ij")
    h = (z + 1.0) * 0.5                      # 0 at bottom, 1 at top
    r2 = x * x + y * y
    core = np.exp(-r2 / (0.08 + 0.35 * h * h))   # widening column
    noise = np.zeros_like(core)
    for oct_ in range(3):
        k = 2 ** oct_
        n = rng.uniform(-1, 1, (4 * k, 4 * k, 4 * k)).astype(np.float32)
        reps = -(-res // (4 * k))
        n = np.tile(n, (reps, reps, reps))[:res, :res, :res]
        noise += n / (1.6 ** oct_)
    dens = np.clip(core * (0.75 + 0.45 * noise) * (1.0 - 0.55 * h),
                   0.0, None).astype(np.float32)

    box = shapes.cube(bsdf={"type": "null"}, id="smoke").transformed(
        np.asarray((Transform4.translate([0, 0.9, 0])
                    @ Transform4.scale([0.8, 0.9, 0.8])).matrix))
    box.interior = {"type": "heterogeneous", "sigma_t": 4.0,
                    "albedo": 0.7, "g": 0.3, "density": dens,
                    "bbox_min": [-0.8, 0.0, -0.8],
                    "bbox_max": [0.8, 1.8, 0.8]}
    floor = shapes.rectangle(
        bsdf={"type": "diffuse", "reflectance": [0.5] * 3},
        id="floor").transformed(
        np.asarray((Transform4.rotate([1, 0, 0], -90)
                    @ Transform4.scale([3.0, 3.0, 1.0])).matrix))
    light = _quad([-0.5, 2.6, -0.5], [0.5, 2.6, -0.5],
                  [0.5, 2.6, 0.5], [-0.5, 2.6, 0.5],
                  bsdf={"type": "diffuse", "reflectance": [0, 0, 0]},
                  emitter={"type": "area", "radiance": [14.0] * 3},
                  id="slight")
    cam = Transform4.look_at(origin=[0.0, 1.1, -3.2],
                             target=[0.0, 0.9, 0.0], up=[0, 1, 0])
    return build_scene([box, floor, light],
                       {"type": "perspective",
                        "to_world": np.asarray(cam.matrix), "fov": 40.0})

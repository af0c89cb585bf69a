"""Sensors: camera ray generation.

TPU-native rebuild of mitsuba2's Sensor/ProjectiveCamera layer + plugins
(src/librender/sensor.cpp; src/sensors/{perspective,thinlens,orthographic,
radiancemeter}.cpp). Ray-gen is the first jit stage of a render pass:
film-plane positions in [0,1]^2 -> world-space rays. Conventions match the
reference: `to_world` columns are (left, up, forward) from
Transform4.look_at; fov is the horizontal (x) field of view; film v runs
top to bottom. The sensor type is static (scene.cam_type), so only the
active camera's code is traced.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.geometry import Ray
from ..core.vec import Vec2, Vec3, as_vec2, vnormalize

# cam_data layout: [aperture_radius, focus_distance, ortho_scale_x, ortho_scale_y]
CAM_W = 4


def _film_to_cam_xy(scene, uv: Vec2):
    """Film uv -> direction components on the z=1 camera plane."""
    uv = as_vec2(uv)
    tx = jnp.tan(jnp.deg2rad(scene.cam_fov_x) * 0.5)
    return ((1.0 - 2.0 * uv.x) * tx,
            (1.0 - 2.0 * uv.y) * tx)


def perspective_ray(scene, uv, wavelengths=None, time=None) -> Ray:
    """uv: planar Vec2 film positions in [0,1]^2 -> camera rays (N lanes).

    With a keyframed camera (scene.cam_motion) and per-lane shutter times,
    rays originate from the time-interpolated pose — camera motion blur
    (Sensor::sample_ray's `time` argument + AnimatedTransform eval)."""
    x, y = _film_to_cam_xy(scene, uv)
    z = jnp.ones_like(x)
    if scene.cam_motion is not None and time is not None:
        d_world = vnormalize(
            scene.cam_motion.apply_vector(time, Vec3(x, y, z)))
        o = scene.cam_motion.translation(time)
        return Ray.make(o, d_world, time=time, wavelengths=wavelengths)
    mat = scene.cam_to_world
    d_world = vnormalize(Vec3(
        mat[0, 0] * x + mat[0, 1] * y + mat[0, 2] * z,
        mat[1, 0] * x + mat[1, 1] * y + mat[1, 2] * z,
        mat[2, 0] * x + mat[2, 1] * y + mat[2, 2] * z))
    o = Vec3(jnp.broadcast_to(mat[0, 3], x.shape),
             jnp.broadcast_to(mat[1, 3], x.shape),
             jnp.broadcast_to(mat[2, 3], x.shape))
    return Ray.make(o, d_world, wavelengths=wavelengths)


def thinlens_ray(scene, uv, u_lens, wavelengths=None) -> Ray:
    """Thin-lens camera (sensors/thinlens.cpp): origin jittered on the
    aperture disk, rays converge on the focus plane."""
    mat = scene.cam_to_world
    aperture = scene.cam_data[0]
    focus = scene.cam_data[1]
    x, y = _film_to_cam_xy(scene, uv)
    # point on the focus plane (camera space)
    p_focus = Vec3(x * focus, y * focus, jnp.broadcast_to(focus, x.shape))
    lx, ly = warp.square_to_uniform_disk_concentric(u_lens)
    o_cam = Vec3(lx * aperture, ly * aperture, jnp.zeros_like(lx))
    d_cam = vnormalize(p_focus - o_cam)
    from ..core.geometry import Transform4
    t = Transform4.from_matrix(mat)
    d_world = vnormalize(t.apply_vector(d_cam))
    o_world = t.apply_point(o_cam)
    return Ray.make(o_world, d_world, wavelengths=wavelengths)


def orthographic_ray(scene, uv, wavelengths=None) -> Ray:
    """Orthographic camera (sensors/orthographic.cpp): parallel rays along
    +z; extent set by the to_world scale (cam_data[2:4])."""
    mat = scene.cam_to_world
    uv = as_vec2(uv)
    sx = scene.cam_data[2]
    sy = scene.cam_data[3]
    x = (1.0 - 2.0 * uv.x) * sx
    y = (1.0 - 2.0 * uv.y) * sy
    from ..core.geometry import Transform4
    t = Transform4.from_matrix(mat)
    o_world = t.apply_point(Vec3(x, y, jnp.zeros_like(x)))
    fwd = mat[:3, 2] / jnp.linalg.norm(mat[:3, 2])
    d_world = Vec3(jnp.broadcast_to(fwd[0], x.shape),
                   jnp.broadcast_to(fwd[1], x.shape),
                   jnp.broadcast_to(fwd[2], x.shape))
    return Ray.make(o_world, d_world, wavelengths=wavelengths)


def radiancemeter_ray(scene, uv, wavelengths=None) -> Ray:
    """Radiance meter (sensors/radiancemeter.cpp): every lane measures the
    radiance along ONE ray — origin and +z direction from to_world."""
    uv = as_vec2(uv)
    mat = scene.cam_to_world
    shape = jnp.shape(uv.x)
    o = Vec3(jnp.broadcast_to(mat[0, 3], shape),
             jnp.broadcast_to(mat[1, 3], shape),
             jnp.broadcast_to(mat[2, 3], shape))
    fwd = mat[:3, 2] / jnp.linalg.norm(mat[:3, 2])
    d = Vec3(jnp.broadcast_to(fwd[0], shape),
             jnp.broadcast_to(fwd[1], shape),
             jnp.broadcast_to(fwd[2], shape))
    return Ray.make(o, d, wavelengths=wavelengths)


def irradiancemeter_ray(scene, uv, u_lens, wavelengths=None) -> Ray:
    """Irradiance meter (sensors/irradiancemeter.cpp): measures E =
    ∫ L cosθ dω over the to_world unit rectangle. Film uv picks the surface
    point; directions are cosine-sampled (pdf = cosθ/π), so the sensor
    importance weight π is applied by the integrator via scene.cam_weight."""
    from ..core.geometry import Transform4
    uv = as_vec2(uv)
    t = Transform4.from_matrix(scene.cam_to_world)
    p_local = Vec3(2.0 * uv.x - 1.0, 2.0 * uv.y - 1.0, jnp.zeros_like(uv.x))
    o_world = t.apply_point(p_local)
    d_local = warp.square_to_cosine_hemisphere(u_lens)
    d_world = vnormalize(t.apply_vector(d_local))
    return Ray.make(o_world, d_world, wavelengths=wavelengths)


def distant_ray(scene, uv, wavelengths=None) -> Ray:
    """Distant sensor (sensors/distant.cpp): parallel rays from outside the
    scene along to_world's +z; film uv spans the scene's bounding disk."""
    uv = as_vec2(uv)
    mat = scene.cam_to_world
    c = scene.cam_data[4:7]     # scene bbox center (packed at build)
    r = scene.cam_data[7]       # scene bounding radius
    fwd = mat[:3, 2] / jnp.linalg.norm(mat[:3, 2])
    right = mat[:3, 0] / jnp.linalg.norm(mat[:3, 0])
    up = mat[:3, 1] / jnp.linalg.norm(mat[:3, 1])
    x = (2.0 * uv.x - 1.0) * r
    y = (2.0 * uv.y - 1.0) * r
    ox = c[0] - fwd[0] * (2.0 * r) + right[0] * x + up[0] * y
    oy = c[1] - fwd[1] * (2.0 * r) + right[1] * x + up[1] * y
    oz = c[2] - fwd[2] * (2.0 * r) + right[2] * x + up[2] * y
    d = Vec3(jnp.broadcast_to(fwd[0], jnp.shape(x)),
             jnp.broadcast_to(fwd[1], jnp.shape(x)),
             jnp.broadcast_to(fwd[2], jnp.shape(x)))
    return Ray.make(Vec3(ox, oy, oz), d, wavelengths=wavelengths)


# Sensors whose per-lane direction needs an extra 2D sample (render_pass
# draws u_lens for these)
NEEDS_APERTURE_SAMPLE = ("thinlens", "irradiancemeter")


def _apply_clip(scene, ray: Ray) -> Ray:
    """projective_camera.cpp near/far clip: camera rays start on the
    z=near plane and end on the z=far plane, so the along-ray distances
    scale by 1/cos(d, camera forward). Defaults (0, inf) are the
    identity. With a keyframed camera the base pose's forward axis is
    used (exact for pure translation shutters)."""
    near = scene.cam_data[8]
    far = scene.cam_data[9]
    fx, fy, fz = (scene.cam_to_world[0, 2], scene.cam_to_world[1, 2],
                  scene.cam_to_world[2, 2])
    # to_world may carry scale (orthographic extent, scaled rigs) — the
    # clip planes are measured along the NORMALIZED camera axis
    fn = jnp.sqrt(fx * fx + fy * fy + fz * fz)
    fx, fy, fz = fx / fn, fy / fn, fz / fn
    cos_z = jnp.maximum(ray.d.x * fx + ray.d.y * fy + ray.d.z * fz, 1e-6)
    near_t = near / cos_z
    o = Vec3(ray.o.x + ray.d.x * near_t, ray.o.y + ray.d.y * near_t,
             ray.o.z + ray.d.z * near_t)
    maxt = jnp.minimum(ray.maxt, (far - near) / cos_z)
    return Ray(o=o, d=ray.d, maxt=maxt, time=ray.time,
               wavelengths=ray.wavelengths)


def sample_ray(scene, uv, u_lens, wavelengths=None, time=None) -> Ray:
    """Sensor::sample_ray dispatch (static on cam_type)."""
    kind = scene.cam_type
    if kind == "perspective":
        return _apply_clip(scene,
                           perspective_ray(scene, uv, wavelengths, time=time))
    if kind == "thinlens":
        return _apply_clip(scene, thinlens_ray(scene, uv, u_lens, wavelengths))
    if kind == "orthographic":
        return _apply_clip(scene, orthographic_ray(scene, uv, wavelengths))
    if kind == "radiancemeter":
        return radiancemeter_ray(scene, uv, wavelengths)
    if kind == "irradiancemeter":
        return irradiancemeter_ray(scene, uv, u_lens, wavelengths)
    if kind == "distant":
        return distant_ray(scene, uv, wavelengths)
    raise ValueError(f"unknown sensor type {kind!r}")


# Sensors for which a one-pixel film offset defines a meaningful footprint
HAS_DIFFERENTIALS = ("perspective", "thinlens", "orthographic")


def sample_ray_differential(scene, uv, u_lens, film_width: int,
                            wavelengths=None, time=None) -> Ray:
    """Sensor::sample_ray_differential (sensor.cpp): the main ray plus the
    rays through the film samples one pixel over in x and in y. film_uv
    scales BOTH uv axes by 1/film_width (square pixels), so a one-pixel
    offset is 1/film_width along either uv axis. Sensors without a film
    footprint (meters, distant) return a plain Ray."""
    from ..core.geometry import RayDifferential
    kind = scene.cam_type
    main = sample_ray(scene, uv, u_lens, wavelengths, time=time)
    if kind not in HAS_DIFFERENTIALS:
        return main
    duv = 1.0 / film_width
    uv_x = Vec2(uv.x + duv, uv.y)
    uv_y = Vec2(uv.x, uv.y + duv)
    # offset rays reuse the SAME aperture sample (thinlens) and the same
    # shutter time: the footprint is the film-plane derivative
    rx = sample_ray(scene, uv_x, u_lens, wavelengths, time=time)
    ry = sample_ray(scene, uv_y, u_lens, wavelengths, time=time)
    return RayDifferential(o=main.o, d=main.d, maxt=main.maxt,
                           time=main.time, wavelengths=main.wavelengths,
                           o_x=rx.o, o_y=ry.o, d_x=rx.d, d_y=ry.d)


def film_uv(x, y, jitter, width: int, height: int,
            crop=(0, 0, None, None)) -> Vec2:
    """Pixel indices + jitter -> uv with aspect-corrected v.

    Returns planar Vec2: u in [0,1], v scaled so square pixels are preserved
    for non-square films (fov applies to x). `crop` = (crop_x, crop_y,
    film_width, film_height): when set, (x, y) index the CROP window while
    uv spans the FULL film (films/hdrfilm.cpp crop semantics)."""
    jx, jy = (jitter if isinstance(jitter, (tuple, list))
              else (jitter.x, jitter.y))
    cx, cy, fw, fh = crop
    fw = fw or width
    fh = fh or height
    u = (x + cx + jx) / fw
    v = (y + cy + jy) / fw * 1.0  # same scale as u (square pixels)
    # center the v range: film of H rows spans H/W of the u unit
    v = v + 0.5 * (1.0 - fh / fw)
    return Vec2(u, v)

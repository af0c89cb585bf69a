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
from ..core.geometry import Ray, normalize

# cam_data layout: [aperture_radius, focus_distance, ortho_scale_x, ortho_scale_y]
CAM_W = 4


def _film_to_cam_xy(scene, uv):
    """Film uv -> direction components on the z=1 camera plane."""
    tx = jnp.tan(jnp.deg2rad(scene.cam_fov_x) * 0.5)
    return ((1.0 - 2.0 * uv[..., 0]) * tx,
            (1.0 - 2.0 * uv[..., 1]) * tx)


def perspective_ray(scene, uv, wavelengths=None) -> Ray:
    """uv: (N, 2) film positions in [0,1]^2 -> camera rays (N lanes)."""
    mat = scene.cam_to_world
    x, y = _film_to_cam_xy(scene, uv)
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d_world = normalize(d_cam @ mat[:3, :3].T)
    o = jnp.broadcast_to(mat[:3, 3], d_world.shape)
    return Ray.make(o, d_world, wavelengths=wavelengths)


def thinlens_ray(scene, uv, u_lens, wavelengths=None) -> Ray:
    """Thin-lens camera (sensors/thinlens.cpp): origin jittered on the
    aperture disk, rays converge on the focus plane."""
    mat = scene.cam_to_world
    aperture = scene.cam_data[0]
    focus = scene.cam_data[1]
    x, y = _film_to_cam_xy(scene, uv)
    # point on the focus plane (camera space)
    p_focus = jnp.stack([x * focus, y * focus,
                         jnp.broadcast_to(focus, x.shape)], axis=-1)
    p_lens2 = warp.square_to_uniform_disk_concentric(u_lens) * aperture
    o_cam = jnp.concatenate([p_lens2, jnp.zeros_like(p_lens2[..., :1])], -1)
    d_cam = normalize(p_focus - o_cam)
    d_world = normalize(d_cam @ mat[:3, :3].T)
    o_world = o_cam @ mat[:3, :3].T + mat[:3, 3]
    return Ray.make(o_world, d_world, wavelengths=wavelengths)


def orthographic_ray(scene, uv, wavelengths=None) -> Ray:
    """Orthographic camera (sensors/orthographic.cpp): parallel rays along
    +z; extent set by the to_world scale (cam_data[2:4])."""
    mat = scene.cam_to_world
    sx = scene.cam_data[2]
    sy = scene.cam_data[3]
    x = (1.0 - 2.0 * uv[..., 0]) * sx
    y = (1.0 - 2.0 * uv[..., 1]) * sy
    o_cam = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    o_world = o_cam @ mat[:3, :3].T + mat[:3, 3]
    d_world = jnp.broadcast_to(normalize(mat[:3, 2]), o_world.shape)
    return Ray.make(o_world, d_world, wavelengths=wavelengths)


def sample_ray(scene, uv, u_lens, wavelengths=None) -> Ray:
    """Sensor::sample_ray_differential dispatch (static on cam_type)."""
    kind = scene.cam_type
    if kind == "perspective":
        return perspective_ray(scene, uv, wavelengths)
    if kind == "thinlens":
        return thinlens_ray(scene, uv, u_lens, wavelengths)
    if kind == "orthographic":
        return orthographic_ray(scene, uv, wavelengths)
    raise ValueError(f"unknown sensor type {kind!r}")


def film_uv(x, y, jitter, width: int, height: int):
    """Pixel indices + jitter -> uv with aspect-corrected v.

    Returns (N, 2): u in [0,1], v scaled so square pixels are preserved for
    non-square films (fov applies to x)."""
    u = (x + jitter[..., 0]) / width
    v = (y + jitter[..., 1]) / width * 1.0  # same scale as u (square pixels)
    # center the v range: film of H rows spans H/W of the u unit
    v = v + 0.5 * (1.0 - height / width)
    return jnp.stack([u, v], axis=-1)

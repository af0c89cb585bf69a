"""Sensors: camera ray generation.

TPU-native rebuild of mitsuba2's Sensor/ProjectiveCamera layer +
`perspective` plugin (src/librender/sensor.cpp, src/sensors/perspective.cpp).
Ray-gen is the first jit stage of a render pass: film-plane positions in
[0,1]^2 -> world-space rays. Conventions match the reference: `to_world`
columns are (left, up, forward) from Transform4.look_at; fov is the
horizontal (x) field of view; film v runs top to bottom.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.geometry import Ray, normalize


def perspective_ray(scene, uv, wavelengths=None) -> Ray:
    """uv: (N, 2) film positions in [0,1]^2 -> camera rays (N lanes)."""
    mat = scene.cam_to_world
    tx = jnp.tan(jnp.deg2rad(scene.cam_fov_x) * 0.5)
    # aspect from the film is applied by the caller via uv scaling; here we
    # assume square pixels: ty = tx * (dv/du ratio baked into uv)
    d_cam = jnp.stack([
        (1.0 - 2.0 * uv[..., 0]) * tx,
        (1.0 - 2.0 * uv[..., 1]) * tx,   # caller pre-scales v by aspect
        jnp.ones_like(uv[..., 0])], axis=-1)
    d_world = normalize(d_cam @ mat[:3, :3].T)
    o = jnp.broadcast_to(mat[:3, 3], d_world.shape)
    return Ray.make(o, d_world, wavelengths=wavelengths)


def film_uv(x, y, jitter, width: int, height: int):
    """Pixel indices + jitter -> uv with aspect-corrected v.

    Returns (N, 2): u in [0,1], v scaled so square pixels are preserved for
    non-square films (fov applies to x)."""
    u = (x + jitter[..., 0]) / width
    v = (y + jitter[..., 1]) / width * 1.0  # same scale as u (square pixels)
    # center the v range: film of H rows spans H/W of the u unit
    v = v + 0.5 * (1.0 - height / width)
    return jnp.stack([u, v], axis=-1)

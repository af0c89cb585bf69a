"""Interaction records — the central wavefront state.

TPU-native rebuild of mitsuba2's interaction/record types
(include/mitsuba/render/interaction.h, records.h). Each record is a SoA
pytree: a `SurfaceInteraction` holding N lanes is a struct of (N, ...)
arrays. The two-phase hit pipeline is preserved: the traversal kernel
produces a compact `PreliminaryIntersection` (t, prim, barycentrics);
`compute_surface_interaction` expands it to a full shading record.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import math as m
from ..core.geometry import Frame, Ray, as_vec3, dot
from ..core.vec import Vec2, Vec3, vdot, vmax_abs


@struct.dataclass
class PreliminaryIntersection:
    """Output of the traversal kernel (scene_optix.inl's PreliminaryIntersection)."""
    t: jnp.ndarray          # (N,) hit distance, inf = miss
    prim_index: jnp.ndarray  # (N,) int32 index into packed prim arrays, -1 = miss
    prim_uv: Vec2           # barycentrics (triangles) / sphere params
    # instance id per lane (shared-BLAS instancing; the OptiX-IAS
    # instance index analog). None on scenes without instances.
    inst: jnp.ndarray = None

    @property
    def valid(self):
        return jnp.isfinite(self.t)


@struct.dataclass
class SurfaceInteraction:
    """Full surface interaction (include/mitsuba/render/interaction.h).

    wi is in the LOCAL shading frame (mitsuba convention). Positions/
    directions are planar Vec3, uv is planar Vec2, wavelengths a planar
    Spec or None (core/vec.py layout note)."""
    valid: jnp.ndarray       # (N,) bool
    t: jnp.ndarray           # (N,)
    p: Vec3                  # hit position
    n: Vec3                  # geometric normal
    sh_frame: Frame          # shading frame (n = shading normal)
    uv: Vec2                 # surface parameterization
    wi: Vec3                 # incident dir, LOCAL frame, points away from surface
    shape: jnp.ndarray       # (N,) int32 shape index, -1 = none
    prim_index: jnp.ndarray  # (N,) int32
    wavelengths: object      # Spec (spectral mode) or None
    # Texture atlas reference (scene.textures), threaded through so textured
    # spectrum slots can gather at si.uv; None = scene has no textures.
    tex: object = None
    # Screen-space uv derivatives (interaction.h::compute_uv_partials),
    # present when the camera ray carried differentials; drives texture-LOD
    # filtering in texture.eval_rgb. Planar Vec2 or None.
    duv_dx: object = None
    duv_dy: object = None

    def to_world(self, v) -> Vec3:
        return self.sh_frame.to_world(v)

    def to_local(self, v) -> Vec3:
        return self.sh_frame.to_local(v)

    def spawn_ray_d(self, d_world, maxt=None):
        """Offset along the geometric normal (Interaction::spawn_ray)."""
        d_world = as_vec3(d_world)
        eps = m.mulsign(
            jnp.float32(m.RAY_EPSILON) * (1.0 + vmax_abs(self.p)),
            vdot(self.n, d_world))
        return Ray.make(self.p + self.n * eps, d_world, maxt=maxt,
                        wavelengths=self.wavelengths)


@struct.dataclass
class PositionSample:
    """PositionSample3f (records.h)."""
    p: Vec3
    n: Vec3
    uv: Vec2
    pdf: jnp.ndarray    # (N,) area-measure pdf
    delta: jnp.ndarray  # (N,) bool


@struct.dataclass
class DirectionSample:
    """DirectionSample3f — a position sample seen from a reference point,
    with the pdf converted to solid angle at the reference (records.h)."""
    p: Vec3              # sampled position on the emitter
    n: Vec3              # normal at sampled position
    uv: Vec2             # surface parameterization at p
    d: Vec3              # unit vector from ref to p
    dist: jnp.ndarray    # (N,)
    pdf: jnp.ndarray     # (N,) solid-angle pdf (0 = invalid)
    delta: jnp.ndarray   # (N,) bool (point/directional emitters)
    emitter: jnp.ndarray  # (N,) int32 emitter index, -1 = none

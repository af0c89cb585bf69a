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
from ..core.geometry import Frame, Ray, dot


@struct.dataclass
class PreliminaryIntersection:
    """Output of the traversal kernel (scene_optix.inl's PreliminaryIntersection)."""
    t: jnp.ndarray          # (N,) hit distance, inf = miss
    prim_index: jnp.ndarray  # (N,) int32 index into packed prim arrays, -1 = miss
    prim_uv: jnp.ndarray    # (N, 2) barycentrics (triangles) / sphere params

    @property
    def valid(self):
        return jnp.isfinite(self.t)


@struct.dataclass
class SurfaceInteraction:
    """Full surface interaction (include/mitsuba/render/interaction.h).

    wi is in the LOCAL shading frame (mitsuba convention)."""
    valid: jnp.ndarray       # (N,) bool
    t: jnp.ndarray           # (N,)
    p: jnp.ndarray           # (N, 3)
    n: jnp.ndarray           # (N, 3) geometric normal
    sh_frame: Frame          # shading frame (n = shading normal)
    uv: jnp.ndarray          # (N, 2)
    wi: jnp.ndarray          # (N, 3) incident dir, LOCAL frame, points away from surface
    shape: jnp.ndarray       # (N,) int32 shape index, -1 = none
    prim_index: jnp.ndarray  # (N,) int32
    wavelengths: jnp.ndarray  # (N, C)
    # Texture atlas reference (scene.textures), threaded through so textured
    # spectrum slots can gather at si.uv; None = scene has no textures.
    tex: object = None

    def to_world(self, v):
        return self.sh_frame.to_world(v)

    def to_local(self, v):
        return self.sh_frame.to_local(v)

    def spawn_ray_d(self, d_world, maxt=None):
        """Offset along the geometric normal (Interaction::spawn_ray)."""
        offset = self.n * m.mulsign(
            jnp.float32(m.RAY_EPSILON) * (1.0 + jnp.max(jnp.abs(self.p), axis=-1, keepdims=True)),
            dot(self.n, d_world, keepdims=True))
        return Ray.make(self.p + offset, d_world, maxt=maxt, wavelengths=self.wavelengths)


@struct.dataclass
class PositionSample:
    """PositionSample3f (records.h)."""
    p: jnp.ndarray      # (N, 3)
    n: jnp.ndarray      # (N, 3)
    uv: jnp.ndarray     # (N, 2)
    pdf: jnp.ndarray    # (N,) area-measure pdf
    delta: jnp.ndarray  # (N,) bool


@struct.dataclass
class DirectionSample:
    """DirectionSample3f — a position sample seen from a reference point,
    with the pdf converted to solid angle at the reference (records.h)."""
    p: jnp.ndarray       # (N, 3) sampled position on the emitter
    n: jnp.ndarray       # (N, 3) normal at sampled position
    uv: jnp.ndarray      # (N, 2)
    d: jnp.ndarray       # (N, 3) unit vector from ref to p
    dist: jnp.ndarray    # (N,)
    pdf: jnp.ndarray     # (N,) solid-angle pdf (0 = invalid)
    delta: jnp.ndarray   # (N,) bool (point/directional emitters)
    emitter: jnp.ndarray  # (N,) int32 emitter index, -1 = none

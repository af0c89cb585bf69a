"""mitsuba2_tpu — a TPU-native differentiable Monte-Carlo renderer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Mitsuba 2
(the reference `MetaHG/mitsuba2`): wavefront path tracing over SoA ray
pytrees, host-built BVH + device traversal kernels, chi^2-tested sampling,
mono/RGB/spectral color modes, JAX-native differentiation with adjoint
(radiative-backprop-style) transport, and multi-chip scaling via shard_map.
See SURVEY.md for the full blueprint.
"""
from .config import RenderConfig  # noqa: F401

__version__ = "0.1.0"

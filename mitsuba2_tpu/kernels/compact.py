"""Path-state compaction / wavefront sorting.

SURVEY.md §5.7's named subsystem: the reference masks dead lanes per bounce
without compaction (a known inefficiency of its megakernel design); the
TPU rebuild instead PERMUTES the wavefront between bounces, keeping shapes
static (§7.3 item 3 — pack, don't shrink):

- dead lanes sort to the back (so packet blocks at the front stay dense);
- live lanes sort by the Morton code of their hit position, which makes
  the next bounce's shadow + continuation rays spatially coherent — the
  property the block-synchronous Pallas packet kernel (traverse_pallas.py)
  converts into node-culling efficiency.

Permuting EVERY per-lane state array (including the PCG32 sampler state)
preserves each lane's sampling DECISIONS exactly (the PCG32 streams are
untouched); the arithmetic results agree to allclose, not bit-exactly —
XLA fuses the permuted pass differently, so float rounding can differ in
the last ulp (tests/test_compact.py pins rtol=1e-5). The integrator
carries the original lane index and unsorts the radiance at the end.

MEASURED (Cornell 256x256 spp16 depth-8 + RR, one TPU v5-lite chip):
full-carry compaction costs 100x (112 ms -> 11.8 s per 4-pass render):
the Morton argsort of 1M keys plus the gather-permute of every carry
array per bounce dwarf any coherence benefit. Keep `config.compact` OFF.

ROUND-2 division of labor: the PRODUCTION coherence path is the
per-traversal-call sort in scene/scene.py (`_sorted_pallas_intersect` /
`_sorted_pallas_ray_test`), which permutes only the RAY arrays via a
multi-operand lax.sort (payload-carrying sort, ~15 ms/M lanes — ~10x
cheaper than gather-permute; see kernels/gather.py measured rules) using
this module's `morton3` keys, and unsorts just the hit records. This
module's full-carry permute remains for the AOV/debug path and as the
reference point those measurements were taken against.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _part1by2(x):
    """Spread bits of a 10-bit int: b9..b0 -> b9 0 0 b8 0 0 ... (Morton)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3(p, lo, hi):
    """Points in [lo, hi]^3 -> 30-bit Morton codes (math.h::morton).
    p: planar Vec3 or (N, 3) array; lo/hi: (3,) arrays."""
    if not hasattr(p, "x"):
        from ..core.vec import Vec3
        p = Vec3.from_array(p)
    ext = jnp.maximum(hi - lo, 1e-20)
    def q(c, k):
        t = jnp.clip((c - lo[k]) / ext[k], 0.0, 1.0)
        return (t * 1023.0).astype(jnp.uint32)
    return (_part1by2(q(p.x, 0)) |
            (_part1by2(q(p.y, 1)) << 1) |
            (_part1by2(q(p.z, 2)) << 2))


def compaction_order(active, p, bb_min, bb_max):
    """Permutation: live lanes first, Morton-ordered by position `p`.

    Returns (N,) int32 `perm` such that arr[perm] is the compacted layout.
    """
    key = morton3(p, bb_min, bb_max)
    key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))  # dead to the back
    return jnp.argsort(key).astype(jnp.int32)


def permute(tree, perm):
    """Apply a lane permutation to every per-lane array of a pytree."""
    n = perm.shape[0]
    return jax.tree.map(
        lambda a: a[perm] if (hasattr(a, "shape") and a.ndim >= 1 and
                              a.shape[0] == n) else a, tree)


def unsort(values, orig_lane):
    """Scatter per-lane values (array or pytree, e.g. a planar Spec) back to
    their original lane order."""
    return jax.tree.map(
        lambda a: jnp.zeros_like(a).at[orig_lane].set(a), values)

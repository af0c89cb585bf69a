"""Film accumulation and development.

TPU-native rebuild of mitsuba2's Film/ImageBlock
(src/librender/{film,imageblock}.cpp, src/films/hdrfilm.cpp). The reference
splats each sample through a reconstruction filter with atomic scatter-adds;
here lanes are laid out (spp, H, W) so a box filter is a pure reshape+sum
(zero scatters — SURVEY.md §7.3 item 2's lane->pixel ownership), and wider
filters become a static K x K tap scatter-add. The accumulator carries a
weight channel like ImageBlock.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import math as m


def filter_eval(name: str, x):
    """Reconstruction filter kernels (src/rfilters/*.cpp), radius-normalized.

    x: distance from the sample in pixels. Each returns weight (0 outside)."""
    ax = jnp.abs(x)
    if name == "box":
        return jnp.where(ax <= 0.5, 1.0, 0.0)
    if name == "tent":
        return jnp.maximum(1.0 - ax, 0.0)
    if name == "gaussian":
        # sigma = 0.5, radius 2 (rfilters/gaussian.cpp: truncated gaussian)
        sigma = 0.5
        alpha = -1.0 / (2.0 * sigma * sigma)
        offset = jnp.exp(alpha * 4.0)  # value at r=2
        return jnp.maximum(jnp.exp(alpha * x * x) - offset, 0.0)
    if name in ("mitchell", "catmullrom"):
        if name == "mitchell":
            B = C = 1.0 / 3.0
        else:
            B, C = 0.0, 0.5
        x2, x3 = ax * ax, ax * ax * ax
        p1 = ((12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2 +
              (6 - 2 * B)) * (1 / 6)
        p2 = ((-B - 6 * C) * x3 + (6 * B + 30 * C) * x2 +
              (-12 * B - 48 * C) * ax + (8 * B + 24 * C)) * (1 / 6)
        return jnp.where(ax < 1.0, p1, jnp.where(ax < 2.0, p2, 0.0))
    if name == "lanczos":
        tau = 3.0
        return jnp.where(ax < tau, m.sinxx(jnp.pi * x) * m.sinxx(jnp.pi * x / tau), 0.0)
    raise ValueError(f"unknown rfilter {name!r}")


FILTER_RADIUS = {"box": 0, "tent": 1, "gaussian": 2, "mitchell": 2,
                 "catmullrom": 2, "lanczos": 3}


def accumulate_pass(image, wsum, values, jitter, config):
    """Add one pass of per-lane radiance into the (H, W, C) accumulator.

    values: planar Spec of (spp_pass * H * W,) channels laid out (spp, H, W);
    jitter: planar (jx, jy) tuple, subpixel positions in [0,1)^2 relative to
    the pixel corner. Returns (image, wsum). The (H, W, C) packing happens
    here, at the film boundary — everything upstream is channel-planar.
    """
    from ..core.spec import Spec
    H, W = config.height, config.width
    if not isinstance(values, Spec):
        values = Spec.from_array(values)
    N = values.shape[0]
    sppc = N // (H * W)
    name = config.rfilter
    if name == "box":
        img = jnp.stack([c.reshape(sppc, H, W).sum(0) for c in values.ch], -1)
        return image + img, wsum + sppc

    # General filter: splat to (2R+1)^2 neighbors with static offsets.
    R = FILTER_RADIUS[name]
    vals = [c.reshape(sppc, H, W) for c in values.ch]
    jx, jy = (jitter if isinstance(jitter, (tuple, list))
              else (jitter.x, jitter.y))
    # sample position relative to its own pixel center: jitter - 0.5
    rel_x = jx.reshape(sppc, H, W) - 0.5
    rel_y = jy.reshape(sppc, H, W) - 0.5
    out_img = image
    out_w = wsum
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            # weight of this sample at pixel (y+dy, x+dx):
            # distance = (pixel_center + d) - sample_pos = d - rel
            wgt = (filter_eval(name, dx - rel_x) *
                   filter_eval(name, dy - rel_y))  # (spp, H, W)
            contrib = jnp.stack([(c * wgt).sum(0) for c in vals], -1)
            wimg = wgt.sum(0)
            # shift: contribution lands at (y+dy, x+dx) -> roll and crop
            contrib = jnp.roll(contrib, (dy, dx), axis=(0, 1))
            wimg = jnp.roll(wimg, (dy, dx), axis=(0, 1))
            # zero wrapped borders
            ys = jnp.arange(H)
            xs = jnp.arange(W)
            ymask = (ys >= max(dy, 0)) & (ys < H + min(dy, 0))
            xmask = (xs >= max(dx, 0)) & (xs < W + min(dx, 0))
            mask = ymask[:, None] & xmask[None, :]
            out_img = out_img + jnp.where(mask[..., None], contrib, 0.0)
            out_w = out_w + jnp.where(mask, wimg, 0.0)
    return out_img, out_w


def develop(image, wsum):
    """Film::develop — normalize by accumulated filter weight."""
    w = jnp.maximum(wsum, 1e-8)
    if jnp.ndim(wsum) == 0:
        return image / w
    return image / w[..., None]

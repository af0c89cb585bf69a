"""Chi-square statistical test harness for sampling routines.

TPU-native rebuild of mitsuba2's `mitsuba.python.chi2`
(src/python/python/chi2.py): draw ~1e6 samples from a sampling routine,
histogram them over a discretized domain, integrate the claimed pdf over
each bin, and compare with Pearson's chi^2 test. Adapters wrap warps, BSDFs,
microfacet distributions, phase functions, and emitters.
"""
from __future__ import annotations

import math as pymath
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .core.math import rlgamma


class SphericalDomain:
    """Directions on S^2 parameterized by (phi, cos_theta) — equal-area bins."""

    def bounds(self):
        return np.array([[-np.pi, np.pi], [-1.0, 1.0]])

    def map_forward(self, d):
        """Direction (..., 3) -> (phi, cos_theta) (..., 2)."""
        d = np.asarray(d)
        return np.stack([np.arctan2(d[..., 1], d[..., 0]),
                         np.clip(d[..., 2], -1.0, 1.0)], axis=-1)

    def map_backward(self, p):
        phi, ct = p[..., 0], p[..., 1]
        st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
        return np.stack([st * np.cos(phi), st * np.sin(phi), ct], axis=-1)

    # Jacobian of solid-angle measure w.r.t. (phi, cos_theta) is 1.
    def measure_factor(self, p):
        return np.ones(p.shape[:-1])


class PlanarDomain:
    """A rectangle in R^2 (for disk/tent warps etc.)."""

    def __init__(self, bounds=None):
        self._bounds = np.array([[-1.0, 1.0], [-1.0, 1.0]]) if bounds is None \
            else np.asarray(bounds, np.float64)

    def bounds(self):
        return self._bounds

    def map_forward(self, p):
        return np.asarray(p)[..., :2]

    def map_backward(self, p):
        return p

    def measure_factor(self, p):
        return np.ones(p.shape[:-1])


class ChiSquareTest:
    """Pearson chi^2 goodness-of-fit between a sampler and its claimed pdf.

    Parameters mirror the reference harness: `sample_func(u2) -> points` (in
    target domain, (..., 3) for spherical), `pdf_func(points) -> density`
    w.r.t. the domain measure, `sample_count` draws, a `res` x `2*res` bin
    grid, and `ires`^2 midpoint quadrature per bin for the expected counts.
    """

    def __init__(self, domain, sample_func: Callable, pdf_func: Callable,
                 sample_count: int = 1_000_000, res: int = 33, ires: int = 8,
                 seed: int = 0, sample_dim: int = 2):
        self.domain = domain
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.sample_count = int(sample_count)
        self.res = (res, 2 * res)  # (cos_theta bins, phi bins)
        self.ires = ires
        self.seed = seed
        self.sample_dim = sample_dim
        self.messages = []
        self.histogram = None
        self.pdf = None
        self.p_value = None

    def tabulate_histogram(self):
        rng = np.random.default_rng(self.seed)
        u = rng.random((self.sample_count, self.sample_dim), dtype=np.float64).astype(np.float32)
        pts = self.sample_func(jnp.asarray(u))
        # planar-layout returns: Vec3 -> (N, 3); (x, y) tuple -> (N, 2)
        if hasattr(pts, "x"):
            pts = pts.to_array()
        elif isinstance(pts, (tuple, list)):
            pts = jnp.stack([jnp.asarray(c) for c in pts], axis=-1)
        pts = np.asarray(pts)
        p = self.domain.map_forward(pts)
        b = self.domain.bounds()
        # Drop invalid samples (zero-direction convention for rejected draws)
        valid = np.isfinite(p).all(axis=-1)
        if pts.shape[-1] == 3:
            valid &= (np.abs(np.linalg.norm(pts, axis=-1) - 1.0) < 1e-2)
        p = p[valid]
        self.valid_frac = valid.mean()
        h, _, _ = np.histogram2d(
            p[..., 1], p[..., 0], bins=self.res,
            range=[[b[1, 0], b[1, 1]], [b[0, 0], b[0, 1]]])
        self.histogram = h
        self.n_valid = p.shape[0]
        # Expected counts scale by the TOTAL number of draws: rejected draws
        # (zero/invalid outputs) are mass the pdf correctly integrates to < 1
        # (e.g. BSDF samples that land in the wrong hemisphere).
        self.n_total = self.sample_count

    def tabulate_pdf(self):
        b = self.domain.bounds()
        ny, nx = self.res
        ir = self.ires
        # Midpoint quadrature on an (ny*ir, nx*ir) refinement
        ys = np.linspace(b[1, 0], b[1, 1], ny * ir + 1)
        xs = np.linspace(b[0, 0], b[0, 1], nx * ir + 1)
        ym = 0.5 * (ys[1:] + ys[:-1])
        xm = 0.5 * (xs[1:] + xs[:-1])
        X, Y = np.meshgrid(xm, ym)
        P = np.stack([X, Y], axis=-1)
        pts = self.domain.map_backward(P)
        dens = np.asarray(self.pdf_func(jnp.asarray(pts, dtype=jnp.float32)))
        dens = dens * self.domain.measure_factor(P)
        cell_area = ((b[0, 1] - b[0, 0]) / (nx * ir)) * ((b[1, 1] - b[1, 0]) / (ny * ir))
        # Sum the refinement back into bins
        dens = dens.reshape(ny, ir, nx, ir).sum(axis=(1, 3)) * cell_area
        self.pdf = dens * self.n_total

    def run(self, significance_level: float = 0.01, test_count: int = 1) -> bool:
        if self.histogram is None:
            self.tabulate_histogram()
        if self.pdf is None:
            self.tabulate_pdf()
        obs = self.histogram.ravel()
        exp = self.pdf.ravel()

        total_exp = exp.sum()
        total_obs = obs.sum()
        if total_exp <= 0:
            self.messages.append("chi2: expected distribution integrates to zero")
            return False
        if abs(total_exp - total_obs) / max(total_obs, 1) > 0.02:
            self.messages.append(
                f"chi2: sample count mismatch: observed {total_obs}, expected "
                f"{total_exp:.1f} — pdf likely not normalized consistently")
            return False

        # Pool cells with low expected counts (mitsuba pools < 5)
        order = np.argsort(exp)
        exp_s, obs_s = exp[order], obs[order]
        csum = np.cumsum(exp_s)
        pool = csum < 5.0
        n_pooled = int(pool.sum())
        if n_pooled > 0:
            pooled_exp = exp_s[:n_pooled].sum()
            pooled_obs = obs_s[:n_pooled].sum()
            exp_s = np.concatenate([[pooled_exp], exp_s[n_pooled:]])
            obs_s = np.concatenate([[pooled_obs], obs_s[n_pooled:]])
        mask = exp_s > 0
        stat = float((((obs_s - exp_s) ** 2) / np.maximum(exp_s, 1e-9))[mask].sum())
        dof = int(mask.sum()) - 1
        if dof <= 0:
            self.messages.append("chi2: no degrees of freedom")
            return False
        # p = Q(dof/2, stat/2)
        p_value = 1.0 - rlgamma(dof / 2.0, stat / 2.0)
        self.p_value = p_value
        # Sidak correction for running `test_count` independent tests
        alpha = 1.0 - (1.0 - significance_level) ** (1.0 / test_count)
        ok = p_value >= alpha
        self.messages.append(
            f"chi2: stat={stat:.2f} dof={dof} p={p_value:.4g} alpha={alpha:.4g} "
            f"{'PASS' if ok else 'FAIL'}")
        return ok


# ---------------------------------------------------------------------------
# Adapters (mirroring chi2.py's BSDFAdapter / MicrofacetAdapter)
# ---------------------------------------------------------------------------

def warp_adapter(warp_fn, pdf_fn, **kw):
    """Adapter for plain warps: sample(u2)->target domain, pdf(points)."""
    return (lambda u: warp_fn(u, **kw) if kw else warp_fn(u),
            lambda p: pdf_fn(p, **kw) if kw else pdf_fn(p))

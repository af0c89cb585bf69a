"""1D/2D sampling distributions.

TPU-native rebuild of mitsuba2's distribution headers
(include/mitsuba/core/distr_1d.h, distr_2d.h). Distributions are frozen
pytrees built on host (numpy) and sampled on device via searchsorted-based
CDF inversion — gather-heavy but XLA-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from . import math as m


# ---------------------------------------------------------------------------
# DiscreteDistribution (distr_1d.h)
# ---------------------------------------------------------------------------

@struct.dataclass
class DiscreteDistribution:
    """Discrete distribution over n entries, sampled by CDF inversion."""
    pmf: jnp.ndarray        # (n,) un-normalized weights
    cdf: jnp.ndarray        # (n,) inclusive cumulative sum
    total: jnp.ndarray      # () sum of weights
    normalization: jnp.ndarray  # () 1 / total

    @staticmethod
    def build(weights) -> "DiscreteDistribution":
        w = np.asarray(weights, np.float64)
        cdf = np.cumsum(w)
        total = float(cdf[-1]) if w.size else 0.0
        return DiscreteDistribution(
            pmf=jnp.asarray(w, jnp.float32),
            cdf=jnp.asarray(cdf, jnp.float32),
            total=jnp.float32(total),
            normalization=jnp.float32(1.0 / total if total > 0 else 0.0))

    def eval_pmf_normalized(self, index):
        return jnp.take(self.pmf, index, axis=0) * self.normalization

    def sample(self, u):
        """u in [0,1) -> index."""
        x = u * self.total
        idx = jnp.searchsorted(self.cdf, x, side="right")
        return jnp.clip(idx, 0, self.pmf.shape[0] - 1)

    def sample_pmf(self, u):
        idx = self.sample(u)
        return idx, self.eval_pmf_normalized(idx)

    def sample_reuse(self, u):
        """Sample an index and re-scale u for reuse (sample_reuse in distr_1d.h)."""
        idx = self.sample(u)
        cdf_lo = jnp.where(idx > 0, jnp.take(self.cdf, jnp.maximum(idx - 1, 0), axis=0), 0.0)
        pmf = jnp.take(self.pmf, idx, axis=0)
        u_new = (u * self.total - cdf_lo) / jnp.maximum(pmf, 1e-20)
        return idx, jnp.clip(u_new, 0.0, m.ONE_MINUS_EPSILON)


# ---------------------------------------------------------------------------
# ContinuousDistribution — piecewise-linear density on a regular grid
# ---------------------------------------------------------------------------

@struct.dataclass
class ContinuousDistribution:
    """Piecewise-linear pdf over [range0, range1] defined by node values."""
    pdf: jnp.ndarray      # (n,) node values (un-normalized)
    cdf: jnp.ndarray      # (n-1,) integrated trapezoid areas, cumulative
    range_min: jnp.ndarray
    range_max: jnp.ndarray
    interval_size: jnp.ndarray
    total: jnp.ndarray
    normalization: jnp.ndarray

    @staticmethod
    def build(values, range_min: float, range_max: float) -> "ContinuousDistribution":
        v = np.asarray(values, np.float64)
        n = v.size
        dx = (range_max - range_min) / (n - 1)
        areas = 0.5 * (v[1:] + v[:-1]) * dx
        cdf = np.cumsum(areas)
        total = float(cdf[-1])
        return ContinuousDistribution(
            pdf=jnp.asarray(v, jnp.float32),
            cdf=jnp.asarray(cdf, jnp.float32),
            range_min=jnp.float32(range_min),
            range_max=jnp.float32(range_max),
            interval_size=jnp.float32(dx),
            total=jnp.float32(total),
            normalization=jnp.float32(1.0 / total if total > 0 else 0.0))

    def eval_pdf(self, x):
        t = (x - self.range_min) / self.interval_size
        idx = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, self.pdf.shape[0] - 2)
        frac = t - idx
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        inside = (x >= self.range_min) & (x <= self.range_max)
        return jnp.where(inside, v0 + (v1 - v0) * frac, 0.0)

    def eval_pdf_normalized(self, x):
        return self.eval_pdf(x) * self.normalization

    def sample(self, u):
        """Invert the piecewise-quadratic CDF. Returns x."""
        target = u * self.total
        idx = jnp.clip(jnp.searchsorted(self.cdf, target, side="right"),
                       0, self.cdf.shape[0] - 1)
        cdf_lo = jnp.where(idx > 0, jnp.take(self.cdf, jnp.maximum(idx - 1, 0), axis=0), 0.0)
        rem = target - cdf_lo  # area to cover inside interval idx
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        dx = self.interval_size
        # Solve 0.5*(v0 + v(t))*t*dx = rem with v(t) = v0 + (v1-v0)t, t in [0,1]
        a = 0.5 * (v1 - v0) * dx
        b = v0 * dx
        c = -rem
        valid, t0, t1 = m.solve_quadratic(a, b, c)
        t = jnp.where((t0 >= 0) & (t0 <= 1), t0, t1)
        t = jnp.where(valid, jnp.clip(t, 0.0, 1.0),
                      rem / jnp.maximum(b, 1e-20))
        return self.range_min + (idx + t) * dx


# ---------------------------------------------------------------------------
# IrregularContinuousDistribution — piecewise-linear pdf on irregular nodes
# ---------------------------------------------------------------------------

@struct.dataclass
class IrregularContinuousDistribution:
    nodes: jnp.ndarray    # (n,)
    pdf: jnp.ndarray      # (n,)
    cdf: jnp.ndarray      # (n-1,)
    total: jnp.ndarray
    normalization: jnp.ndarray

    @staticmethod
    def build(nodes, values) -> "IrregularContinuousDistribution":
        x = np.asarray(nodes, np.float64)
        v = np.asarray(values, np.float64)
        areas = 0.5 * (v[1:] + v[:-1]) * np.diff(x)
        cdf = np.cumsum(areas)
        total = float(cdf[-1])
        return IrregularContinuousDistribution(
            nodes=jnp.asarray(x, jnp.float32),
            pdf=jnp.asarray(v, jnp.float32),
            cdf=jnp.asarray(cdf, jnp.float32),
            total=jnp.float32(total),
            normalization=jnp.float32(1.0 / total if total > 0 else 0.0))

    def eval_pdf(self, x):
        idx = m.find_interval(self.nodes, x)
        x0 = jnp.take(self.nodes, idx, axis=0)
        x1 = jnp.take(self.nodes, idx + 1, axis=0)
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        t = (x - x0) / jnp.maximum(x1 - x0, 1e-20)
        inside = (x >= self.nodes[0]) & (x <= self.nodes[-1])
        return jnp.where(inside, v0 + (v1 - v0) * t, 0.0)

    def sample(self, u):
        target = u * self.total
        idx = jnp.clip(jnp.searchsorted(self.cdf, target, side="right"),
                       0, self.cdf.shape[0] - 1)
        cdf_lo = jnp.where(idx > 0, jnp.take(self.cdf, jnp.maximum(idx - 1, 0), axis=0), 0.0)
        rem = target - cdf_lo
        x0 = jnp.take(self.nodes, idx, axis=0)
        x1 = jnp.take(self.nodes, idx + 1, axis=0)
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        w = x1 - x0
        a = 0.5 * (v1 - v0) * w
        b = v0 * w
        valid, t0, t1 = m.solve_quadratic(a, b, -rem)
        t = jnp.where((t0 >= 0) & (t0 <= 1), t0, t1)
        t = jnp.where(valid, jnp.clip(t, 0.0, 1.0), rem / jnp.maximum(b, 1e-20))
        return x0 + t * w


# ---------------------------------------------------------------------------
# Marginal2DDiscrete — row-marginal + per-row conditional CDF inversion with
# bilinear reconstruction (distr_2d.h :: Marginal2D<0, Continuous=false>).
# Used by the envmap emitter. Sampling treats the grid as piecewise-bilinear.
# ---------------------------------------------------------------------------

def _vose_tables(weights: np.ndarray):
    """Walker/Vose alias tables for a discrete pmf (host, O(n)).

    Returns (prob (n,), alias (n,)): sample i0 ~ U{0..n-1}, accept i0 with
    probability prob[i0], else take alias[i0] — the classic O(1) discrete
    sampler. Small/large worklists as index arrays (python-loop-free
    except the pairing loop, which runs n iterations of O(1) numpy ops —
    ~0.2 s for a 512x256 envmap, scene-build-time only)."""
    w = np.asarray(weights, np.float64).ravel()
    n = w.size
    s = w.sum()
    assert n > 0 and s > 0, "alias table needs a non-empty positive pmf"
    scaled = w * (n / s)
    prob = np.ones(n)
    alias = np.arange(n, dtype=np.int64)
    small = list(np.nonzero(scaled < 1.0)[0])
    large = list(np.nonzero(scaled >= 1.0)[0])
    scaled = scaled.copy()
    while small and large:
        s_i = small.pop()
        l_i = large.pop()
        prob[s_i] = scaled[s_i]
        alias[s_i] = l_i
        scaled[l_i] = (scaled[l_i] + scaled[s_i]) - 1.0
        (small if scaled[l_i] < 1.0 else large).append(l_i)
    # float residue: leftovers are ~1 -> accept always
    for i in small + large:
        prob[i] = 1.0
    return prob, alias


@struct.dataclass
class Marginal2D:
    """Sample a 2D density given on an (h, w) grid over [0,1]^2.

    Simplified discrete variant: cell-piecewise-constant density (mitsuba's
    Marginal2DDiscrete interpolates bilinearly; piecewise-constant keeps the
    pdf/sample pair exactly consistent, which is what MIS correctness needs —
    the envmap plugin compensates at eval time by looking up the same table).
    """
    data: jnp.ndarray       # (h, w) cell densities (un-normalized)
    marg_cdf: jnp.ndarray   # (h,) cumulative row sums
    cond_cdf: jnp.ndarray   # (h, w) cumulative within-row sums
    total: jnp.ndarray      # ()
    # Optional alias tables (Vose/Walker) over the flattened cells: the
    # TPU fast path. CDF inversion costs ~22 gathered elements per lane
    # (row searchsorted + log2(w)-step column bisection) and per-lane
    # gathers run at ~0.15 G elem/s on this runtime (docs/TPU_TRAVERSAL.md
    # primitive table) — ~38 ms per 262k-lane NEE wavefront on a 256x512
    # envmap, dominating the render. The alias path samples the SAME
    # piecewise-constant cell distribution with 3 gathers (prob, alias,
    # pdf). Trade-off: the (u -> position) map is discontinuous, so
    # low-discrepancy stratification over the envmap is lost — keep CDF
    # inversion for QMC-sensitive uses by building with alias=False.
    alias_p: jnp.ndarray = None   # (h*w,) acceptance probabilities
    alias_i: jnp.ndarray = None   # (h*w,) alias targets (int32)

    @staticmethod
    def build(data, alias: bool = False) -> "Marginal2D":
        d = np.asarray(data, np.float64)
        assert d.ndim == 2
        cond = np.cumsum(d, axis=1)
        row_sums = cond[:, -1]
        marg = np.cumsum(row_sums)
        total = float(marg[-1])
        alias_p = alias_i = None
        if alias:
            alias_p, alias_i = _vose_tables(d.ravel())
        return Marginal2D(
            data=jnp.asarray(d, jnp.float32),
            marg_cdf=jnp.asarray(marg, jnp.float32),
            cond_cdf=jnp.asarray(cond, jnp.float32),
            total=jnp.float32(total),
            alias_p=None if alias_p is None else
            jnp.asarray(alias_p, jnp.float32),
            alias_i=None if alias_i is None else
            jnp.asarray(alias_i, jnp.int32))

    @property
    def shape(self):
        return self.data.shape

    def sample(self, u):
        """u: planar Vec2 / (u, v) tuple / (..., 2) array ->
        (Vec2 position in [0,1]^2, (...,) pdf).

        The pdf is w.r.t. the unit square (multiply by h*w/total ... already
        normalized here). The conditional-row search is a per-lane bisection
        over the flattened CDF table ((N,) gathers — no (N, w) row
        materialization, no lane padding). With alias tables (build
        alias=True), 3 gathers replace the whole search — same cell
        distribution, same pdf."""
        from .vec import Vec2, as_vec2
        u = as_vec2(u)
        h, w = self.data.shape
        if self.alias_p is not None:
            N = h * w
            z = jnp.minimum(u.x, m.ONE_MINUS_EPSILON) * N
            i0 = z.astype(jnp.int32)
            frac = z - i0
            p = jnp.take(self.alias_p, i0)
            take = frac < p
            idx = jnp.where(take, i0, jnp.take(self.alias_i, i0))
            # residual reuse: frac is uniform in [0, 1); conditioned on
            # the branch it is uniform in [0, p) / [p, 1) — rescale into
            # the in-cell x coordinate (Vose's standard entropy reuse)
            uc = jnp.where(take, frac / jnp.maximum(p, 1e-20),
                           (frac - p) / jnp.maximum(1.0 - p, 1e-20))
            uc = jnp.clip(uc, 0.0, m.ONE_MINUS_EPSILON)
            row = idx // w
            col = idx - row * w
            ur = jnp.clip(u.y, 0.0, m.ONE_MINUS_EPSILON)
            pos = Vec2((col + uc) / w, (row + ur) / h)
            pdf = (jnp.take(self.data.reshape(-1), idx) * (h * w) /
                   jnp.maximum(self.total, 1e-20))
            return pos, pdf
        flat_cond = self.cond_cdf.reshape(-1)
        # Row from marginal
        target_r = u.y * self.total
        row = jnp.clip(jnp.searchsorted(self.marg_cdf, target_r, side="right"), 0, h - 1)
        marg_lo = jnp.where(row > 0, jnp.take(self.marg_cdf, jnp.maximum(row - 1, 0)), 0.0)
        row_sum = jnp.take(self.marg_cdf, row) - marg_lo
        # Re-scaled residual inside the row
        ur = jnp.clip((target_r - marg_lo) / jnp.maximum(row_sum, 1e-20), 0.0, m.ONE_MINUS_EPSILON)
        # Column from conditional: lower-bound bisection in cond_cdf[row, :]
        target_c = u.x * row_sum
        base = row * w
        lo = jnp.zeros_like(row)
        hi = jnp.full_like(row, w)
        steps = int(np.ceil(np.log2(max(w, 2)))) + 1
        for _ in range(steps):
            mid = (lo + hi) // 2
            go_right = flat_cond[base + mid] < target_c
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        col = jnp.clip(lo, 0, w - 1)
        cond_lo = jnp.where(col > 0, flat_cond[base + jnp.maximum(col - 1, 0)], 0.0)
        cell = flat_cond[base + col] - cond_lo
        uc = jnp.clip((target_c - cond_lo) / jnp.maximum(cell, 1e-20), 0.0, m.ONE_MINUS_EPSILON)
        pos = Vec2((col + uc) / w, (row + ur) / h)
        pdf = cell * (h * w) / jnp.maximum(self.total, 1e-20)
        return pos, pdf

    def eval_pdf(self, pos):
        """pdf at pos (Vec2 / tuple / (..., 2)) in [0,1]^2, w.r.t. the unit
        square."""
        from .vec import as_vec2
        pos = as_vec2(pos)
        h, w = self.data.shape
        col = jnp.clip((pos.x * w).astype(jnp.int32), 0, w - 1)
        row = jnp.clip((pos.y * h).astype(jnp.int32), 0, h - 1)
        val = self.data.reshape(-1)[row * w + col]
        return val * (h * w) / jnp.maximum(self.total, 1e-20)


def _searchsorted_rows(cdf_rows, targets):
    """searchsorted along the last axis for batched rows.

    cdf_rows: (..., w) ascending; targets: (...,). Returns int32 (...,)."""
    return jnp.sum((cdf_rows < targets[..., None]).astype(jnp.int32), axis=-1)


@struct.dataclass
class Hierarchical2D:
    """Hierarchical sample warping over a 2D density
    (include/mitsuba/core/distr_2d.h :: Hierarchical2D0).

    A mip pyramid of the density is descended one level per step: at each
    level the sample picks one of the four children of the current texel
    proportionally to their integrals (sample reuse keeps the warp
    continuous), ending with a uniform jitter inside the chosen finest
    texel. Equivalent in distribution to Marginal2D but with a smoother,
    locality-preserving u -> position mapping — the property the reference
    exploits for measured-BRDF warps. All device work is (N,) flat gathers
    (kernels/gather.py layout rules)."""
    levels: tuple          # tuple of flattened (2^k * 2^k,) density sums,
    #                        coarse [1x1] ... fine [RxR]
    data: jnp.ndarray      # (h, w) original density (pdf eval)
    total: jnp.ndarray     # () sum of data
    res: int = struct.field(pytree_node=False, default=1)   # padded pow2
    h: int = struct.field(pytree_node=False, default=1)
    w: int = struct.field(pytree_node=False, default=1)

    @staticmethod
    def build(data) -> "Hierarchical2D":
        d = np.asarray(data, np.float64)
        assert d.ndim == 2
        h, w = d.shape
        res = 1
        while res < max(h, w):
            res *= 2
        padded = np.zeros((res, res), np.float64)
        padded[:h, :w] = d
        levels = [padded]
        while levels[-1].shape[0] > 1:
            p = levels[-1]
            levels.append(p[0::2, 0::2] + p[0::2, 1::2] +
                          p[1::2, 0::2] + p[1::2, 1::2])
        levels = tuple(jnp.asarray(l.reshape(-1), jnp.float32)
                       for l in reversed(levels))  # coarse -> fine
        return Hierarchical2D(levels=levels,
                              data=jnp.asarray(d, jnp.float32),
                              total=jnp.float32(d.sum()),
                              res=res, h=h, w=w)

    def sample(self, u):
        """u (planar Vec2 / tuple / (..., 2)) -> (Vec2 in [0,1]^2, pdf
        w.r.t. the unit square over the ORIGINAL (h, w) domain)."""
        from .vec import Vec2, as_vec2
        u = as_vec2(u)
        ux, uy = u.x, u.y
        row = jnp.zeros(jnp.shape(ux), jnp.int32)
        col = jnp.zeros(jnp.shape(ux), jnp.int32)
        # descend: levels[k] has size 2^k; children of (row, col) live in
        # levels[k+1] at (2row + dy, 2col + dx)
        for k in range(len(self.levels) - 1):
            child = self.levels[k + 1]
            size = 1 << (k + 1)
            base_r, base_c = row * 2, col * 2
            v00 = child[base_r * size + base_c]
            v01 = child[base_r * size + base_c + 1]
            v10 = child[(base_r + 1) * size + base_c]
            v11 = child[(base_r + 1) * size + base_c + 1]
            top = v00 + v01
            bottom = v10 + v11
            tot = jnp.maximum(top + bottom, 1e-30)
            # split vertically, reuse the sample (distr_2d.h discipline)
            p_top = top / tot
            go_bottom = uy >= p_top
            uy = jnp.where(go_bottom,
                           (uy - p_top) / jnp.maximum(1.0 - p_top, 1e-20),
                           uy / jnp.maximum(p_top, 1e-20))
            left = jnp.where(go_bottom, v10, v00)
            lr_tot = jnp.maximum(jnp.where(go_bottom, bottom, top), 1e-30)
            p_left = left / lr_tot
            go_right = ux >= p_left
            ux = jnp.where(go_right,
                           (ux - p_left) / jnp.maximum(1.0 - p_left, 1e-20),
                           ux / jnp.maximum(p_left, 1e-20))
            row = base_r + go_bottom.astype(jnp.int32)
            col = base_c + go_right.astype(jnp.int32)
        ux = jnp.clip(ux, 0.0, m.ONE_MINUS_EPSILON)
        uy = jnp.clip(uy, 0.0, m.ONE_MINUS_EPSILON)
        # positions mapped over the PADDED res, rescaled to the (h, w) box
        x = (col + ux) * (self.res / self.w) / self.res
        y = (row + uy) * (self.res / self.h) / self.res
        pos = Vec2(x, y)
        return pos, self.eval_pdf(pos)

    def eval_pdf(self, pos):
        from .vec import as_vec2
        pos = as_vec2(pos)
        col = jnp.clip((pos.x * self.w).astype(jnp.int32), 0, self.w - 1)
        row = jnp.clip((pos.y * self.h).astype(jnp.int32), 0, self.h - 1)
        val = self.data.reshape(-1)[row * self.w + col]
        return val * (self.h * self.w) / jnp.maximum(self.total, 1e-20)

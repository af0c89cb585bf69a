"""Distribution tests (mirrors src/libcore/tests/test_distr.py)."""
import jax.numpy as jnp
import numpy as np

from mitsuba2_tpu.core import distr


def test_discrete_sample_matches_pmf():
    w = np.array([1.0, 3.0, 0.0, 2.0, 4.0])
    d = distr.DiscreteDistribution.build(w)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(200_000, dtype=np.float64).astype(np.float32))
    idx = np.asarray(d.sample(u))
    counts = np.bincount(idx, minlength=5) / idx.size
    np.testing.assert_allclose(counts, w / w.sum(), atol=5e-3)
    assert counts[2] == 0.0


def test_discrete_sample_reuse_uniform():
    d = distr.DiscreteDistribution.build([1.0, 2.0, 5.0])
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random(100_000, dtype=np.float64).astype(np.float32))
    idx, u2 = d.sample_reuse(u)
    u2 = np.asarray(u2)
    assert (u2 >= 0).all() and (u2 < 1.0).all()
    # reused sample should remain ~uniform
    h, _ = np.histogram(u2, bins=10, range=(0, 1))
    assert h.std() / h.mean() < 0.05


def test_continuous_linear_ramp():
    # pdf(x) ~ x on [0, 1]: CDF = x^2, sample = sqrt(u)
    d = distr.ContinuousDistribution.build(np.linspace(0, 1, 11), 0.0, 1.0)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random(200_000, dtype=np.float64).astype(np.float32))
    x = np.asarray(d.sample(u))
    np.testing.assert_allclose(np.mean(x), 2.0 / 3.0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.eval_pdf_normalized(jnp.asarray([0.5]))),
                               [1.0], atol=1e-5)


def test_irregular_matches_regular():
    nodes = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    vals = np.array([1.0, 2.0, 3.0, 2.0, 1.0])
    d = distr.IrregularContinuousDistribution.build(nodes, vals)
    r = distr.ContinuousDistribution.build(vals, 0.0, 1.0)
    u = jnp.linspace(0.01, 0.99, 101)
    np.testing.assert_allclose(np.asarray(d.sample(u)), np.asarray(r.sample(u)), atol=1e-5)
    x = jnp.linspace(0.0, 1.0, 101)
    np.testing.assert_allclose(np.asarray(d.eval_pdf(x)), np.asarray(r.eval_pdf(x)), atol=1e-5)


def test_marginal2d_sample_pdf_consistent():
    rng = np.random.default_rng(3)
    data = rng.random((16, 32)) + 0.1
    M = distr.Marginal2D.build(data)
    u = jnp.asarray(rng.random((100_000, 2), dtype=np.float64).astype(np.float32))
    pos, pdf = M.sample(u)
    pdf2 = M.eval_pdf(pos)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=2e-3)
    # Histogram should match the density
    pos = np.asarray(pos.to_array())
    h, _, _ = np.histogram2d(pos[:, 1], pos[:, 0], bins=(16, 32),
                             range=[[0, 1], [0, 1]])
    h = h / h.sum()
    expected = data / data.sum()
    assert np.abs(h - expected).max() < 5e-3


def test_hierarchical2d_matches_density():
    """Hierarchical2D: sample histogram ∝ density; returned pdf == eval_pdf."""
    rng = np.random.default_rng(9)
    data = rng.random((12, 20)) + 0.05
    H2 = distr.Hierarchical2D.build(data)
    u = jnp.asarray(rng.random((200_000, 2), dtype=np.float64).astype(np.float32))
    pos, pdf = H2.sample(u)
    pdf2 = H2.eval_pdf(pos)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
    p = np.asarray(pos.to_array())
    assert (p >= 0).all() and (p < 1).all()
    h, _, _ = np.histogram2d(p[:, 1], p[:, 0], bins=(12, 20),
                             range=[[0, 1], [0, 1]])
    h = h / h.sum()
    expected = data / data.sum()
    assert np.abs(h - expected).max() < 5e-3


def test_hierarchical2d_agrees_with_marginal2d():
    """Both warps target the same density -> same pdf everywhere."""
    rng = np.random.default_rng(10)
    data = rng.random((8, 8)) + 0.1
    H2 = distr.Hierarchical2D.build(data)
    M2 = distr.Marginal2D.build(data)
    u = jnp.asarray(rng.random((10_000, 2)).astype(np.float32))
    pos_h, pdf_h = H2.sample(u)
    pdf_m_at_h = M2.eval_pdf(pos_h)
    np.testing.assert_allclose(np.asarray(pdf_h), np.asarray(pdf_m_at_h),
                               rtol=1e-4)


def test_marginal2d_alias_matches_cdf_inversion():
    """The alias fast path (build alias=True — the TPU envmap default)
    must sample the SAME piecewise-constant cell distribution as CDF
    inversion, with an identical pdf, and its in-cell reuse coordinate
    must stay uniform (no entropy-starving artifacts)."""
    rng = np.random.default_rng(7)
    data = rng.random((16, 32)) ** 3 + 1e-3     # spiky, like an envmap sun
    M_cdf = distr.Marginal2D.build(data)
    M_al = distr.Marginal2D.build(data, alias=True)
    u = jnp.asarray(rng.random((200_000, 2)).astype(np.float32))
    pos_a, pdf_a = M_al.sample(u)
    # pdf must be self-consistent with eval_pdf (the MIS contract)
    np.testing.assert_allclose(np.asarray(pdf_a),
                               np.asarray(M_al.eval_pdf(pos_a)), rtol=2e-3)
    # cell histogram matches the density (same contract the CDF test uses)
    pa = np.asarray(pos_a.to_array())
    h_a, _, _ = np.histogram2d(pa[:, 1], pa[:, 0], bins=(16, 32),
                               range=[[0, 1], [0, 1]])
    expected = data / data.sum()
    assert np.abs(h_a / h_a.sum() - expected).max() < 5e-3
    # in-cell coordinates uniform: first moment of the fractional parts
    fx = pa[:, 0] * 32 - np.floor(pa[:, 0] * 32)
    fy = pa[:, 1] * 16 - np.floor(pa[:, 1] * 16)
    assert abs(fx.mean() - 0.5) < 5e-3 and abs(fy.mean() - 0.5) < 5e-3
    # pdf formula identical to the CDF build's
    pos_c, pdf_c = M_cdf.sample(u)
    np.testing.assert_allclose(np.asarray(M_al.eval_pdf(pos_c)),
                               np.asarray(pdf_c), rtol=2e-3)

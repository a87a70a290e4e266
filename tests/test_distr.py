"""Tests for tabulated distributions (distr_1d/distr_2d analogues) —
pattern of mitsuba3 src/core/tests (SURVEY.md §4.1 'Marginal2D inversion')."""

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_customization_tpu.core.distr import (
    ContinuousDistribution,
    DiscreteDistribution,
    Marginal2D,
)
from mitsuba_customization_tpu.utils.chi2 import ChiSquareTest, PlanarDomain


def test_discrete_matches_pmf(rng):
    w = jnp.asarray([1.0, 0.0, 3.0, 2.0, 0.5])
    d = DiscreteDistribution.build(w)
    u = jax.random.uniform(jax.random.key(0), (200_000,))
    idx = np.asarray(d.sample(u))
    freq = np.bincount(idx, minlength=5) / len(idx)
    pmf = np.asarray(d.pmf)
    assert np.allclose(freq, pmf, atol=5e-3)


def test_discrete_sample_reuse_uniform():
    w = jnp.asarray([1.0, 4.0, 2.0])
    d = DiscreteDistribution.build(w)
    u = jax.random.uniform(jax.random.key(1), (100_000,))
    idx, u2 = d.sample_reuse(u)
    u2 = np.asarray(u2)
    # Re-uniformized samples must be U[0,1) regardless of branch.
    hist, _ = np.histogram(u2, bins=20, range=(0, 1))
    assert hist.std() / hist.mean() < 0.05


def test_continuous_sample_pdf_consistent():
    w = jnp.asarray([0.1, 2.0, 0.5, 1.0, 3.0, 0.2, 1.5, 0.8])
    d = ContinuousDistribution.build(w)
    u = jax.random.uniform(jax.random.key(2), (300_000,))
    x = np.asarray(d.sample(u))
    hist, edges = np.histogram(x, bins=8, range=(0, 1), density=True)
    pdf = np.asarray(d.pdf)
    assert np.allclose(hist, pdf, rtol=0.05)


def test_marginal2d_chi2():
    h, w = 16, 24
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    weights = (np.sin(xx / w * np.pi) + 0.1) * (yy / h + 0.2) ** 2
    dist = Marginal2D.build(jnp.asarray(weights, dtype=jnp.float32))

    def sample_fn(u):
        pos, _ = dist.sample(jnp.asarray(u))
        # chi2 domain is (x, y); Marginal2D returns (y, x)
        return np.asarray(pos)[..., ::-1]

    def pdf_fn(p):
        pos = jnp.asarray(np.ascontiguousarray(p[..., ::-1]))
        return np.asarray(dist.eval_pdf(pos))

    test = ChiSquareTest(
        PlanarDomain(np.array([[0, 1], [0, 1]])),
        sample_fn,
        pdf_fn,
        sample_count=300_000,
        res=16,
    )
    assert test.run(), test.messages


def test_marginal2d_slice_gather():
    tables = jnp.asarray(
        np.random.default_rng(3).random((4, 8, 8)), dtype=jnp.float32
    )
    dist = Marginal2D.build(tables)
    idx = jnp.asarray([2, 0, 3])
    sliced = dist.gather_slice(idx)
    assert sliced.pdf.shape == (3, 8, 8)
    u = jnp.asarray([[0.3, 0.7], [0.5, 0.5], [0.9, 0.1]], dtype=jnp.float32)
    pos, pdf = sliced.sample(u)
    pdf2 = sliced.eval_pdf(pos)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-5)


def test_build_is_jittable():
    """CDF construction must live inside jit (rebuilt per optimization step
    — SURVEY.md §7.3 item 6)."""

    @jax.jit
    def f(w):
        d = Marginal2D.build(w)
        pos, pdf = d.sample(jnp.asarray([[0.5, 0.5]]))
        return pos, pdf

    pos, pdf = f(jnp.ones((4, 4)))
    assert np.isfinite(np.asarray(pos)).all()
    assert np.allclose(np.asarray(pdf), 1.0, rtol=1e-4)

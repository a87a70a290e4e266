"""Tests for the stateless samplers (independent / stratified / sobol)."""

import jax.numpy as jnp
import numpy as np

from mitsuba_customization_tpu.core.qmc import sobol_owen_2d
from mitsuba_customization_tpu.core.sampler import (
    IndependentSampler,
    SobolSampler,
    StratifiedSampler,
    make_sampler,
)


def test_independent_uniform_and_replayable():
    lane = jnp.arange(100_000, dtype=jnp.uint32)
    s1 = IndependentSampler(7, lane)
    u = np.asarray(s1.next_1d())
    v = np.asarray(s1.next_2d())
    assert 0.49 < u.mean() < 0.51
    assert abs(np.corrcoef(u, v[:, 0])[0, 1]) < 0.01
    # replay: same seed/lane/dim gives identical draws (path-replay contract)
    s2 = IndependentSampler(7, lane)
    assert np.array_equal(np.asarray(s2.next_1d()), u)


def test_sobol_stratification_beats_independent():
    """Owen-Sobol pixel-mean variance must beat independent sampling on a
    smooth integrand (the point of the ldsampler replacement)."""
    n_pix, spp = 256, 64
    pixel = jnp.repeat(jnp.arange(n_pix, dtype=jnp.uint32), spp)
    sidx = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), n_pix)
    sob = SobolSampler.from_pixel(1, pixel, sidx, spp)
    ind = make_sampler("independent", 1, pixel, sidx, spp)

    def integrand(u):  # smooth 2-D integrand, true mean known
        return np.sin(np.pi * u[..., 0]) * u[..., 1]

    f_s = integrand(np.asarray(sob.next_2d())).reshape(n_pix, spp).mean(1)
    f_i = integrand(np.asarray(ind.next_2d())).reshape(n_pix, spp).mean(1)
    true = (2 / np.pi) * 0.5
    err_s = np.mean((f_s - true) ** 2)
    err_i = np.mean((f_i - true) ** 2)
    assert err_s < err_i / 4, (err_s, err_i)


def test_sobol_unit_square_uniform():
    idx = jnp.arange(4096, dtype=jnp.uint32)
    pts = np.asarray(sobol_owen_2d(idx, jnp.uint32(9)))
    assert pts.min() >= 0 and pts.max() < 1
    hist, *_ = np.histogram2d(pts[:, 0], pts[:, 1], bins=8, range=[[0, 1], [0, 1]])
    # 0,2-sequence: exactly 64 points per 1/8 x 1/8 cell
    assert np.all(hist == 64)


def test_stratified_covers_strata():
    n_pix, spp = 16, 8
    pixel = jnp.repeat(jnp.arange(n_pix, dtype=jnp.uint32), spp)
    sidx = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), n_pix)
    s = StratifiedSampler.from_pixel(3, pixel, sidx, spp)
    u = np.asarray(s.next_1d()).reshape(n_pix, spp)
    strata = np.sort((u * spp).astype(int), axis=1)
    assert np.all(strata == np.arange(spp)[None, :])


def test_multijitter_projections_stratified():
    """CMJ (multijitter): all spp samples of one pixel are stratified in
    the m x n 2-D grid AND in both 1-D spp-stratum projections."""
    from mitsuba_customization_tpu.core.sampler import make_sampler

    spp = 16  # m = n = 4
    pixel = jnp.zeros(spp, jnp.uint32)
    sidx = jnp.arange(spp, dtype=jnp.uint32)
    smp = make_sampler("multijitter", jnp.uint32(7), pixel, sidx, spp)
    uv = np.asarray(smp.next_2d())
    assert uv.shape == (spp, 2) and (uv >= 0).all() and (uv < 1).all()
    # 4x4 grid: exactly one sample per cell
    cx = np.floor(uv[:, 0] * 4).astype(int)
    cy = np.floor(uv[:, 1] * 4).astype(int)
    assert sorted(cx * 4 + cy) == list(range(16))
    # 1-D projections: one sample per 1/16 stratum
    assert sorted(np.floor(uv[:, 0] * 16).astype(int)) == list(range(16))
    assert sorted(np.floor(uv[:, 1] * 16).astype(int)) == list(range(16))


def test_orthogonal_pairwise_stratified():
    """OA strength 2 (orthogonal, spp = 5^2): every PAIR of dimensions is
    balanced on the 5x5 grid — one sample per cell."""
    from mitsuba_customization_tpu.core.sampler import make_sampler

    spp, p = 25, 5
    pixel = jnp.zeros(spp, jnp.uint32)
    sidx = jnp.arange(spp, dtype=jnp.uint32)
    smp = make_sampler("orthogonal", jnp.uint32(3), pixel, sidx, spp)
    dims = [np.asarray(smp.next_1d()) for _ in range(4)]
    for d in dims:
        # each dimension alone: one sample per 1/25 stratum
        assert sorted(np.floor(d * 25).astype(int)) == list(range(25))
    for i in range(4):
        for j in range(i + 1, 4):
            ci = np.floor(dims[i] * p).astype(int)
            cj = np.floor(dims[j] * p).astype(int)
            assert sorted(ci * p + cj) == list(range(25)), (i, j)

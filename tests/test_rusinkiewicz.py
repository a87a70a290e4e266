"""Round-trip tests for the Rusinkiewicz half/diff transform
(SURVEY.md §7.2 layer 1: 'half/diff round-trip')."""

import jax.numpy as jnp
import numpy as np

from mitsuba_customization_tpu.core.rusinkiewicz import (
    dirs_to_half_diff,
    half_diff_to_dirs,
)


def _upper_hemi_dirs(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v[:, 2] = np.abs(v[:, 2]) + 0.05
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_half_diff_roundtrip(rng):
    wi = jnp.asarray(_upper_hemi_dirs(rng, 2000))
    wo = jnp.asarray(_upper_hemi_dirs(rng, 2000))
    th, ph, td, pd = dirs_to_half_diff(wi, wo)
    wi2, wo2 = half_diff_to_dirs(th, ph, td, pd)
    assert np.allclose(np.asarray(wi2), np.asarray(wi), atol=2e-4)
    assert np.allclose(np.asarray(wo2), np.asarray(wo), atol=2e-4)


def test_half_diff_reciprocity(rng):
    """Swapping wi/wo keeps theta_h and theta_d (phi_d shifts by pi)."""
    wi = jnp.asarray(_upper_hemi_dirs(rng, 500))
    wo = jnp.asarray(_upper_hemi_dirs(rng, 500))
    th1, _, td1, _ = dirs_to_half_diff(wi, wo)
    th2, _, td2, _ = dirs_to_half_diff(wo, wi)
    assert np.allclose(np.asarray(th1), np.asarray(th2), atol=1e-5)
    assert np.allclose(np.asarray(td1), np.asarray(td2), atol=1e-5)


def test_normal_incidence():
    """wi == wo == h: theta_h = theta of wi, theta_d = 0."""
    wi = jnp.asarray([[0.0, 0.0, 1.0]])
    th, _, td, _ = dirs_to_half_diff(wi, wi)
    assert abs(float(th[0])) < 1e-6
    assert abs(float(td[0])) < 1e-6


def test_mirror_reflection_has_zero_theta_h():
    """wo = mirror(wi) about z: half vector = z, theta_h = 0, theta_d = theta_i."""
    theta_i = 0.7
    wi = jnp.asarray([[np.sin(theta_i), 0.0, np.cos(theta_i)]], dtype=jnp.float32)
    wo = jnp.asarray([[-np.sin(theta_i), 0.0, np.cos(theta_i)]], dtype=jnp.float32)
    th, _, td, _ = dirs_to_half_diff(wi, wo)
    assert abs(float(th[0])) < 1e-5
    assert abs(float(td[0]) - theta_i) < 1e-5

"""Unit tests for core math: frames, vector ops, spherical coordinates.

Pattern follows mitsuba3 src/core/tests/ (SURVEY.md §4.1).
"""

import jax.numpy as jnp
import numpy as np

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.core.frame import Frame


def _random_dirs(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_normalize_zero_safe():
    v = jnp.zeros((4, 3))
    out = m.normalize(v)
    assert np.all(np.isfinite(np.asarray(out)))


def test_coordinate_system_orthonormal(rng):
    n = _random_dirs(rng, 1000)
    s, t = m.coordinate_system(jnp.asarray(n))
    s, t = np.asarray(s), np.asarray(t)
    assert np.allclose(np.sum(s * t, -1), 0, atol=1e-5)
    assert np.allclose(np.sum(s * n, -1), 0, atol=1e-5)
    assert np.allclose(np.sum(t * n, -1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(s, axis=-1), 1, atol=1e-5)
    # right-handed: s x t = n
    assert np.allclose(np.cross(s, t), n, atol=1e-5)


def test_frame_roundtrip(rng):
    n = _random_dirs(rng, 500)
    v = _random_dirs(rng, 500)
    f = Frame.from_normal(jnp.asarray(n))
    local = f.to_local(jnp.asarray(v))
    back = f.to_world(local)
    assert np.allclose(np.asarray(back), v, atol=1e-5)
    # cos(theta) in local frame equals dot(v, n)
    assert np.allclose(np.asarray(local)[..., 2], np.sum(v * n, -1), atol=1e-5)


def test_sph_roundtrip(rng):
    d = _random_dirs(rng, 500)
    theta, phi = m.dir_to_sph(jnp.asarray(d))
    back = m.sph_to_dir(theta, phi)
    assert np.allclose(np.asarray(back), d, atol=1e-5)


def test_reflect_local():
    w = jnp.asarray([[0.3, -0.4, np.sqrt(1 - 0.25)]], dtype=jnp.float32)
    r = m.reflect(w)
    assert np.allclose(np.asarray(r), [[-0.3, 0.4, np.sqrt(1 - 0.25)]], atol=1e-6)


def test_reflect_about_normal(rng):
    d = _random_dirs(rng, 100)
    n = _random_dirs(rng, 100)
    r = np.asarray(m.reflect(jnp.asarray(d), jnp.asarray(n)))
    # angle preserved
    assert np.allclose(
        np.sum(r * n, -1), np.sum(d * n, -1), atol=1e-5
    )
    assert np.allclose(np.linalg.norm(r, axis=-1), 1, atol=1e-5)


def test_safe_div():
    out = np.asarray(m.safe_div(jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 4.0])))
    assert out[0] == 0.0 and abs(out[1] - 0.5) < 1e-7

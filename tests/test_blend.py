"""blendbsdf / mask / passthrough tests (mitsuba3 src/bsdfs/{blendbsdf,
mask}.cpp parity — SURVEY.md §2.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.models import bsdf as bsdf_mod


def _table_for(bd):
    scene = mct.load_dict(
        {
            "type": "scene",
            "sensor": {
                "type": "perspective",
                "film": {"width": 4, "height": 4},
                "sampler": {"type": "independent", "sample_count": 1},
            },
            "light": {"type": "constant", "radiance": [1, 1, 1]},
            "s": {"type": "sphere", "bsdf": bd},
        }
    )
    return scene


WI = jnp.asarray([0.3, 0.1, 0.949])
WI = WI / jnp.linalg.norm(WI)


def test_blend_eval_is_mixture():
    scene = _table_for(
        {
            "type": "blendbsdf",
            "weight": 0.3,
            "a": {"type": "diffuse", "reflectance": [0.8, 0.0, 0.0]},
            "b": {"type": "diffuse", "reflectance": [0.0, 0.8, 0.0]},
        }
    )
    t = scene.bsdfs
    n = 16
    mat = jnp.zeros(n, jnp.int32) + (t.mat_type.shape[0] - 1)
    # the shape's material is the blend (registered last)
    mat = jnp.full(n, int(np.argmax(np.asarray(t.mat_type) == bsdf_mod.BLEND)), jnp.int32)
    wi = jnp.broadcast_to(WI, (n, 3))
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    f = np.asarray(bsdf_mod.eval(t, mat, wi, wo))
    inv_pi = 1.0 / np.pi
    np.testing.assert_allclose(f[0, 0], 0.7 * 0.8 * inv_pi, rtol=1e-5)
    np.testing.assert_allclose(f[0, 1], 0.3 * 0.8 * inv_pi, rtol=1e-5)
    # pdf is the cosine mixture of two cosine lobes = cosine pdf
    p = np.asarray(bsdf_mod.pdf(t, mat, wi, wo))
    np.testing.assert_allclose(p[0], inv_pi, rtol=1e-5)


def test_blend_sample_unbiased():
    """One-sample-mixture estimator integrates to the mixture albedo."""
    scene = _table_for(
        {
            "type": "blendbsdf",
            "weight": 0.25,
            "a": {"type": "diffuse", "reflectance": [0.9, 0.9, 0.9]},
            "b": {"type": "roughconductor", "alpha": 0.4},
        }
    )
    t = scene.bsdfs
    n = 200_000
    rng = np.random.default_rng(0)
    mat = jnp.full(n, int(np.argmax(np.asarray(t.mat_type) == bsdf_mod.BLEND)), jnp.int32)
    wi = jnp.broadcast_to(WI, (n, 3))
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    wo, p, w, _ = bsdf_mod.sample(t, mat, wi, u2, u1)
    est = np.asarray(w)[np.asarray(p) > 0].sum(0) / n
    # compare against direct MC integration of the mixture eval over
    # cosine-weighted directions
    m_ = 200_000
    from mitsuba_customization_tpu.core.warp import (
        square_to_cosine_hemisphere, square_to_cosine_hemisphere_pdf,
    )
    d = square_to_cosine_hemisphere(
        jnp.asarray(rng.uniform(size=(m_, 2)).astype(np.float32))
    )
    f = bsdf_mod.eval(t, mat[:m_], wi[:m_], d)
    pd = square_to_cosine_hemisphere_pdf(d)
    ref = np.asarray(
        jnp.sum(f / jnp.maximum(pd, 1e-9)[:, None], 0) / m_
    )
    np.testing.assert_allclose(est, ref, rtol=0.03)


@pytest.mark.slow  # heavy; faster sibling stays in the default run
def test_mask_render_transparency():
    """opacity 0 lets light straight through; opacity 1 acts like the
    child. Verify via a masked plate between camera and light."""

    def make(op):
        return mct.load_dict(
            {
                "type": "scene",
                "integrator": {"type": "path", "max_depth": 4},
                "sensor": {
                    "type": "perspective",
                    "fov": 30,
                    "to_world": {
                        "look_at": {
                            "origin": [0, 0, -3],
                            "target": [0, 0, 0],
                            "up": [0, 1, 0],
                        }
                    },
                    "film": {"width": 8, "height": 8},
                    "sampler": {"type": "independent", "sample_count": 64},
                },
                "light": {"type": "constant", "radiance": [2.0, 2.0, 2.0]},
                "plate": {
                    "type": "rectangle",
                    "to_world": {"scale": 4.0},
                    "bsdf": {
                        "type": "mask",
                        "opacity": op,
                        "bsdf": {
                            "type": "diffuse",
                            "reflectance": [0.0, 0.0, 0.0],
                        },
                    },
                },
            }
        )

    img0 = np.asarray(mct.render(make(0.0), seed=1))
    img1 = np.asarray(mct.render(make(1.0), seed=1))
    imgh = np.asarray(mct.render(make(0.5), seed=1))
    assert abs(img0.mean() - 2.0) < 0.05, img0.mean()  # fully transparent
    assert img1.mean() < 0.05, img1.mean()  # black plate blocks
    assert abs(imgh.mean() - 1.0) < 0.1, imgh.mean()  # half passes

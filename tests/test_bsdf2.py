"""Chi2 + analytic gates for the second wave of BSDFs:
roughdielectric (Walter 2007), thindielectric.

Mirrors mitsuba3 src/bsdfs/tests/test_{rough,thin}dielectric.py patterns
(SURVEY.md §4.1).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_customization_tpu.models import roughdielectric as rd
from mitsuba_customization_tpu.models import thindielectric as td
from mitsuba_customization_tpu.utils.chi2 import ChiSquareTest, SphericalDomain

WI = np.asarray([0.4, -0.15, 0.904], np.float32)
WI = WI / np.linalg.norm(WI)

PARAMS = rd.RoughDielectricParams(
    eta=jnp.float32(1.5),
    alpha=jnp.float32(0.35),
    specular_reflectance=jnp.ones(3),
    specular_transmittance=jnp.ones(3),
)


def _chi2(params, wi, n=200_000, seed=0):
    rng = np.random.default_rng(seed + 17)

    def s(u):
        wiv = jnp.broadcast_to(jnp.asarray(wi), (len(u), 3))
        u1 = jnp.asarray(rng.uniform(size=len(u)).astype(np.float32))
        wo, p, w, _ = rd.sample(params, wiv, jnp.asarray(u), u1)
        return np.asarray(wo), (np.asarray(p) > 0).astype(np.float64)

    def pf(d):
        wiv = jnp.broadcast_to(jnp.asarray(wi), (len(d), 3))
        return np.asarray(rd.pdf(params, wiv, jnp.asarray(d)))

    test = ChiSquareTest(
        SphericalDomain(), s, pf, sample_count=n, res=25, ires=16, seed=seed
    )
    assert test.run(test_count=4), test.messages


def test_roughdielectric_chi2_outside():
    _chi2(PARAMS, WI)


def test_roughdielectric_chi2_inside():
    wi_in = WI * np.asarray([1.0, 1.0, -1.0], np.float32)
    _chi2(PARAMS, wi_in, seed=1)


def test_roughdielectric_reciprocity_reflection():
    """f_r(wi,wo)/cos_o symmetric for the reflection lobe."""
    rng = np.random.default_rng(3)
    wi = rng.normal(size=(2000, 3))
    wi[:, 2] = np.abs(wi[:, 2]) + 0.1
    wi = jnp.asarray((wi / np.linalg.norm(wi, axis=-1, keepdims=True)).astype(np.float32))
    wo = rng.normal(size=(2000, 3))
    wo[:, 2] = np.abs(wo[:, 2]) + 0.1
    wo = jnp.asarray((wo / np.linalg.norm(wo, axis=-1, keepdims=True)).astype(np.float32))
    f_io = rd.eval(PARAMS, wi, wo) / jnp.abs(wo[..., 2:3])
    f_oi = rd.eval(PARAMS, wo, wi) / jnp.abs(wi[..., 2:3])
    np.testing.assert_allclose(
        np.asarray(f_io), np.asarray(f_oi), rtol=2e-3, atol=1e-5
    )


def test_roughdielectric_energy_bounded():
    """White-sky integral of sampled weights stays <= 1 (passive)."""
    rng = np.random.default_rng(5)
    n = 100_000
    wi = jnp.broadcast_to(jnp.asarray(WI), (n, 3))
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    _, p, w, _ = rd.sample(PARAMS, wi, u2, u1)
    mean_w = float(jnp.mean(jnp.where(p[:, None] > 0, w, 0.0)))
    assert mean_w <= 1.02, mean_w


def test_thindielectric_total_reflectance():
    """R' = 2R/(1+R) and lobes conserve energy exactly."""
    p = td.ThinDielectricParams(
        eta=jnp.float32(1.5),
        specular_reflectance=jnp.ones(3),
        specular_transmittance=jnp.ones(3),
    )
    n = 50_000
    rng = np.random.default_rng(0)
    wi = rng.normal(size=(n, 3))
    wi[:, 2] = np.abs(wi[:, 2]) + 0.05
    wi = jnp.asarray((wi / np.linalg.norm(wi, axis=-1, keepdims=True)).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    wo, pp, w, is_delta = td.sample(p, wi, u2)
    assert bool(is_delta.all())
    # reflected lanes mirror (-x, -y, +z); transmitted pass straight through
    refl = np.asarray(wo[:, 2] * wi[:, 2] > 0)
    np.testing.assert_allclose(
        np.asarray(wo[refl][:, :2]), -np.asarray(wi[refl][:, :2]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(wo[~refl]), -np.asarray(wi[~refl]), atol=1e-6
    )
    # weights are 1 per lobe (probability cancels), energy conserved
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-6)
    # reflect fraction matches R'
    from mitsuba_customization_tpu.models.fresnel import fresnel_dielectric

    r, _, _, _ = fresnel_dielectric(jnp.abs(wi[:, 2]), p.eta)
    r_tot = np.asarray(r * 2.0 / (1.0 + r))
    assert abs(refl.mean() - r_tot.mean()) < 0.01


@pytest.mark.slow  # heavy; faster sibling stays in the default run
def test_scene_integration_thindielectric_roughdielectric():
    import mitsuba_customization_tpu as mct

    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 6},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": {
                    "look_at": {
                        "origin": [0, 0.3, -3],
                        "target": [0, 0, 0],
                        "up": [0, 1, 0],
                    }
                },
                "film": {"width": 16, "height": 16},
                "sampler": {"type": "independent", "sample_count": 32},
            },
            "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
            "glass": {
                "type": "sphere",
                "center": [-0.7, 0, 0],
                "radius": 0.6,
                "bsdf": {"type": "roughdielectric", "alpha": 0.2},
            },
            "pane": {
                "type": "sphere",
                "center": [0.7, 0, 0],
                "radius": 0.6,
                "bsdf": {"type": "thindielectric"},
            },
        }
    )
    img = np.asarray(mct.render(scene, seed=0))
    assert not np.isnan(img).any()
    # a white furnace: everything should stay near radiance 1
    assert 0.5 < img.mean() < 1.2, img.mean()

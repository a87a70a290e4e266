"""Principled BSDF tests — chi2 sampling gates + limit-case identities.

Mirrors mitsuba3 src/bsdfs/tests/test_principled.py's strategy
(SURVEY.md §4.1): chi2 over several parameter corners + pointwise checks
against limiting lobes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.models import diffuse, principled
from mitsuba_customization_tpu.utils.chi2 import ChiSquareTest, SphericalDomain

WI = np.asarray([0.3, -0.2, 0.933], np.float32)
WI = WI / np.linalg.norm(WI)
WI = jnp.asarray(WI)


def _params(**kw):
    d = dict(
        base_color=jnp.asarray([0.7, 0.4, 0.2]),
        roughness=jnp.float32(0.5),
        anisotropic=jnp.float32(0.0),
        metallic=jnp.float32(0.0),
        spec_tint=jnp.float32(0.0),
        specular=jnp.float32(0.5),
        sheen=jnp.float32(0.0),
        sheen_tint=jnp.float32(0.0),
        clearcoat=jnp.float32(0.0),
        clearcoat_gloss=jnp.float32(0.0),
        flatness=jnp.float32(0.0),
    )
    d.update({k: jnp.asarray(v, jnp.float32) for k, v in kw.items()})
    return principled.PrincipledParams(**d)


def _chi2(params, n=150_000, seed=0):
    def s(u):
        wi = jnp.broadcast_to(WI, (len(u), 3))
        wo, p, w, _ = principled.sample(params, wi, jnp.asarray(u))
        return np.asarray(wo), (np.asarray(p) > 0).astype(np.float64)

    def pf(d):
        wi = jnp.broadcast_to(WI, (len(d), 3))
        return np.asarray(principled.pdf(params, wi, jnp.asarray(d)))

    test = ChiSquareTest(
        SphericalDomain(), s, pf, sample_count=n, res=25, ires=16, seed=seed
    )
    assert test.run(test_count=8), test.messages


@pytest.mark.parametrize(
    "kw",
    [
        {},  # plain diffuse-ish default
        {"metallic": 0.9, "roughness": 0.25},
        {"clearcoat": 1.0, "clearcoat_gloss": 0.7, "roughness": 0.4},
        {"anisotropic": 0.8, "roughness": 0.3, "metallic": 0.5},
        {"sheen": 1.0, "sheen_tint": 0.5, "roughness": 0.7,
         "flatness": 0.6},
    ],
)
def test_principled_chi2(kw):
    _chi2(_params(**kw))


def test_smooth_metal_limit():
    """metallic=1, low roughness: energy concentrates at the mirror dir."""
    p = _params(metallic=1.0, roughness=0.05, base_color=[0.9, 0.6, 0.3])
    wo_mirror = jnp.asarray([-WI[0], -WI[1], WI[2]])
    f_peak = np.asarray(principled.eval(p, WI, wo_mirror))
    wo_off = jnp.asarray([0.0, 0.0, 1.0])
    f_off = np.asarray(principled.eval(p, WI, wo_off))
    assert f_peak.mean() > 50 * f_off.mean()
    # metallic kills the diffuse lobe entirely
    assert f_off.max() < 1e-2


def test_diffuse_limit_matches_lambert_shape():
    """roughness->0, metallic=0, no coat: f/cos is near-constant (Fd90->0.5
    correction only) and close to base_color/pi at normal incidence."""
    p = _params(roughness=0.0, base_color=[0.6, 0.6, 0.6])
    wi = jnp.asarray([0.0, 0.0, 1.0])
    # off the (near-delta) specular peak so only the diffuse lobe remains
    wo = jnp.asarray([np.sin(0.7), 0.0, np.cos(0.7)], dtype=jnp.float32)
    f = np.asarray(principled.eval(p, wi, wo))
    d = np.asarray(diffuse.eval(
        diffuse.DiffuseParams(reflectance=jnp.asarray([0.6, 0.6, 0.6])),
        wi, wo,
    ))
    np.testing.assert_allclose(f, d, rtol=0.05)


def test_white_furnace_bound():
    """Energy conservation: integrated reflectance stays <= ~1 for a white
    rough metal (weight = f*cos/pdf averaged over samples ~ albedo)."""
    p = _params(metallic=1.0, roughness=0.6, base_color=[1.0, 1.0, 1.0])
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((200_000, 2)), jnp.float32)
    wi = jnp.broadcast_to(WI, (u.shape[0], 3))
    _, pdfv, w, _ = principled.sample(p, wi, u)
    alb = np.asarray(w).mean(axis=0)
    assert (alb < 1.05).all(), alb


def test_scene_integration():
    """principled compiles through load_dict and renders."""
    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": {
                    "look_at": {
                        "origin": [0, 0, -4],
                        "target": [0, 0, 0],
                        "up": [0, 1, 0],
                    }
                },
                "film": {"width": 16, "height": 16},
                "sampler": {"type": "independent", "sample_count": 4},
            },
            "sphere": {
                "type": "sphere",
                "bsdf": {
                    "type": "principled",
                    "base_color": [0.7, 0.3, 0.2],
                    "metallic": 0.4,
                    "roughness": 0.3,
                    "clearcoat": 0.5,
                },
            },
            "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        }
    )
    img = np.asarray(mct.render(scene, spp=4, seed=0))
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_traverse_exposes_principled_params():
    from mitsuba_customization_tpu.render import params as params_mod

    scene_d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective",
            "fov": 40,
            "to_world": {
                "look_at": {
                    "origin": [0, 0, -4], "target": [0, 0, 0],
                    "up": [0, 1, 0],
                }
            },
            "film": {"width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 2},
        },
        "sphere": {
            "type": "sphere",
            "bsdf": {"type": "principled", "roughness": 0.4},
        },
        "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
    }
    scene = mct.load_dict(scene_d)
    full = params_mod.traverse(scene)
    assert "bsdf.principled.roughness" in full
    assert "bsdf.principled.base_color" in full

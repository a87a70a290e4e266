"""BDPT (render/bdpt.py) estimator-equivalence and MIS gates.

The streaming 3-strategy BDPT must match the (independently validated)
path tracer in expectation on any supported scene — the mitsuba3
Z-test-vs-reference pattern (SURVEY.md §4.1), with bdpt and path as two
unbiased estimators of the same measurement. The second scene is one
where the eye strategies alone converge slowly (a small, very bright
emitter grazing a glossy floor) so the t=1 strategy carries real weight —
a bdpt implementation whose MIS weights are wrong fails loudly there.
"""

import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.render.integrator import render
from mitsuba_customization_tpu.render.sensors import look_at


def _scene(integrator, spp, depth=4, res=32, light_scale=0.5,
           light_pos=(0.5, 2.5, -0.5), radiance=40.0, alpha=0.3,
           light_rotate=None):
    return mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": integrator, "max_depth": depth},
            "sensor": {
                "type": "perspective",
                "fov": 45,
                "to_world": look_at([0, 1.0, -3.5], [0, 0, 0], [0, 1, 0]),
                "film": {"width": res, "height": res},
                "sampler": {"type": "independent", "sample_count": spp},
            },
            "ball": {
                "type": "sphere", "center": [-0.6, 0, 0], "radius": 0.8,
                "bsdf": {"type": "diffuse", "reflectance": [0.7, 0.5, 0.3]},
            },
            "ball2": {
                "type": "sphere", "center": [1.0, 0, 0.3], "radius": 0.8,
                "bsdf": {"type": "roughconductor", "alpha": alpha},
            },
            "floor": {
                "type": "rectangle",
                "to_world": {
                    "rotate": {"axis": [1, 0, 0], "angle": -90},
                    "scale": 6.0, "translate": [0, -0.8, 0],
                },
                "bsdf": {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]},
            },
            "light": {
                "type": "rectangle",
                "to_world": {
                    "rotate": light_rotate or {"axis": [1, 0, 0],
                                               "angle": 90},
                    "scale": light_scale, "translate": list(light_pos),
                },
                "emitter": {
                    "type": "area",
                    "radiance": [radiance, radiance * 0.95, radiance * 0.9],
                },
            },
        }
    )


def _compare(kw, spp_p=48, spp_b=48, tol=0.07):
    img_p = np.asarray(render(_scene("path", spp_p, **kw), seed=3))
    img_b = np.asarray(render(_scene("bdpt", spp_b, **kw), seed=7))
    assert np.isfinite(img_b).all()
    # aggregate means agree within MC noise
    assert abs(img_p.mean() - img_b.mean()) < tol * img_p.mean() + 1e-3, (
        img_p.mean(), img_b.mean()
    )
    # spatial structure agrees (normalized cross-correlation)
    a = img_p.mean(-1).ravel()
    b = img_b.mean(-1).ravel()
    a = a - a.mean()
    b = b - b.mean()
    ncc = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-12)
    assert ncc > 0.95, ncc


@pytest.mark.slow  # heavy; faster sibling stays in the default run
def test_bdpt_matches_path_glossy():
    """Golden scene 1: diffuse + GGX + area light."""
    _compare({})


def test_bdpt_matches_path_small_bright_emitter():
    """Golden scene 2: small very bright emitter close to the glossy
    floor — the configuration where eye strategies alone are noisy and
    the light-trace strategy dominates near the highlight."""
    _compare(
        {"light_scale": 0.08, "light_pos": (0.3, 0.35, -0.6),
         "radiance": 900.0, "alpha": 0.15},
        spp_p=160, spp_b=48, tol=0.09,
    )


def test_bdpt_lamp_visible_and_weighted():
    """The emission vertex splat + primary hit combine via MIS: directly
    visible emitter pixels must neither vanish nor double-count."""
    kw = {"res": 24, "depth": 3, "light_pos": (0.0, 0.9, 1.8),
          "light_scale": 0.4, "radiance": 40.0,
          "light_rotate": {"axis": [0, 1, 0], "angle": 180}}
    img_b = np.asarray(render(_scene("bdpt", 64, **kw), seed=1))
    img_p = np.asarray(render(_scene("path", 64, **kw), seed=2))
    assert np.isfinite(img_b).all()
    # the lamp (brightest region of the path render) must appear in bdpt
    # at ~the same brightness: missing-strategy -> ~0, double-count -> 2x
    iy, ix = np.unravel_index(
        np.argmax(img_p.mean(-1)), img_p.shape[:2]
    )
    bp = img_p[iy, ix].mean()
    bb = img_b[max(iy - 1, 0):iy + 2, max(ix - 1, 0):ix + 2].mean(-1).max()
    assert bp > 5.0, bp  # the lamp really is in frame
    assert 0.5 * bp < bb < 1.5 * bp, (bp, bb)


def test_bdpt_rejects_unsupported():
    with pytest.raises(ValueError, match="bdpt supports"):
        sc = mct.load_dict(
            {
                "type": "scene",
                "integrator": {"type": "bdpt"},
                "sphere": {"type": "sphere", "center": [0, 0, 0],
                           "radius": 1.0, "bsdf": {"type": "diffuse"}},
                "light": {"type": "point", "position": [0, 3, 0],
                          "intensity": [5, 5, 5]},
            }
        )
        render(sc, spp=4)

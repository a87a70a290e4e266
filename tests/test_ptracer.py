"""ptracer (light tracer) tests: convergence against the path tracer and
load-time validation of integrator strings (round-3 verdict item 5).

Pattern of mitsuba3 src/integrators/tests/test_ptracer.py: the adjoint
estimator must converge to the same image as forward path tracing on a
diffuse scene lit by an area emitter."""

import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.render.integrator import render
from mitsuba_customization_tpu.render.sensors import look_at


def _box_scene(integrator, spp=64, depth=3, res=32):
    return mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": integrator, "max_depth": depth},
            "sensor": {
                "type": "perspective",
                "fov": 60,
                "to_world": look_at([0, 1.0, -3.2], [0, 0.5, 0], [0, 1, 0]),
                "film": {"width": res, "height": res},
                "sampler": {"type": "independent", "sample_count": spp},
            },
            "floor": {
                "type": "rectangle",
                "to_world": {
                    "rotate": {"axis": [1, 0, 0], "angle": -90},
                    "scale": 3.0,
                },
                "bsdf": {"type": "diffuse", "reflectance": [0.7, 0.5, 0.3]},
            },
            "ball": {
                "type": "sphere",
                "center": [0.0, 0.6, 0.0],
                "radius": 0.6,
                "bsdf": {"type": "diffuse", "reflectance": [0.3, 0.5, 0.7]},
            },
            "lamp": {
                "type": "rectangle",
                "to_world": {
                    "rotate": {"axis": [1, 0, 0], "angle": 90},
                    "scale": 0.8,
                    "translate": [0, 2.4, 0],
                },
                "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
                "emitter": {"type": "area", "radiance": [8.0, 8.0, 8.0]},
            },
        }
    )


@pytest.mark.slow  # nightly (-m ""): heavy compile/render; a faster sibling test keeps default coverage
def test_ptracer_matches_path():
    """Light-traced and path-traced images agree (Z-test style tolerance).

    Both are unbiased estimators of the same measurement; at these sample
    counts the mean image difference must vanish within MC noise."""
    path_img = np.asarray(render(_box_scene("path", spp=196), seed=3))
    pt_img = np.asarray(render(_box_scene("ptracer", spp=196), seed=7))
    # per-pixel MC noise is large; compare robust aggregates
    assert abs(path_img.mean() - pt_img.mean()) < 0.05 * path_img.mean() + 1e-3
    # spatial structure agrees: normalized cross-correlation of the images
    a = path_img.mean(-1).ravel()
    b = pt_img.mean(-1).ravel()
    a = a - a.mean()
    b = b - b.mean()
    ncc = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-12)
    assert ncc > 0.95, ncc


def test_ptracer_direct_emitter_visible():
    """The emission-vertex splat makes the lamp itself visible."""
    img = np.asarray(render(_box_scene("ptracer", spp=64, res=24), seed=1))
    assert img.max() > 1.0  # the lamp region is much brighter than 8/pi avg
    assert np.isfinite(img).all()


def test_unknown_integrator_rejected():
    with pytest.raises(ValueError, match="not implemented"):
        _ = mct.load_dict(
            {
                "type": "scene",
                "integrator": {"type": "metropolis_lt"},
                "sphere": {"type": "sphere", "center": [0, 0, 0],
                           "radius": 1.0,
                           "bsdf": {"type": "diffuse"}},
            }
        )


def test_ptracer_rejects_unsupported_emitters():
    with pytest.raises(ValueError, match="ptracer supports"):
        _ = mct.load_dict(
            {
                "type": "scene",
                "integrator": {"type": "ptracer"},
                "sphere": {"type": "sphere", "center": [0, 0, 0],
                           "radius": 1.0,
                           "bsdf": {"type": "diffuse"}},
                "light": {"type": "constant", "radiance": [1, 1, 1]},
            }
        )

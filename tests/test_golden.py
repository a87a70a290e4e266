"""Cross-validation against the independent numpy reference renderer —
the stand-in for Mitsuba 3 scalar_rgb allclose gates (SURVEY.md §4.3):
BASELINE configs[0], sphere + MERL, direct illumination.
"""

import numpy as np

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.render.integrator import render_jit
from mitsuba_customization_tpu.render.sensors import look_at

from fixtures import synthetic_table
from reference_renderer import render_sphere_furnace


def _scene(bsdf, res):
    return mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "direct", "max_depth": 2},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]),
                "film": {"width": res, "height": res},
                "sampler": {"type": "independent", "sample_count": 64},
            },
            "sphere": {"type": "sphere", "bsdf": bsdf},
            "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        }
    )


def _interior_mask(res):
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    c = (res - 1) / 2
    # silhouette radius for this camera (dist 4, r 1, fov 40):
    # tan(asin(1/4))/tan(20 deg) = 0.709 of the half-width -> 0.355*res px;
    # stay well inside, away from the jittered rim
    return (xx - c) ** 2 + (yy - c) ** 2 < (0.3 * res) ** 2


def test_config0_diffuse_matches_reference():
    res = 32
    albedo = np.array([0.65, 0.35, 0.15])
    ours = np.asarray(render_jit(_scene(
        {"type": "diffuse", "reflectance": albedo.tolist()}, res), spp=128))
    ref = render_sphere_furnace(albedo, res=res, spp=8, brdf="diffuse")
    mask = _interior_mask(res)
    diff = np.abs(ours[mask] - ref[mask])
    # diffuse furnace is noise-free analytically; tolerance covers the
    # silhouette-edge pixels that mix background (jittered vs centered rays)
    assert np.median(diff) < 0.01, np.median(diff)
    assert np.allclose(np.mean(ours[mask], 0), albedo, atol=0.02)


def test_config0_merl_matches_reference():
    """Sphere + synthetic MERL 'blue-metallic-paint-like' table, direct
    illumination, 64 spp vs the independent nearest-neighbor reference."""
    res = 24
    table = synthetic_table(alpha=0.35, diffuse=0.25, spec=0.4,
                            rgb=(0.3, 0.4, 0.9))
    ours = np.asarray(
        render_jit(_scene({"type": "merl", "table": table}, res), spp=256)
    )
    ref = render_sphere_furnace(table, res=res, spp=512, brdf="merl")
    mask = _interior_mask(res)
    rel = np.abs(ours[mask] - ref[mask]) / np.maximum(ref[mask], 0.05)
    # nearest-neighbor vs trilinear + MC noise: generous but meaningful gate
    assert np.median(rel) < 0.05, np.median(rel)
    assert np.mean(rel) < 0.15, np.mean(rel)

"""normalmap/bumpmap tests (mitsuba3 src/bsdfs/{normalmap,bumpmap}.cpp
parity — SURVEY.md §2.4)."""

import numpy as np

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.models.normalmap import bump_to_normal


def _plate_scene(bsdf):
    return mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "aov_normals"},
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
                "sampler": {"type": "independent", "sample_count": 16},
            },
            "light": {"type": "constant", "radiance": [1, 1, 1]},
            "plate": {
                "type": "rectangle",
                "to_world": {"scale": 4.0},
                "bsdf": bsdf,
            },
        }
    )


def test_normalmap_tilts_shading_normal():
    # constant normal map tilted toward +x in tangent space
    tilt = np.zeros((2, 2, 3), np.float32)
    tilt[..., 0] = 0.5 + 0.25  # x -> +0.5 after decode
    tilt[..., 1] = 0.5
    tilt[..., 2] = 0.5 + 0.43  # approx normalized (0.5, 0, 0.866)
    scene = _plate_scene(
        {
            "type": "normalmap",
            "normalmap": {"bitmap": tilt},
            "bsdf": {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]},
        }
    )
    img = np.asarray(mct.render(scene, seed=0))
    n = img[4, 4] * 2.0 - 1.0  # decode the aov
    # plate faces -z toward the camera; the tilt moves the normal off axis
    base = np.asarray(mct.render(_plate_scene(
        {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]}), seed=0))
    n0 = base[4, 4] * 2.0 - 1.0
    assert np.dot(n, n0) / (np.linalg.norm(n) * np.linalg.norm(n0)) < 0.999, (n, n0)
    assert np.linalg.norm(n) > 0.9
    # tangent-space x component moved the world normal measurably
    assert np.linalg.norm(n - n0) > 0.3, (n, n0)


def test_bump_to_normal_flat_is_up():
    nm = bump_to_normal(np.zeros((8, 8), np.float32))
    np.testing.assert_allclose(nm[..., 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(nm[..., :2], 0.5, atol=1e-6)


def test_bumpmap_render_changes_shading():
    ramp = np.tile(np.linspace(0, 1, 16, dtype=np.float32), (16, 1))
    scene = _plate_scene(
        {
            "type": "bumpmap",
            "texture": {"bitmap": ramp},
            "scale": 0.2,
            "bsdf": {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]},
        }
    )
    img = np.asarray(mct.render(scene, seed=0))
    base = np.asarray(mct.render(_plate_scene(
        {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]}), seed=0))
    assert np.abs(img - base).max() > 0.01
    assert not np.isnan(img).any()

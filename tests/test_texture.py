"""Texture tests: bitmap bilinear lookup + checkerboard + textured render.

Mirrors mitsuba3 src/textures/tests (SURVEY.md §4.1 test strategy).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.models import texture as tex


def _stack_with_image(img, uv_scale=(1.0, 1.0)):
    return tex.build_stack(
        [dict(type=tex.BITMAP, image=img, uv_scale=uv_scale)]
    )


def test_bitmap_pixel_centers():
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    stack = _stack_with_image(img)
    slot = jnp.zeros(4, jnp.int32)
    # uv at the 4 texel centers; v=0 is the bottom row (row index 1)
    uv = jnp.asarray(
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]]
    )
    out = np.asarray(tex.eval(stack, slot, uv))
    np.testing.assert_allclose(out[0], img[1, 0], rtol=1e-6)
    np.testing.assert_allclose(out[1], img[1, 1], rtol=1e-6)
    np.testing.assert_allclose(out[2], img[0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[3], img[0, 1], rtol=1e-6)


def test_bitmap_bilinear_midpoint():
    img = np.zeros((1, 2, 3), np.float32)
    img[0, 1] = 1.0
    stack = _stack_with_image(img)
    out = np.asarray(
        tex.eval(stack, jnp.zeros(1, jnp.int32), jnp.asarray([[0.5, 0.5]]))
    )
    np.testing.assert_allclose(out[0], 0.5, rtol=1e-5)


def test_bitmap_wrap():
    img = np.asarray([[[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]]], np.float32)
    stack = _stack_with_image(img)
    slot = jnp.zeros(2, jnp.int32)
    uv = jnp.asarray([[0.5, 0.25], [0.5, 1.25]])  # same point, wrapped v
    out = np.asarray(tex.eval(stack, slot, uv))
    np.testing.assert_allclose(out[0], out[1], rtol=1e-5)


def test_checkerboard_cells():
    stack = tex.build_stack(
        [
            dict(
                type=tex.CHECKERBOARD,
                value0=np.asarray([1.0, 0, 0], np.float32),
                value1=np.asarray([0, 1.0, 0], np.float32),
            )
        ]
    )
    slot = jnp.zeros(4, jnp.int32)
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    out = np.asarray(tex.eval(stack, slot, uv))
    np.testing.assert_allclose(out[0], [1, 0, 0])
    np.testing.assert_allclose(out[1], [0, 1, 0])
    np.testing.assert_allclose(out[2], [0, 1, 0])
    np.testing.assert_allclose(out[3], [1, 0, 0])


@pytest.mark.slow  # heavy; faster sibling stays in the default run
def test_textured_rectangle_render():
    """A checkerboard rectangle under constant illumination shows the two
    albedos (scaled by the constant-light furnace factor) in its cells."""
    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": {
                    "look_at": {
                        "origin": [0, 0, -2.2],
                        "target": [0, 0, 0],
                        "up": [0, 1, 0],
                    }
                },
                "film": {"width": 32, "height": 32},
                "sampler": {"type": "independent", "sample_count": 128},
            },
            "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
            "board": {
                "type": "rectangle",
                "bsdf": {
                    "type": "diffuse",
                    "reflectance": {
                        "type": "checkerboard",
                        "color0": [0.8, 0.1, 0.1],
                        "color1": [0.1, 0.8, 0.1],
                    },
                },
            },
        }
    )
    img = np.asarray(mct.render(scene, seed=1))
    # rectangle spans [-1,1]^2; uv=(0..1); cells split at uv=0.5.
    # Film y is flipped vs world y; sample two cells well inside the quad.
    q1 = img[20, 10]  # uv approx (0.25, 0.25) region -> color0-ish
    q2 = img[20, 22]  # uv approx (0.75, 0.25) region -> color1-ish
    assert q1[0] > 2.0 * q1[1], q1
    assert q2[1] > 2.0 * q2[0], q2


def test_mesh_attribute_vertex_colors():
    """mesh_attribute texture: barycentric vertex-color interpolation
    (mitsuba3 src/textures/mesh_attribute.cpp capability)."""
    import mitsuba_customization_tpu as mct
    from mitsuba_customization_tpu.render.integrator import render
    from mitsuba_customization_tpu.render.sensors import look_at

    v = np.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    vc = np.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32
    )
    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {
                "type": "perspective",
                "fov": 60,
                "to_world": look_at([0, 0, -2.2], [0, 0, 0], [0, 1, 0]),
                "film": {"width": 24, "height": 24},
                "sampler": {"type": "independent", "sample_count": 16},
            },
            "quad": {
                "type": "mesh",
                "vertices": v,
                "faces": f,
                "vertex_colors": vc,
                "bsdf": {
                    "type": "diffuse",
                    "reflectance": {"type": "mesh_attribute",
                                    "name": "vertex_color"},
                },
            },
            "sky": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        }
    )
    img = np.asarray(render(scene, spp=16, seed=0))
    assert np.isfinite(img).all()
    # screen x is flipped vs world x here (camera looks along +z):
    # v0 (red) bottom-left world -> appears bottom-right on film, etc.
    # Robust checks: each corner of the quad region is dominated by its
    # vertex color; the white corner is brightest overall.
    h, wd = img.shape[:2]
    q = 5
    tl, tr = img[q, q], img[q, wd - 1 - q]
    bl, br = img[h - 1 - q, q], img[h - 1 - q, wd - 1 - q]
    corners = {"tl": tl, "tr": tr, "bl": bl, "br": br}
    # one corner is ~white (all channels comparable and bright)
    whites = [
        k for k, c in corners.items()
        if c.min() > 0.15 and c.max() / max(c.min(), 1e-6) < 2.0
    ]
    assert whites, corners
    # the other three corners are each dominated by a distinct channel
    dom = sorted(
        int(np.argmax(c)) for k, c in corners.items() if k not in whites
    )
    assert dom == [0, 1, 2], (corners, dom)


def test_volume_texture():
    """volume texture: 3-D grid sampled at the world hit position drives
    a BSDF parameter (mitsuba3 src/textures/volume.cpp capability)."""
    import mitsuba_customization_tpu as mct
    from mitsuba_customization_tpu.render.integrator import render
    from mitsuba_customization_tpu.render.sensors import look_at

    # grid: red for x < 0.5 (grid coords), green for x >= 0.5
    grid = np.zeros((2, 2, 2, 3), np.float32)
    grid[:, :, 0] = [1, 0, 0]
    grid[:, :, 1] = [0, 1, 0]
    # unit cube placed over [-1, 1]^2 x [-0.1, 0.1] around the quad
    to_world = np.asarray(
        [[2, 0, 0, -1], [0, 2, 0, -1], [0, 0, 0.2, -0.1], [0, 0, 0, 1]],
        np.float32,
    )
    v = np.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {
                "type": "perspective",
                "fov": 60,
                "to_world": look_at([0, 0, -2.2], [0, 0, 0], [0, 1, 0]),
                "film": {"width": 16, "height": 16},
                "sampler": {"type": "independent", "sample_count": 8},
            },
            "quad": {
                "type": "mesh", "vertices": v, "faces": f,
                "bsdf": {
                    "type": "diffuse",
                    "reflectance": {"type": "volume", "grid": grid,
                                    "to_world": to_world},
                },
            },
            "sky": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        }
    )
    img = np.asarray(render(scene, spp=8, seed=0))
    assert np.isfinite(img).all()
    left = img[8, 2]
    right = img[8, 13]
    # one side red-dominant, the other green-dominant (screen x may flip)
    sides = sorted([int(np.argmax(left)), int(np.argmax(right))])
    assert sides == [0, 1], (left, right)

"""Round-4 plugin gap closures: serialized loader, directionalarea,
projector, batch sensor (SURVEY.md §2.4 rows; round-3 verdict item 8)."""

import numpy as np
import jax.numpy as jnp

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.render.integrator import render
from mitsuba_customization_tpu.render.sensors import look_at


def test_serialized_roundtrip(tmp_path):
    from mitsuba_customization_tpu.utils.meshgen import (
        icosphere_blob,
        vertex_normals,
    )
    from mitsuba_customization_tpu.utils.serialized import (
        read_serialized,
        write_serialized,
    )

    v, f = icosphere_blob(n_sub=1)
    n = vertex_normals(v, f)
    uv = np.random.RandomState(0).rand(len(v), 2).astype(np.float32)
    path = str(tmp_path / "two.serialized")
    write_serialized(path, [(v, f, n, uv), (v * 2.0, f, None, None)])

    v0, f0, n0, uv0 = read_serialized(path, 0)
    assert np.allclose(v0, v) and (f0 == f).all()
    assert np.allclose(n0, n) and np.allclose(uv0, uv)
    v1, f1, n1, uv1 = read_serialized(path, 1)
    assert np.allclose(v1, v * 2.0) and n1 is None and uv1 is None


def test_serialized_shape_loads_into_scene(tmp_path):
    from mitsuba_customization_tpu.utils.meshgen import icosphere_blob
    from mitsuba_customization_tpu.utils.serialized import write_serialized

    v, f = icosphere_blob(n_sub=1)
    path = str(tmp_path / "blob.serialized")
    write_serialized(path, [(v, f, None, None)])
    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "depth", "max_depth": 1},
            "sensor": {
                "type": "perspective",
                "to_world": look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]),
                "film": {"width": 16, "height": 16},
            },
            "blob": {"type": "serialized", "filename": path},
        }
    )
    img = np.asarray(render(scene, spp=1, seed=0))
    assert img[8, 8, 0] > 0  # center ray hits the blob


def _floor_scene(emitter_dict, res=24, cam=None):
    # default camera looks at the floor from the side so it does not peer
    # through overhead emitter shapes
    cam = cam or look_at([0, 3.9, -2.6], [0, 0, 0], [0, 1, 0])
    return mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {
                "type": "perspective",
                "fov": 60,
                "to_world": cam,
                "film": {"width": res, "height": res},
                "sampler": {"type": "independent", "sample_count": 16},
            },
            "floor": {
                "type": "rectangle",
                "to_world": {
                    "rotate": {"axis": [1, 0, 0], "angle": -90},
                    "scale": 6.0,
                },
                "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.8, 0.8]},
            },
            **emitter_dict,
        }
    )


def test_directionalarea_collimated_footprint():
    """A small downward-facing directionalarea panel lights exactly its
    footprint on the floor (collimated beam), at L = albedo/pi * R."""
    scene = _floor_scene(
        {
            "panel": {
                "type": "rectangle",
                "to_world": {
                    "rotate": {"axis": [1, 0, 0], "angle": 90},  # faces -y
                    "scale": 1.0,
                    "translate": [0, 2.0, 0],
                },
                "emitter": {
                    "type": "directionalarea",
                    "radiance": [4.0, 4.0, 4.0],
                },
            }
        }
    )
    img = np.asarray(render(scene, spp=32, seed=0))
    res = img.shape[0]
    center = img[res // 2, res // 2, 0]
    corner = img[1, 1, 0]
    expected = 0.8 / np.pi * 4.0
    assert abs(center - expected) < 0.15 * expected
    assert corner < 0.02 * expected  # outside the beam footprint


def test_projector_texture_pattern():
    """A projector shining straight down paints its texture: left half red,
    right half blue; outside the frustum stays dark."""
    img_tex = np.zeros((8, 8, 3), np.float32)
    img_tex[:, :4, 0] = 1.0  # left half red
    img_tex[:, 4:, 2] = 1.0  # right half blue
    scene = _floor_scene(
        {
            "beam": {
                "type": "projector",
                "to_world": look_at([0, 3.0, 0], [0, 0, 0], [0, 0, 1]),
                "fov": 30,
                "bitmap": img_tex,
                "scale": 40.0,
            }
        }
    )
    img = np.asarray(render(scene, spp=32, seed=0))
    res = img.shape[0]
    mid = res // 2
    # camera up = +z, projector up = +z; projector x maps to film x
    left = img[mid, mid - 2]
    right = img[mid, mid + 2]
    corner = img[1, 1]
    assert left[0] > 5 * max(left[2], 1e-6)
    assert right[2] > 5 * max(right[0], 1e-6)
    assert corner.max() < 0.05 * max(left[0], right[2])


def test_batch_sensor_strips():
    """Batch of two perspective sensors = two half-width renders side by
    side."""
    from mitsuba_customization_tpu.render.integrator import render as rdr

    look_a = look_at([0, 0, -4], [-0.8, 0, 0], [0, 1, 0])
    look_b = look_at([0, 0, -4], [1.0, 0, 0.5], [0, 1, 0])
    base = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sphere_l": {
            "type": "sphere",
            "center": [-0.8, 0, 0],
            "radius": 0.6,
            "bsdf": {"type": "diffuse", "reflectance": [0.9, 0.2, 0.2]},
        },
        "sphere_r": {
            "type": "sphere",
            "center": [1.0, 0, 0.5],
            "radius": 0.6,
            "bsdf": {"type": "diffuse", "reflectance": [0.2, 0.2, 0.9]},
        },
        "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
    }
    w, h = 32, 16
    batch = mct.load_dict(
        {
            **base,
            "sensor": {
                "type": "batch",
                "film": {"width": w, "height": h},
                "a": {"type": "perspective", "fov": 45, "to_world": look_a},
                "b": {"type": "perspective", "fov": 45, "to_world": look_b},
            },
        }
    )
    img = np.asarray(rdr(batch, spp=16, seed=3))

    def single(look):
        sc = mct.load_dict(
            {
                **base,
                "sensor": {
                    "type": "perspective",
                    "fov": 45,
                    "to_world": look,
                    "film": {"width": w // 2, "height": h},
                },
            }
        )
        return np.asarray(rdr(sc, spp=16, seed=3))

    ia = single(look_a)
    ib = single(look_b)
    # same scene, same seeds, same pixel footprint per strip -> close up to
    # sampler lane indexing differences; compare means generously
    assert abs(img[:, : w // 2].mean() - ia.mean()) < 0.05
    assert abs(img[:, w // 2:].mean() - ib.mean()) < 0.05
    # the strips actually differ (two distinct views)
    assert np.abs(img[:, : w // 2] - img[:, w // 2:]).mean() > 0.01

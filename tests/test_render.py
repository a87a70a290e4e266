"""End-to-end render tests with analytic expectations.

Pattern of mitsuba3 src/render/tests (SURVEY.md §4.1): low-spp renders
checked against closed-form/converged values with MC-noise-aware
tolerances. The furnace configurations have exact answers:

* diffuse sphere under a constant emitter of unit radiance -> pixel value
  = albedo (hemisphere cosine integral of f = albedo; convex shape, no
  self-occlusion, any max_depth);
* background pixels -> emitter radiance;
* smooth conductor sphere -> Fresnel-weighted background.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.render.integrator import render_jit
from mitsuba_customization_tpu.render.sensors import look_at

from fixtures import synthetic_table


def _sphere_scene(bsdf, spp=32, depth=3, res=48, emitter=None):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": depth},
        "sensor": {
            "type": "perspective",
            "fov": 40,
            "to_world": look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]),
            "film": {"width": res, "height": res},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "sphere": {"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
                   "bsdf": bsdf},
        "light": emitter or {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
    }
    return mct.load_dict(d)


def _center_mask(res, frac=0.25):
    """Pixels well inside the sphere silhouette."""
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    c = (res - 1) / 2
    return (xx - c) ** 2 + (yy - c) ** 2 < (res * frac) ** 2


def test_furnace_diffuse():
    albedo = np.array([0.7, 0.4, 0.2])
    scene = _sphere_scene(
        {"type": "diffuse", "reflectance": albedo.tolist()}, spp=64
    )
    img = np.asarray(render_jit(scene))
    mask = _center_mask(scene.config.width)
    sphere_px = img[mask]
    assert np.allclose(sphere_px.mean(0), albedo, rtol=0.03), sphere_px.mean(0)
    # background sees the emitter directly
    bg = img[0, 0]
    assert np.allclose(bg, 1.0, rtol=0.02), bg


@pytest.mark.slow  # heavy; faster sibling stays in the default run
def test_furnace_depth_invariance():
    """Convex diffuse shape in a furnace: result independent of max_depth."""
    albedo = [0.5, 0.5, 0.5]
    img2 = np.asarray(
        render_jit(_sphere_scene({"type": "diffuse", "reflectance": albedo},
                                 spp=64, depth=2))
    )
    img5 = np.asarray(
        render_jit(_sphere_scene({"type": "diffuse", "reflectance": albedo},
                                 spp=64, depth=5))
    )
    mask = _center_mask(48)
    assert np.allclose(img2[mask].mean(0), img5[mask].mean(0), rtol=0.03)


def test_furnace_conductor_mirror():
    """Ideal mirror (R=1) in a uniform furnace returns radiance 1."""
    scene = _sphere_scene(
        {
            "type": "conductor",
            "eta": [0.0, 0.0, 0.0],
            "k": [1e6, 1e6, 1e6],  # reflectance -> 1
        },
        spp=32,
    )
    img = np.asarray(render_jit(scene))
    mask = _center_mask(scene.config.width)
    assert np.allclose(img[mask].mean(0), 1.0, rtol=0.02)


def test_furnace_merl():
    """MERL sphere in a furnace: pixel = directional albedo of the table;
    checks table eval + importance sampling inside the full integrator."""
    table = synthetic_table(alpha=0.3, diffuse=0.3, spec=0.5)
    scene = _sphere_scene({"type": "merl", "table": table}, spp=128, res=32)
    img = np.asarray(render_jit(scene))
    mask = _center_mask(32, frac=0.15)  # near-normal incidence pixels
    # reference: integrate f*cos over hemisphere at normal incidence
    from mitsuba_customization_tpu.models import tabulated
    from mitsuba_customization_tpu.core.warp import (
        square_to_cosine_hemisphere,
    )

    brdf = tabulated.TabulatedBRDF.build(jnp.asarray(table))
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.random((200_000, 2), dtype=np.float32))
    wo = square_to_cosine_hemisphere(u)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wo.shape)
    # E[f cos / (cos/pi)] = pi * E[f]
    fvals = tabulated.eval_raw(brdf.table, wi, wo)
    expected = np.pi * np.asarray(fvals).mean(0)
    got = img[mask].mean(0)
    assert np.allclose(got, expected, rtol=0.1), (got, expected)


def test_area_light_visible():
    """Emissive rectangle is seen directly and lights a diffuse floor."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective",
            "fov": 60,
            "to_world": look_at([0, 1.5, -4], [0, 0.5, 0], [0, 1, 0]),
            "film": {"width": 40, "height": 40},
            "sampler": {"type": "independent", "sample_count": 64},
        },
        "floor": {
            "type": "rectangle",
            "to_world": {
                "rotate": {"axis": [1, 0, 0], "angle": -90},
                "scale": 4.0,
            },
            "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.8, 0.8]},
        },
        "lamp": {
            "type": "rectangle",
            "to_world": {
                "rotate": {"axis": [1, 0, 0], "angle": 90},
                "translate": [0, 2.0, 0],
            },
            "emitter": {"type": "area", "radiance": [5.0, 5.0, 5.0]},
            "bsdf": {"type": "diffuse", "reflectance": [0.0, 0.0, 0.0]},
        },
    }
    scene = mct.load_dict(d)
    img = np.asarray(render_jit(scene))
    assert np.isfinite(img).all()
    # the floor under the lamp is lit
    assert img[25:35, 15:25].mean() > 0.05
    # analytic check at the floor point directly under the lamp center:
    # L = albedo/pi * radiance * form-factor of a square [-1,1]^2 at h=2
    # form factor integral for a point under center of square side 2 at
    # height 2: F = (1/pi)*int cos1 cos2 / r^2 dA; compute numerically
    xs = np.linspace(-1, 1, 200)
    X, Y = np.meshgrid(xs, xs)
    h = 2.0
    r2 = X**2 + Y**2 + h**2
    cos1 = h / np.sqrt(r2)
    integrand = cos1 * cos1 / r2
    F = integrand.mean() * 4.0  # dA total = 4
    expected = 0.8 / np.pi * 5.0 * F
    # the floor origin (0,0,0) projects to pixel ~(row 24, col 20) for this
    # camera (fov 60, res 40, camera at (0,1.5,-4) toward (0,0.5,0))
    got = img[23:26, 19:22].mean()
    assert abs(got - expected) / expected < 0.15, (got, expected)


def test_point_light_inverse_square():
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective",
            "fov": 40,
            "to_world": look_at([0, 2, -4], [0, 0, 0], [0, 1, 0]),
            "film": {"width": 32, "height": 32},
            "sampler": {"type": "independent", "sample_count": 16},
        },
        "floor": {
            "type": "rectangle",
            "to_world": {"rotate": {"axis": [1, 0, 0], "angle": -90},
                         "scale": 10.0},
            "bsdf": {"type": "diffuse", "reflectance": [1.0, 1.0, 1.0]},
        },
        "light": {"type": "point", "position": [0, 3, 0],
                  "intensity": [10, 10, 10]},
    }
    scene = mct.load_dict(d)
    img = np.asarray(render_jit(scene))
    # floor directly under the light: L = albedo/pi * I cos / d^2
    # cos=1, d=3 -> L = 10/(pi*9)
    expected = 10 / (np.pi * 9)
    center = img[16:20, 14:18].mean()
    assert abs(center - expected) / expected < 0.1, (center, expected)


def test_depth_integrator():
    scene = _sphere_scene({"type": "diffuse"}, spp=4)
    img = np.asarray(render_jit(scene, integrator="depth"))
    c = scene.config.width // 2
    assert abs(img[c, c, 0] - 3.0) < 0.02  # camera at z=-4, sphere r=1


def test_row_chunked_render_matches(monkeypatch):
    """Films larger than MAX_WAVEFRONT render in row slabs (pixel-axis
    chunking) with identical output — box and splat filters both."""
    import mitsuba_customization_tpu.render.integrator as integ

    scene = _sphere_scene(
        {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]},
        spp=4, res=16,
    )
    img_full = np.asarray(integ.render(scene, spp=4, seed=0))
    monkeypatch.setattr(integ, "MAX_WAVEFRONT", 16 * 4 * 4)
    img_chunked = np.asarray(integ.render(scene, spp=4, seed=0))
    assert np.allclose(img_full, img_chunked, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # splat-filter variant of the row-chunk gate above
def test_row_chunked_render_matches_splat(monkeypatch):
    import mitsuba_customization_tpu.render.integrator as integ

    scene = _sphere_scene(
        {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]},
        spp=4, res=16,
    )
    scene.config.rfilter = "tent"
    img_full = np.asarray(integ.render(scene, spp=4, seed=0))
    monkeypatch.setattr(integ, "MAX_WAVEFRONT", 16 * 4 * 4)
    img_chunked = np.asarray(integ.render(scene, spp=4, seed=0))
    assert np.allclose(img_full, img_chunked, rtol=1e-5, atol=1e-6)


def test_radiancemeter_pointwise():
    """radiancemeter = the reference's point-wise integrator validator
    (mitsuba3 src/sensors/radiancemeter.cpp): one ray toward a known
    surface returns its radiance exactly."""
    import mitsuba_customization_tpu as mct

    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "direct", "max_depth": 2},
            "sensor": {
                "type": "radiancemeter",
                # at origin looking +z into a diffuse wall at z=2
                "to_world": np.eye(4).tolist(),
                "sampler": {"type": "independent", "sample_count": 256},
            },
            "wall": {
                "type": "rectangle",
                "to_world": {
                    "rotate": {"axis": [1, 0, 0], "angle": 180},
                    "scale": 10.0,
                    "translate": [0, 0, 2.0],
                },
                "bsdf": {"type": "diffuse", "reflectance": [0.5, 0.5, 0.5]},
            },
            "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        }
    )
    img = np.asarray(mct.render(scene, spp=256, seed=0))
    assert img.shape == (1, 1, 3)
    # furnace: diffuse albedo 0.5 under unit constant light -> L = 0.5
    np.testing.assert_allclose(img[0, 0], 0.5, rtol=0.05)


def test_irradiancemeter_constant_field():
    """Uniform unit radiance field: E = pi (cosine integral)."""
    import mitsuba_customization_tpu as mct

    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "direct", "max_depth": 2},
            "sensor": {
                "type": "irradiancemeter",
                "to_world": np.eye(4).tolist(),
                "sampler": {"type": "independent", "sample_count": 512},
            },
            # empty-ish scene: one tiny far-away sphere so geometry exists
            "dot": {
                "type": "sphere", "center": [100, 100, -100],
                "radius": 0.1, "bsdf": {"type": "diffuse"},
            },
            "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        }
    )
    img = np.asarray(mct.render(scene, spp=512, seed=0))
    np.testing.assert_allclose(img[0, 0], np.pi, rtol=0.02)

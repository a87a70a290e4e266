"""Spectra tests (mitsuba3 src/spectra/ parity — SURVEY.md §2.4):
blackbody, D65, regular-grid spectrum resolution to RGB."""

import numpy as np

from mitsuba_customization_tpu.core.spectrum import (
    blackbody_rgb,
    d65_rgb,
    linear_to_srgb,
    luminance,
    spectrum_to_rgb,
    srgb_to_linear,
)
from mitsuba_customization_tpu.render.scene import resolve_spectrum


def test_blackbody_hue_ordering():
    warm = blackbody_rgb(2500)
    neutral = blackbody_rgb(6504)
    cool = blackbody_rgb(12000)
    assert warm[0] > warm[2]  # red-dominant
    assert cool[2] > cool[0]  # blue-dominant
    np.testing.assert_allclose(neutral, 1.0, atol=0.08)  # near-white
    # normalized to luminance 1
    import jax.numpy as jnp

    for c in (warm, neutral, cool):
        np.testing.assert_allclose(float(luminance(jnp.asarray(c))), 1.0,
                                   rtol=1e-5)


def test_d65_near_white():
    np.testing.assert_allclose(d65_rgb(), 1.0, atol=0.05)


def test_flat_spectrum_is_white():
    rgb = spectrum_to_rgb([380, 780], [1.0, 1.0])
    assert rgb.min() > 0.8 and rgb.max() < 1.3, rgb


def test_resolve_spectrum_forms():
    np.testing.assert_allclose(resolve_spectrum(0.5), [0.5] * 3)
    np.testing.assert_allclose(resolve_spectrum([1, 2, 3]), [1, 2, 3])
    np.testing.assert_allclose(
        resolve_spectrum({"type": "rgb", "value": [0.1, 0.2, 0.3]}),
        [0.1, 0.2, 0.3],
    )
    bb = resolve_spectrum({"type": "blackbody", "temperature": 3000,
                           "scale": 2.0})
    np.testing.assert_allclose(bb, blackbody_rgb(3000) * 2.0, rtol=1e-6)
    reg = resolve_spectrum(
        {"type": "regular", "lambda_min": 380, "lambda_max": 780,
         "values": [1.0] * 11}
    )
    assert reg.min() > 0.8


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(srgb_to_linear(linear_to_srgb(x))), x, atol=1e-5
    )

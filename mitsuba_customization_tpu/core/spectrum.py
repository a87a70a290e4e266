"""Color handling: RGB spectra, luminance, sRGB transfer functions.

TPU-native counterpart of mitsuba3 src/core/spectrum.cpp + src/render/srgb.cpp
(SURVEY.md §2.3). The build targets the *_rgb variants of the reference
(scalar_rgb / cuda_ad_rgb), so Spectrum == linear-Rec709 RGB (..., 3).
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec. 709 / CIE-Y luminance weights — mitsuba3 luminance(Color3f).
_LUM = jnp.array([0.212671, 0.715160, 0.072169], dtype=jnp.float32)


def luminance(rgb):
    """CIE Y of a linear-RGB color (..., 3) -> (...)."""
    return rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169


def srgb_to_linear(c):
    """sRGB gamma -> linear (IEC 61966-2-1), elementwise."""
    return jnp.where(
        c <= 0.04045,
        c / 12.92,
        jnp.power(jnp.maximum((c + 0.055) / 1.055, 1e-8), 2.4),
    )


def linear_to_srgb(c):
    """Linear -> sRGB gamma, elementwise."""
    c = jnp.maximum(c, 0.0)
    return jnp.where(
        c <= 0.0031308,
        c * 12.92,
        1.055 * jnp.power(jnp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055,
    )

"""Smooth diffuse (Lambertian) BSDF — mitsuba3 src/bsdfs/diffuse.cpp
(SURVEY.md §2.4, starred: needed by the baseline configs).

params: reflectance (..., 3) albedo in [0, 1].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.core.warp import (
    square_to_cosine_hemisphere,
    square_to_cosine_hemisphere_pdf,
)

INV_PI = 1.0 / jnp.pi


class DiffuseParams(NamedTuple):
    reflectance: jnp.ndarray  # (..., 3)


def eval(params: DiffuseParams, wi, wo):
    """f * cos(theta_o) = albedo/pi * cos(theta_o), one-sided."""
    active = jnp.logical_and(m.cos_theta(wi) > 0.0, m.cos_theta(wo) > 0.0)
    val = params.reflectance * (INV_PI * jnp.maximum(m.cos_theta(wo), 0.0))[..., None]
    return jnp.where(active[..., None], val, 0.0)


def pdf(params: DiffuseParams, wi, wo):
    active = jnp.logical_and(m.cos_theta(wi) > 0.0, m.cos_theta(wo) > 0.0)
    return jnp.where(active, square_to_cosine_hemisphere_pdf(wo), 0.0)


def sample(params: DiffuseParams, wi, sample2, sample1=None):
    """Returns (wo, pdf, weight, sampled_delta)."""
    wo = square_to_cosine_hemisphere(sample2)
    p = pdf(params, wi, wo)
    # weight = f*cos/pdf = albedo exactly (cosine cancels).
    active = m.cos_theta(wi) > 0.0
    weight = jnp.where(active[..., None], params.reflectance, 0.0)
    return wo, p, weight, jnp.zeros_like(active)

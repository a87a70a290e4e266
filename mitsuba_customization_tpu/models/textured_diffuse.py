"""Diffuse BSDF with textured reflectance (bitmap / checkerboard).

The texture-bearing variant of models/diffuse.py: mitsuba3 composes
src/bsdfs/diffuse.cpp with a nested src/textures/* plugin (SURVEY.md
§2.4); here that composition is its own static kernel so the masked
dispatch (models/bsdf.py) stays branch-free — lanes carry a texture
binding and evaluate it at si.uv.
"""

from __future__ import annotations

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.core.warp import (
    square_to_cosine_hemisphere,
    square_to_cosine_hemisphere_pdf,
)
from mitsuba_customization_tpu.models import texture as tex_mod

INV_PI = 1.0 / jnp.pi

# Dispatch contract flags (models/bsdf.py reads these).
NEEDS_SLOT = True
NEEDS_UV = True
NEEDS_MASK = True


def _reflectance(stack, slot, uv, mask=None):
    if uv is None:
        return stack.value0[slot]
    if mask is not None:
        uv = jnp.where(mask[..., None], uv, 0.0)
    return tex_mod.eval(stack, slot, uv)


def eval(stack, wi, wo, slot=None, uv=None, mask=None):
    refl = _reflectance(stack, slot, uv, mask)
    active = jnp.logical_and(m.cos_theta(wi) > 0.0, m.cos_theta(wo) > 0.0)
    val = refl * (INV_PI * jnp.maximum(m.cos_theta(wo), 0.0))[..., None]
    return jnp.where(active[..., None], val, 0.0)


def pdf(stack, wi, wo, slot=None, uv=None, mask=None):
    active = jnp.logical_and(m.cos_theta(wi) > 0.0, m.cos_theta(wo) > 0.0)
    return jnp.where(active, square_to_cosine_hemisphere_pdf(wo), 0.0)


def sample(stack, wi, sample2, sample1=None, slot=None, uv=None, mask=None):
    wo = square_to_cosine_hemisphere(sample2)
    p = square_to_cosine_hemisphere_pdf(wo)
    refl = _reflectance(stack, slot, uv, mask)
    active = jnp.logical_and(m.cos_theta(wi) > 0.0, p > 0.0)
    return (
        wo,
        jnp.where(active, p, 0.0),
        jnp.where(active[..., None], refl, 0.0),
        jnp.zeros_like(active),
    )

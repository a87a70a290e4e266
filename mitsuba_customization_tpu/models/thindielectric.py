"""Thin dielectric slab — mitsuba3 src/bsdfs/thindielectric.cpp
(SURVEY.md §2.4). Delta BSDF for a thin two-interface slab: internal
bounces sum into an effective reflectance R' = 2R/(1+R); transmission
passes straight through (no net refraction offset for a thin slab).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.models.fresnel import fresnel_dielectric


class ThinDielectricParams(NamedTuple):
    eta: jnp.ndarray  # (...) relative IOR int/ext
    specular_reflectance: jnp.ndarray  # (..., 3)
    specular_transmittance: jnp.ndarray  # (..., 3)


def _r_total(params, wi):
    r, _, _, _ = fresnel_dielectric(jnp.abs(m.cos_theta(wi)), params.eta)
    # geometric series of internal bounces: R + T R T (1 + R^2 + ...)
    return r * 2.0 / (1.0 + r)


def eval(params: ThinDielectricParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape))


def pdf(params: ThinDielectricParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape)[:-1])


def sample(params: ThinDielectricParams, wi, sample2, sample1=None):
    r = _r_total(params, wi)
    u = sample2[..., 0] if sample1 is None else sample1
    pick_reflect = u < r

    wo = jnp.where(pick_reflect[..., None], m.reflect(wi), -wi)
    weight = jnp.where(
        pick_reflect[..., None],
        params.specular_reflectance,
        params.specular_transmittance,
    )
    p = jnp.where(pick_reflect, r, 1.0 - r)
    active = jnp.abs(m.cos_theta(wi)) > 0.0
    return (
        wo,
        jnp.where(active, p, 0.0),
        jnp.where(active[..., None], weight, 0.0),
        jnp.ones_like(active),
    )

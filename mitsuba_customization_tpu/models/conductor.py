"""Smooth (perfectly specular) conductor — mitsuba3 src/bsdfs/conductor.cpp
(SURVEY.md §2.4, starred). A delta BSDF: eval/pdf are zero, sample returns
the mirror direction with weight = F * tint.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.models.fresnel import fresnel_conductor


class ConductorParams(NamedTuple):
    eta: jnp.ndarray  # (..., 3)
    k: jnp.ndarray  # (..., 3)
    specular_reflectance: jnp.ndarray  # (..., 3)


def eval(params: ConductorParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape))


def pdf(params: ConductorParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape)[:-1])


def sample(params: ConductorParams, wi, sample2, sample1=None):
    """Returns (wo, pdf, weight, sampled_delta=True)."""
    wo = m.reflect(wi)
    active = m.cos_theta(wi) > 0.0
    f = fresnel_conductor(m.cos_theta(wi), params.eta, params.k)
    weight = params.specular_reflectance * f
    # Delta lobe: report pdf = 1 for the discrete event (the integrator
    # must not MIS-weight delta bounces).
    p = jnp.where(active, 1.0, 0.0)
    return wo, p, jnp.where(active[..., None], weight, 0.0), jnp.ones_like(active)

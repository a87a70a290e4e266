"""Smooth dielectric (glass) — mitsuba3 src/bsdfs/dielectric.cpp
(SURVEY.md §2.4). Two-sided delta BSDF: reflects with probability F,
refracts with 1-F (radiance transport carries the 1/eta^2 scale).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.models.fresnel import fresnel_dielectric


class DielectricParams(NamedTuple):
    eta: jnp.ndarray  # (...) relative IOR int/ext
    specular_reflectance: jnp.ndarray  # (..., 3)
    specular_transmittance: jnp.ndarray  # (..., 3)


def eval(params: DielectricParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape))


def pdf(params: DielectricParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape)[:-1])


def sample(params: DielectricParams, wi, sample2, sample1=None):
    """Chooses reflect/refract from sample1 (or sample2[...,0] if absent)."""
    ci = m.cos_theta(wi)
    f, cos_theta_t, eta_it, eta_ti = fresnel_dielectric(ci, params.eta)
    u = sample2[..., 0] if sample1 is None else sample1
    reflect_sel = u <= f

    wo_r = m.reflect(wi)
    wo_t = m.refract(wi, cos_theta_t, eta_ti)
    wo = jnp.where(reflect_sel[..., None], wo_r, wo_t)

    # Radiance transport: transmitted throughput scales by eta_ti^2.
    w_r = params.specular_reflectance
    w_t = params.specular_transmittance * (eta_ti * eta_ti)[..., None]
    weight = jnp.where(reflect_sel[..., None], w_r, w_t)
    p = jnp.where(reflect_sel, f, 1.0 - f)
    # Event probability cancels against selection probability => weight as is.
    active = jnp.abs(ci) > 0.0
    return (
        wo,
        jnp.where(active, p, 0.0),
        jnp.where(active[..., None], weight, 0.0),
        jnp.ones_like(active),
    )

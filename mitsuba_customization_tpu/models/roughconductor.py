"""Rough conductor (GGX/Beckmann microfacet) BSDF — mitsuba3
src/bsdfs/roughconductor.cpp (SURVEY.md §2.4, starred: BASELINE configs[1]
"analytic GGX roughconductor on matpreview").

f = spec_refl * F(wi.h) * D(h) * G2(wi,wo,h) / (4 cos_i cos_o); sampling
uses visible-normal sampling (Heitz), pdf = Dv(h) / (4 wi.h).
Differentiable w.r.t. alpha (roughness) and reflectance — the GGX half of
the inverse-rendering contract (BASELINE configs[3]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.models import microfacet as mf
from mitsuba_customization_tpu.models.fresnel import fresnel_conductor


class RoughConductorParams(NamedTuple):
    """All-array pytree; the microfacet distribution type (GGX/Beckmann)
    is static and selects the *kernel* (models/bsdf.py), not a leaf."""

    alpha_u: jnp.ndarray  # (...)
    alpha_v: jnp.ndarray  # (...)
    eta: jnp.ndarray  # (..., 3) real part of IOR
    k: jnp.ndarray  # (..., 3) imaginary part
    specular_reflectance: jnp.ndarray  # (..., 3) tint


def _clamped_alpha(params):
    return (
        jnp.maximum(params.alpha_u, 1e-4),
        jnp.maximum(params.alpha_v, 1e-4),
    )


def eval(params: RoughConductorParams, wi, wo, dist_type=mf.GGX):
    au, av = _clamped_alpha(params)
    ci, co = m.cos_theta(wi), m.cos_theta(wo)
    active = jnp.logical_and(ci > 0.0, co > 0.0)
    h = m.normalize(wi + wo)
    d = mf.eval_ndf(dist_type, au, av, h)
    g = mf.g2_separable(dist_type, au, av, wi, wo, h)
    f = fresnel_conductor(m.dot(wi, h), params.eta, params.k)
    # eval includes cos_o: D F G / (4 cos_i)
    val = params.specular_reflectance * f * m.safe_div(d * g, 4.0 * ci)[..., None]
    return jnp.where(active[..., None], val, 0.0)


def pdf(params: RoughConductorParams, wi, wo, dist_type=mf.GGX):
    au, av = _clamped_alpha(params)
    active = jnp.logical_and(m.cos_theta(wi) > 0.0, m.cos_theta(wo) > 0.0)
    h = m.normalize(wi + wo)
    dv = mf.pdf_micronormal(dist_type, au, av, wi, h)
    p = m.safe_div(dv, 4.0 * jnp.abs(m.dot(wo, h)))
    return jnp.where(active, p, 0.0)


def sample(params: RoughConductorParams, wi, sample2, sample1=None,
           dist_type=mf.GGX):
    au, av = _clamped_alpha(params)
    h = mf.sample_micronormal(dist_type, au, av, wi, sample2)
    wo = 2.0 * m.dot_keep(wi, h) * h - wi
    p = pdf(params, wi, wo, dist_type)
    active = jnp.logical_and(m.cos_theta(wi) > 0.0, m.cos_theta(wo) > 0.0)
    # weight = f*cos_o/pdf (for GGX-VNDF this reduces to the classic
    # spec * F * G2 / G1(wi) identity; computed generically here so the
    # Beckmann full-NDF strategy shares the code path)
    f_cos = eval(params, wi, wo, dist_type)
    weight = m.safe_div(f_cos, p[..., None])
    ok = jnp.logical_and(active, p > 0.0)
    return (
        wo,
        jnp.where(ok, p, 0.0),
        jnp.where(ok[..., None], weight, 0.0),
        jnp.zeros_like(ok),
    )

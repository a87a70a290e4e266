"""Phase-function kernels: isotropic, Henyey-Greenstein, Rayleigh.

TPU-native counterpart of the reference's phase-function plugins
(mitsuba3 src/phase/{isotropic,hg,rayleigh}.cpp, SURVEY.md §2.4
"Media / Phase / Volumes"; mitsuba 0.6 src/phase/). Like the BSDF layer
(models/bsdf.py) there are no virtual calls: each phase function is a pure
kernel over lane batches, dispatched by a static id in the medium table
(render/medium.py).

Conventions (mitsuba3 PhaseFunction): directions point *away* from the
interaction; `wi` toward the incoming ray origin, `wo` the new direction.
All phase functions here are normalized densities over the sphere, so
pdf == eval and the sample weight is identically 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m
from mitsuba_customization_tpu.core import warp

ISOTROPIC = 0
HG = 1
RAYLEIGH = 2

INV_FOURPI = 1.0 / (4.0 * jnp.pi)


# --------------------------------------------------------------------------
# Isotropic (mitsuba3 src/phase/isotropic.cpp)
# --------------------------------------------------------------------------


def iso_eval(wi, wo):
    return jnp.full(wo.shape[:-1], INV_FOURPI, dtype=wo.dtype)


def iso_sample(wi, sample2):
    wo = warp.square_to_uniform_sphere(sample2)
    pdf = jnp.full(wo.shape[:-1], INV_FOURPI, dtype=wo.dtype)
    return wo, pdf


# --------------------------------------------------------------------------
# Henyey-Greenstein (mitsuba3 src/phase/hg.cpp)
# --------------------------------------------------------------------------


def hg_eval(g, wi, wo):
    """HG density at cos_theta = dot(wi, wo) (forward scattering for g>0).

    Mitsuba's convention evaluates at -dot(wi, wo) because both directions
    point away from the interaction; with g>0 the lobe then peaks when wo
    continues in the propagation direction (wo = -wi).
    """
    cos_t = -m.dot(wi, wo)
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_t
    return INV_FOURPI * (1.0 - g2) / jnp.maximum(
        denom * m.safe_sqrt(denom), 1e-12
    )


def hg_sample(g, wi, sample2):
    """Exact HG inverse-CDF sampling (sqr term per the standard formula)."""
    u1 = sample2[..., 0]
    u2 = sample2[..., 1]
    g_safe = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u1)
    cos_theta = jnp.where(
        jnp.abs(g) < 1e-4,
        1.0 - 2.0 * u1,  # isotropic limit
        (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe),
    )
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * u2
    # Local frame around the propagation direction -wi.
    fwd = -wi
    s, t = m.coordinate_system(fwd)
    wo = (
        (sin_theta * jnp.cos(phi))[..., None] * s
        + (sin_theta * jnp.sin(phi))[..., None] * t
        + cos_theta[..., None] * fwd
    )
    wo = m.normalize(wo)
    return wo, hg_eval(g, wi, wo)


# --------------------------------------------------------------------------
# Rayleigh (mitsuba3 src/phase/rayleigh.cpp)
# --------------------------------------------------------------------------


def rayleigh_eval(wi, wo):
    """(3/16pi)(1 + cos^2 theta) — symmetric, so the sign of cos is moot."""
    cos_t = m.dot(wi, wo)
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)


def rayleigh_sample(wi, sample2):
    """Exact inversion via the depressed-cubic (Cardano) closed form
    (same construction as mitsuba3 rayleigh.cpp)."""
    u1 = sample2[..., 0]
    u2 = sample2[..., 1]
    z = 2.0 * (2.0 * u1 - 1.0)
    tmp = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    cos_theta = jnp.clip(tmp - 1.0 / tmp, -1.0, 1.0)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * u2
    fwd = -wi
    s, t = m.coordinate_system(fwd)
    wo = (
        (sin_theta * jnp.cos(phi))[..., None] * s
        + (sin_theta * jnp.sin(phi))[..., None] * t
        + cos_theta[..., None] * fwd
    )
    wo = m.normalize(wo)
    return wo, rayleigh_eval(wi, wo)


# --------------------------------------------------------------------------
# Static dispatch over (phase_type, g) lanes — medium.py calls these.
# --------------------------------------------------------------------------


def eval(phase_type, g, wi, wo):
    """Per-lane phase density (== pdf)."""
    out = iso_eval(wi, wo)
    out = jnp.where(phase_type == HG, hg_eval(g, wi, wo), out)
    out = jnp.where(phase_type == RAYLEIGH, rayleigh_eval(wi, wo), out)
    return out


def sample(phase_type, g, wi, sample2):
    """Per-lane phase sampling -> (wo, pdf). Weight is 1 (normalized)."""
    wo_i, pdf_i = iso_sample(wi, sample2)
    wo_h, pdf_h = hg_sample(g, wi, sample2)
    wo_r, pdf_r = rayleigh_sample(wi, sample2)
    is_hg = (phase_type == HG)[..., None]
    is_ray = (phase_type == RAYLEIGH)[..., None]
    wo = jnp.where(is_hg, wo_h, jnp.where(is_ray, wo_r, wo_i))
    pdf = jnp.where(
        phase_type == HG, pdf_h, jnp.where(phase_type == RAYLEIGH, pdf_r, pdf_i)
    )
    return wo, pdf

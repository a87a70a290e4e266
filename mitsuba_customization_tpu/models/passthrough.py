"""Delta pass-through lobe: wo = -wi with unit weight.

Backs the transparent component of the `mask` BSDF (mitsuba3
src/bsdfs/mask.cpp, SURVEY.md §2.4): a masked surface transmits straight
through with probability 1 - opacity. Also usable standalone as an
explicit transparent material in the surface path tracer (unlike `null`,
which only the volumetric integrator interprets as a medium boundary).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitsuba_customization_tpu.core import math as m


class PassthroughParams(NamedTuple):
    transmittance: jnp.ndarray  # (..., 3)


def eval(params: PassthroughParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape))


def pdf(params: PassthroughParams, wi, wo):
    return jnp.zeros(jnp.broadcast_shapes(wi.shape, wo.shape)[:-1])


def sample(params: PassthroughParams, wi, sample2, sample1=None):
    active = jnp.abs(m.cos_theta(wi)) > 0.0
    return (
        -wi,
        jnp.where(active, 1.0, 0.0),
        jnp.where(active[..., None], params.transmittance, 0.0),
        jnp.ones_like(active),
    )

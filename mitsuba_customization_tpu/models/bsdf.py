"""Static BSDF dispatch table — the TPU replacement for Dr.Jit vcalls.

The reference dispatches BSDF::eval/sample/pdf through Dr.Jit vcalls over
instance arrays (SURVEY.md §2.2 "vcalls"); BASELINE.json north_star pins the
TPU design: "Dr.Jit vcall -> static Pallas kernel table". This module is
that table: a fixed enum of BSDF kernels, per-lane material ids, and
masked run-all dispatch (few kernel types => evaluating every present
kernel under a lane mask beats lax.switch's serialization on TPU,
SURVEY.md §7.1).

Scene construction (render/scene.py) compiles material declarations into a
`BSDFTable`:
  * `mat_type[M]`, `mat_slot[M]` — per material instance, its kernel id and
    index into that kernel's parameter stack;
  * parameter stacks per kernel present in the scene (a dict pytree — keys
    static under jit);
  * tabulated BRDFs share one stacked (n_mat, n_th, n_td, n_pd, 3) tensor
    per resolution so lanes gather (slot, i, j, k) from HBM.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_customization_tpu.models import (
    conductor,
    dielectric,
    diffuse,
    plastic,
    roughconductor,
    roughplastic,
    tabulated,
    textured_diffuse,
)

# Kernel enum — stable ids (cited in render/integrator.py dispatch).
DIFFUSE = 0
CONDUCTOR = 1
ROUGHCONDUCTOR = 2
DIELECTRIC = 3
TABULATED = 4  # MERL + customized_measurement (shared kernel)
NULL = 5  # pass-through (mitsuba3 src/bsdfs/null.cpp)
ROUGHCONDUCTOR_BECKMANN = 6  # same params, Beckmann NDF (static choice)
PLASTIC = 7
ROUGHPLASTIC = 8
TEXTURED_DIFFUSE = 9  # diffuse with bitmap/checkerboard reflectance

KERNEL_NAMES = {
    DIFFUSE: "diffuse",
    CONDUCTOR: "conductor",
    ROUGHCONDUCTOR: "roughconductor",
    DIELECTRIC: "dielectric",
    TABULATED: "tabulated",
    NULL: "null",
    ROUGHCONDUCTOR_BECKMANN: "roughconductor_beckmann",
    PLASTIC: "plastic",
    ROUGHPLASTIC: "roughplastic",
    TEXTURED_DIFFUSE: "textured_diffuse",
}


class _BeckmannKernel:
    """roughconductor with the Beckmann NDF (static kernel variant)."""

    @staticmethod
    def eval(params, wi, wo):
        from mitsuba_customization_tpu.models import microfacet as mf

        return roughconductor.eval(params, wi, wo, dist_type=mf.BECKMANN)

    @staticmethod
    def pdf(params, wi, wo):
        from mitsuba_customization_tpu.models import microfacet as mf

        return roughconductor.pdf(params, wi, wo, dist_type=mf.BECKMANN)

    @staticmethod
    def sample(params, wi, sample2, sample1=None):
        from mitsuba_customization_tpu.models import microfacet as mf

        return roughconductor.sample(
            params, wi, sample2, sample1, dist_type=mf.BECKMANN
        )


_MODULES = {
    DIFFUSE: diffuse,
    CONDUCTOR: conductor,
    ROUGHCONDUCTOR: roughconductor,
    DIELECTRIC: dielectric,
    TABULATED: tabulated,
    ROUGHCONDUCTOR_BECKMANN: _BeckmannKernel,
    PLASTIC: plastic,
    ROUGHPLASTIC: roughplastic,
    TEXTURED_DIFFUSE: textured_diffuse,
}

# Kernels whose sample() is a Dirac delta (NEE skips them; no MIS weight).
DELTA_KERNELS = frozenset([CONDUCTOR, DIELECTRIC, NULL])
# Kernels that can transmit (two-sided transport).
TRANSMISSIVE_KERNELS = frozenset([DIELECTRIC, NULL])


class BSDFTable(NamedTuple):
    """All materials of a scene, compiled for masked static dispatch."""

    mat_type: jnp.ndarray  # (M,) int32 kernel ids
    mat_slot: jnp.ndarray  # (M,) int32 index into the kernel's stack
    stacks: Dict[int, Any]  # kernel id -> stacked params pytree

    @property
    def present_kernels(self):
        return sorted(self.stacks.keys())

    def is_delta(self, mat_id):
        """Per-lane: does this material sample a delta lobe?"""
        t = self.mat_type[mat_id]
        out = jnp.zeros(t.shape, dtype=bool)
        for k in DELTA_KERNELS:
            out = jnp.logical_or(out, t == k)
        return out


def _gather_params(stack, slot):
    """Gather per-lane parameters from a stacked pytree (small params only)."""
    return jax.tree_util.tree_map(lambda a: a[slot], stack)


def _dispatch(table: BSDFTable, mat_id, fn_name, wi, *args, uv=None,
              **kwargs):
    """Masked run-all dispatch over the kernels present in the scene."""
    t = table.mat_type[mat_id]
    slot = table.mat_slot[mat_id]
    out = None
    for kid in table.present_kernels:
        if kid == NULL:
            continue
        mod = _MODULES[kid]
        mask = t == kid
        slot_safe = jnp.where(mask, slot, 0)
        if getattr(mod, "NEEDS_SLOT", kid == TABULATED):
            # Big stacked tensors (MERL tables, texture atlases): slot-aware
            # gather inside the kernel, never materialized per lane.
            extra = dict(kwargs)
            if getattr(mod, "NEEDS_UV", False):
                extra["uv"] = uv
            res = getattr(mod, fn_name)(
                table.stacks[kid], wi, *args, slot=slot_safe, **extra
            )
        else:
            params = _gather_params(table.stacks[kid], slot_safe)
            res = getattr(mod, fn_name)(params, wi, *args, **kwargs)
        if out is None:
            out = jax.tree_util.tree_map(jnp.zeros_like, res)
        out = jax.tree_util.tree_map(
            lambda o, r: jnp.where(
                mask.reshape(mask.shape + (1,) * (o.ndim - mask.ndim)), r, o
            ),
            out,
            res,
        )
    if out is None:  # scene with only null materials (media boundaries)
        shape = wi.shape[:-1]
        if fn_name == "eval":
            return jnp.zeros(shape + (3,))
        if fn_name == "pdf":
            return jnp.zeros(shape)
        if fn_name == "sample":
            return (
                jnp.zeros_like(wi),
                jnp.zeros(shape),
                jnp.zeros(shape + (3,)),
                jnp.zeros(shape, bool),
            )
        raise ValueError(f"unknown BSDF dispatch '{fn_name}'")
    return out


def eval(table: BSDFTable, mat_id, wi, wo, uv=None):
    """f(wi, wo) * cos(theta_o) for each lane's material."""
    return _dispatch(table, mat_id, "eval", wi, wo, uv=uv)


def pdf(table: BSDFTable, mat_id, wi, wo, uv=None):
    return _dispatch(table, mat_id, "pdf", wi, wo, uv=uv)


def sample(table: BSDFTable, mat_id, wi, sample2, sample1=None, uv=None):
    """Per-lane BSDF sampling -> (wo, pdf, weight, sampled_delta).

    sampled_delta is per *sample*, not per material: hybrid BSDFs (plastic)
    emit delta or smooth lobes lane by lane (BSDFSample3f.sampled_type in
    the reference).
    """
    return _dispatch(table, mat_id, "sample", wi, sample2, sample1, uv=uv)


def eval_pdf(table: BSDFTable, mat_id, wi, wo, uv=None):
    """Fused eval+pdf (BSDF::eval_pdf) — one dispatch pass for NEE."""
    f = eval(table, mat_id, wi, wo, uv=uv)
    p = pdf(table, mat_id, wi, wo, uv=uv)
    return f, p

"""Textures: bitmap (bilinear, wrap) + procedural checkerboard.

TPU-native counterpart of mitsuba3 src/textures/{bitmap,checkerboard}.cpp
(SURVEY.md §2.4 "Textures"). All bitmap textures of a scene stack into one
(T, H, W, 3) tensor (zero-padded to the max resolution, actual dims kept
per slot) gathered per lane at eval time — the same stacked-tensor pattern
as the MERL tables (models/tabulated.py), so lanes with different textures
stay in lock-step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# texture types
CONSTANT = 0
BITMAP = 1
CHECKERBOARD = 2


class TextureStack(NamedTuple):
    """Per-material texture bindings + the shared bitmap stack.

    tex_type: (M,) int32; value0/value1: (M, 3) (constant color / checker
    colors); uv_scale: (M, 2); slot: (M,) int32 into images; images:
    (T, H, W, 3); dims: (T, 2) int32 actual (H, W) per slot.
    """

    tex_type: jnp.ndarray
    value0: jnp.ndarray
    value1: jnp.ndarray
    uv_scale: jnp.ndarray
    slot: jnp.ndarray
    images: jnp.ndarray
    dims: jnp.ndarray


def build_stack(rows):
    """rows: list of dicts {type, value0, value1, uv_scale, image|None}."""
    m_count = len(rows)
    tex_type = np.zeros(m_count, np.int32)
    value0 = np.zeros((m_count, 3), np.float32)
    value1 = np.zeros((m_count, 3), np.float32)
    uv_scale = np.ones((m_count, 2), np.float32)
    slot = np.zeros(m_count, np.int32)
    images = []
    max_h = max_w = 1
    for i, row in enumerate(rows):
        tex_type[i] = row["type"]
        value0[i] = row.get("value0", (1, 1, 1))
        value1[i] = row.get("value1", (0, 0, 0))
        uv_scale[i] = row.get("uv_scale", (1, 1))
        img = row.get("image")
        if img is not None:
            slot[i] = len(images)
            img = np.asarray(img, np.float32)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            images.append(img[..., :3])
            max_h = max(max_h, img.shape[0])
            max_w = max(max_w, img.shape[1])
    if not images:
        images = [np.zeros((1, 1, 3), np.float32)]
    dims = np.asarray([im.shape[:2] for im in images], np.int32)
    padded = np.zeros((len(images), max_h, max_w, 3), np.float32)
    for t, im in enumerate(images):
        padded[t, : im.shape[0], : im.shape[1]] = im
    return TextureStack(
        tex_type=jnp.asarray(tex_type),
        value0=jnp.asarray(value0),
        value1=jnp.asarray(value1),
        uv_scale=jnp.asarray(uv_scale),
        slot=jnp.asarray(slot),
        images=jnp.asarray(padded),
        dims=jnp.asarray(dims),
    )


def _bitmap_eval(stack: TextureStack, mat_slot, uv):
    """Bilinear, wrap addressing, v flipped (image row 0 = top, uv v=0 =
    bottom — mitsuba3 bitmap.cpp convention)."""
    s = stack.slot[mat_slot]
    hw = stack.dims[s]  # (..., 2)
    h = hw[..., 0].astype(jnp.float32)
    w = hw[..., 1].astype(jnp.float32)
    u = uv[..., 0] * stack.uv_scale[mat_slot, 0]
    v = uv[..., 1] * stack.uv_scale[mat_slot, 1]
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    fx = u * w - 0.5
    fy = (1.0 - v) * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    hi = hw[..., 0]
    wi_ = hw[..., 1]

    def wrap(i, n):
        return jnp.mod(i, jnp.maximum(n, 1))

    def at(yi, xi):
        return stack.images[s, wrap(yi, hi), wrap(xi, wi_)]

    c00 = at(y0, x0)
    c01 = at(y0, x0 + 1)
    c10 = at(y0 + 1, x0)
    c11 = at(y0 + 1, x0 + 1)
    tx3 = tx[..., None]
    ty3 = ty[..., None]
    return (
        (1 - ty3) * ((1 - tx3) * c00 + tx3 * c01)
        + ty3 * ((1 - tx3) * c10 + tx3 * c11)
    )


def _checker_eval(stack: TextureStack, mat_slot, uv):
    su = uv[..., 0] * stack.uv_scale[mat_slot, 0] * 2.0
    sv = uv[..., 1] * stack.uv_scale[mat_slot, 1] * 2.0
    cell = (jnp.floor(su).astype(jnp.int32) + jnp.floor(sv).astype(jnp.int32))
    odd = (cell % 2) != 0
    return jnp.where(
        odd[..., None], stack.value1[mat_slot], stack.value0[mat_slot]
    )


def eval(stack: TextureStack, mat_slot, uv):
    """Per-lane RGB texture value at uv for each lane's texture binding."""
    t = stack.tex_type[mat_slot]
    out = stack.value0[mat_slot]
    out = jnp.where(
        (t == BITMAP)[..., None], _bitmap_eval(stack, mat_slot, uv), out
    )
    out = jnp.where(
        (t == CHECKERBOARD)[..., None], _checker_eval(stack, mat_slot, uv), out
    )
    return out

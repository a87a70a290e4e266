"""MXU one-hot row fetch: the fast 'gather' for small tables on TPU.

Measured on TPU v5e (scripts/bench_gather.py): XLA's native gather is
latency-bound and serial (~2.4 ns/row from sub-MB tables, ~45 ns/row from
HBM-resident ones — 5-100 ms for a 2M-lane wavefront), while a one-hot
matmul contraction `one_hot(idx, R) @ table` runs on the MXU at
~0.2 ms for (2M, 32) @ (32, 64). This module is the row-fetch primitive
the sampling-CDF paths (models/tabulated.py, core/distr.py) build on.

Counterpart in the reference: Dr.Jit `dr::gather` over CDF tables inside
the Marginal2D sampler ([S3] mitsuba3/include/mitsuba/core/distr_2d.h);
the TPU-native replacement follows SURVEY.md §7.1's "few types => run-all
mask / matmul beats per-lane indirection" design rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Above this one-hot width the matmul cost (R * C * 2 flops/lane) stops
# winning against XLA's serial gather (measured crossover ~4-5k rows for
# 64-wide rows at 2M lanes — scripts/bench_sorted.py); callers should
# restructure (sort, smaller tables) rather than widen further.
MAX_ONEHOT_WIDTH = 4096


def fetch_rows(table, idx, dtype=jnp.float32):
    """table (R, C), idx (...,) int -> (..., C) rows via MXU one-hot.

    Exact for f32 tables contracted in f32 (the one-hot is exact 0/1, so
    each output element is a plain sum of selected entries).
    """
    r = table.shape[0]
    oh = jax.nn.one_hot(idx, r, dtype=dtype)
    return jax.lax.dot_general(
        oh,
        table.astype(dtype),
        (((oh.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def take_rows(arr, idx):
    """Per-lane row gather from a SMALL leading-axis table, MXU-fast.

    arr (P, ...) with small P -> (..., *arr.shape[1:]) rows at idx. XLA's
    native per-lane gather runs ~3.8 ms per 2M lanes even from a 5-row
    table (round-3 on-chip trace, geometry interaction fetch); the one-hot
    contraction is ~20x faster. Exact for f32 and for ints < 2^24 (the
    one-hot sum selects a single row). Falls back to the native gather
    for wide tables.
    """
    p = arr.shape[0]
    if p > MAX_ONEHOT_WIDTH:
        return arr[idx]
    flat = arr.reshape(p, -1)
    out = fetch_rows(flat.astype(jnp.float32), idx)
    out = out.reshape(idx.shape + arr.shape[1:])
    if arr.dtype == jnp.float32:
        return out
    if arr.dtype == jnp.bool_:
        return out > 0.5
    return out.astype(arr.dtype)


def gather_tree(tree, idx):
    """take_rows over every leaf of a pytree with ONE fused contraction.

    All leaves must share the leading axis P. Leaves are flattened to
    (P, Ci) f32 blocks, concatenated, fetched with a single one-hot
    matmul, and split back — one (lanes, P) one-hot instead of one per
    leaf. Integer/bool leaves roundtrip exactly (values < 2^24).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    p = leaves[0].shape[0]
    if p > MAX_ONEHOT_WIDTH:
        return jax.tree_util.tree_map(lambda a: a[idx], tree)
    cols = [int(np.prod(a.shape[1:])) if a.ndim > 1 else 1 for a in leaves]
    flat = jnp.concatenate(
        [a.reshape(p, -1).astype(jnp.float32) for a in leaves], axis=-1
    )
    rows = fetch_rows(flat, idx)  # (..., sum C)
    out = []
    off = 0
    for a, c in zip(leaves, cols):
        piece = rows[..., off:off + c].reshape(idx.shape + a.shape[1:])
        off += c
        if a.dtype == jnp.bool_:
            piece = piece > 0.5
        elif a.dtype != jnp.float32:
            piece = piece.astype(a.dtype)
        out.append(piece)
    return jax.tree_util.tree_unflatten(treedef, out)


def fetch_rows_3d(table, idx0, idx1, dtype=jnp.float32):
    """table (A, B, C), per-lane (idx0, idx1) -> (..., C) rows.

    Flattens the leading two axes into one one-hot of width A*B.
    """
    a, b, c = table.shape
    flat = table.reshape(a * b, c)
    return fetch_rows(flat, idx0 * b + idx1, dtype=dtype)

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


def fetch_rows_3d(table, idx0, idx1, dtype=jnp.float32):
    """table (A, B, C), per-lane (idx0, idx1) -> (..., C) rows.

    Flattens the leading two axes into one one-hot of width A*B.
    """
    a, b, c = table.shape
    flat = table.reshape(a * b, c)
    return fetch_rows(flat, idx0 * b + idx1, dtype=dtype)

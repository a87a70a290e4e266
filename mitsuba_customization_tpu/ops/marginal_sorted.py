"""Sorted-segment Pallas kernel for Marginal2D conditional-CDF work.

The MERL luminance importance sampler (models/tabulated.py) needs, per
lane and per bounce, one row of the conditional CDF stack
(slot, theta_i bin, marginal row) three times over:

  * invert it at u_col        -> the sampled phi_h column + its cell mass
  * difference it at the NEE  -> tabulated pdf toward the light (MIS)
  * difference it at the cos  -> tabulated pdf of the defensive cosine lobe

The reference fetches such rows with per-lane Dr.Jit gathers
([S3] mitsuba3/include/mitsuba/core/distr_2d.h Marginal2D::sample/eval).
On TPU both per-lane row gathers (~13 ms / 2M lanes) and the round-2
one-hot MXU fetch (materializes a (lanes, n_slices*H) one-hot — gigabytes
of HBM traffic per fetch) are bandwidth disasters. This kernel follows the
ops/merl_sorted.py recipe instead:

  1. Per lane, compute the (slot, theta_i bin) slice key and the three
     (row, col) cell coordinates on the VPU; pack the cells into one i32.
  2. Sort lanes by slice key (<= n_mat * N_THETA_I distinct values).
  3. A Pallas kernel walks the sorted wavefront tile by tile, DMAs each
     distinct slice's transposed conditional-CDF block (W x H, H on the
     128-lane axis) into VMEM once, and resolves all three row accesses
     with per-lane lane-axis gathers while sweeping the W columns once.
  4. Un-sort by carried lane id.

All three outputs are *sampling* quantities - the integrator consumes
them behind stop_gradient (detached-estimator contract, SURVEY.md §3.2),
so the kernel needs no VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = 0x7FFFFFFF
LANE = 128

def _sds_vma(shape, dtype, ref):
    """ShapeDtypeStruct carrying the varying-mesh-axes of `ref` (required
    by shard_map's check_vma for Pallas outputs; no-op outside meshes)."""
    try:
        vma = jax.typeof(ref).vma
    except AttributeError:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)

TILE_ROWS = 16
TILE = TILE_ROWS * LANE
_BIG = 3e38
_TINY = 1e-20


def _round_up(x, m):
    return (x + m - 1) // m * m


def pack_condT(cdf_cond):
    """(..., H, W) conditional-CDF stack -> (n_slices, W, 128) transposed.

    n_slices = prod of leading axes (material x theta_i bin). The marginal
    row axis H moves onto the 128-lane axis (zero... BIG-padded past H so a
    clipped row index never reads garbage below u), so the kernel picks
    per-lane rows with jnp.take_along_axis along lanes.
    """
    h, w = cdf_cond.shape[-2], cdf_cond.shape[-1]
    if h > LANE:
        raise ValueError(f"marginal row count {h} exceeds one lane bank")
    flat = cdf_cond.reshape(-1, h, w)
    ct = jnp.swapaxes(flat, -1, -2)  # (n_slices, W, H)
    return jnp.pad(ct, ((0, 0), (0, 0), (0, LANE - h)),
                   constant_values=2.0)


def _pack_cells(r_own, r_nee, c_nee, r_cos, c_cos, h, w):
    """Five small ints -> one i32 (mixed radix; h*h*w*h*w must fit 2^31)."""
    assert h * h * w * h * w < 2 ** 31
    p = r_own
    p = p * h + r_nee
    p = p * w + c_nee
    p = p * h + r_cos
    p = p * w + c_cos
    return p.astype(jnp.int32)


def _cond_kernel(n_h, n_w, key_ref, ucol_ref, cells_ref, condT_ref,
                 x_ref, mo_ref, mn_ref, mc_ref, slab, cache_ref, sem):
    """Per-tile segment walk (module docstring step 3).

    n_h is the TRUE marginal row count (<= LANE; the slab's lane axis is
    padded past it), n_w the column count — both static.
    """
    keys = key_ref[:]  # (TILE_ROWS, LANE) int32 sorted ascending
    u = ucol_ref[:]
    cells = cells_ref[:]
    c_cos = cells % n_w
    cells = cells // n_w
    r_cos = cells % n_h
    cells = cells // n_h
    c_nee = cells % n_w
    cells = cells // n_w
    r_nee = cells % n_h
    r_own = cells // n_h

    zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)

    def pick(row_b, r):
        """row_b (TILE_ROWS, LANE) broadcast block gathered at per-lane r."""
        return jnp.take_along_axis(row_b, r, axis=1)

    n_slices = condT_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cache_ref[0] = -1  # no slice resident at kernel start

    def seg_body(state):
        cur, accs = state

        # Persistent slice cache: the slab survives across sequential grid
        # steps, so the DMA count is the number of distinct slices the
        # whole sorted wavefront touches (<= n_mat * N_THETA_I), not the
        # per-tile segment count.
        @pl.when(cur != cache_ref[0])
        def _():
            copy = pltpu.make_async_copy(
                condT_ref.at[jnp.clip(cur, 0, n_slices - 1)], slab, sem
            )
            copy.start()
            copy.wait()
            cache_ref[0] = cur

        m = keys == cur

        def col_body(w_i, carry):
            cnt, lo, hi, last, nhi, nlo, chi, clo = carry
            row = slab[pl.ds(w_i, 1), :]  # (1, LANE)
            row_b = jnp.broadcast_to(row, (TILE_ROWS, LANE))
            v_own = pick(row_b, r_own)
            v_nee = pick(row_b, r_nee)
            v_cos = pick(row_b, r_cos)
            below = v_own < u
            cnt = cnt + below.astype(jnp.int32)
            lo = jnp.where(below, v_own, lo)
            hi = jnp.minimum(hi, jnp.where(below, _BIG, v_own))
            last = jnp.where(w_i == n_w - 1, v_own, last)
            nhi = jnp.where(w_i == c_nee, v_nee, nhi)
            nlo = jnp.where(w_i == c_nee - 1, v_nee, nlo)
            chi_ = jnp.where(w_i == c_cos, v_cos, chi)
            clo = jnp.where(w_i == c_cos - 1, v_cos, clo)
            return cnt, lo, hi, last, nhi, nlo, chi_, clo

        cnt, lo, hi, last, nhi, nlo, chi, clo = jax.lax.fori_loop(
            0, n_w, col_body,
            (jnp.zeros((TILE_ROWS, LANE), jnp.int32), zero,
             jnp.full((TILE_ROWS, LANE), _BIG, jnp.float32), zero,
             zero, zero, zero, zero),
        )
        col = jnp.clip(cnt, 0, n_w - 1)
        hi = jnp.where(hi >= _BIG, last, hi)
        lo = jnp.minimum(lo, hi)
        mass = hi - lo
        dx = jnp.clip((u - lo) / jnp.maximum(mass, _TINY), 0.0, 1.0 - 1e-7)
        x = (col.astype(jnp.float32) + dx) * (1.0 / n_w)

        ax, amo, amn, amc = accs
        accs = (
            jnp.where(m, x, ax),
            jnp.where(m, mass, amo),
            jnp.where(m, nhi - nlo, amn),
            jnp.where(m, chi - clo, amc),
        )
        nxt = jnp.min(jnp.where(keys > cur, keys, SENT))
        return nxt, accs

    def cond(state):
        return state[0] != SENT

    # min over the tile, not keys[0,0] (coherent mode feeds unsorted lanes)
    cur0 = jnp.min(keys)
    _, (x, mo, mn, mc) = jax.lax.while_loop(
        cond, seg_body, (cur0, (zero, zero, zero, zero))
    )
    x_ref[:] = x
    mo_ref[:] = mo
    mn_ref[:] = mn
    mc_ref[:] = mc


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _cond_impl(condT, key, ucol, cells, n_h, n_w, interpret):
    npad = key.shape[0]
    shape2 = (npad // LANE, LANE)
    grid = (npad // TILE,)
    kernel = functools.partial(_cond_kernel, n_h, n_w)
    lane_spec = pl.BlockSpec(
        (TILE_ROWS, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    ispec = pl.BlockSpec(
        (TILE_ROWS, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    x, mo, mn, mc = pl.pallas_call(
        kernel,
        out_shape=[_sds_vma(shape2, jnp.float32, key)] * 4,
        grid=grid,
        in_specs=[
            lane_spec,
            lane_spec,
            ispec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[lane_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((condT.shape[1], LANE), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        key.reshape(shape2),
        ucol.reshape(shape2),
        cells.reshape(shape2),
        condT,
    )
    return (x.reshape(-1), mo.reshape(-1), mn.reshape(-1), mc.reshape(-1))


def cond_sample_pdf(condT, n_rows, slice_key, u_col, r_own, r_nee, c_nee,
                    r_cos, c_cos, valid, interpret=False, coherent=False):
    """Per-lane conditional-CDF inversion + two cell masses, sorted order.

    condT:     pack_condT output (n_slices, W, 128).
    n_rows:    true marginal row count H (static; <= 128).
    slice_key: (N,) int32 flat slice index (slot * n_tbin + tbin).
    u_col:     (N,) inversion argument.
    r_own/r_nee/c_nee/r_cos/c_cos: (N,) int32 cell coordinates, pre-clipped
               to [0, H) / [0, W).
    valid:     (N,) bool — invalid lanes cost no slab work, return zeros.

    Returns (x, mass_own, mass_nee, mass_cos), each (N,) f32, where x is
    the sampled column position in [0,1) and the masses are CDF cell
    differences (multiply by the marginal row mass * H * W for the pdf).
    Matches core/distr.Marginal2D.sample / eval_pdf column semantics.
    coherent=True skips sort+unsort (exact; fast only for primary-bounce
    coherence — see ops/merl_sorted.eval_sorted).
    """
    n_h = int(n_rows)
    n_w = condT.shape[1]
    n = slice_key.shape[0]
    key = jnp.where(valid, slice_key.astype(jnp.int32), SENT)
    cells = _pack_cells(
        jnp.clip(r_own, 0, n_h - 1), jnp.clip(r_nee, 0, n_h - 1),
        jnp.clip(c_nee, 0, n_w - 1), jnp.clip(r_cos, 0, n_h - 1),
        jnp.clip(c_cos, 0, n_w - 1), n_h, n_w,
    )
    u_col = jnp.where(valid, u_col, 0.0)

    npad = _round_up(max(n, TILE), TILE)
    pad = npad - n

    from mitsuba_customization_tpu.ops.merl_sorted import (
        _chunked_sort,
        _n_chunks,
        _sorted_operands,
    )

    if coherent:
        sk = jnp.pad(key, (0, pad), constant_values=int(SENT))
        su = jnp.pad(u_col, (0, pad))
        sc = jnp.pad(cells, (0, pad))
        xo, moo, mno, mco = _cond_impl(condT, sk, su, sc, n_h, n_w,
                                       interpret)
    else:
        n_chunks = _n_chunks(npad, tile=TILE)
        sk, (su, sc), sl = _sorted_operands(
            key, [u_col, cells], valid, npad, n_chunks, condT.shape[0]
        )
        x, mo, mn, mc = _cond_impl(condT, sk, su, sc, n_h, n_w, interpret)
        # chunk-local unsort (forward sort permuted only within chunks)
        _, xo, moo, mno, mco = _chunked_sort([sl, x, mo, mn, mc], n_chunks)
    zero = jnp.zeros_like(xo[:n])
    out = tuple(jnp.where(valid, v[:n], zero) for v in (xo, moo, mno, mco))
    return out

"""Exact trilinear MERL/tabulated-BRDF eval via sort + Pallas segment kernel.

The reference evaluates measured BRDFs with 24 per-lane table gathers
([S3] mitsuba3 merl plugin hot path, SURVEY.md §3.3). On TPU v5e a
per-lane gather from the HBM-resident 90x90x180x3 table is latency-bound
and serial (~45 ns/row, ~100 ms per 2M-lane wavefront — measured in
scripts/bench_gather.py), so this op restructures the lookup around the
hardware:

1. Per lane, compute the trilinear cell (theta_h bin i, theta_d bin j,
   slot) and fractions on the VPU.
2. Sort lanes by flattened cell key (slot, i, j) — XLA's bitonic sort is
   fully vectorized (~1 ms/operand for 2M lanes).
3. A Pallas kernel walks the sorted wavefront tile by tile. Each tile
   loops over the distinct cells it contains (>=1 iterations; sorted
   order makes the total number of iterations across all tiles at most
   n_tiles + n_distinct_cells - 1), DMAs the (2, 2, 3, n_pd) table slab
   for that cell from HBM into VMEM, and evaluates the interpolation with
   pure VPU ops: the phi_d axis is resolved with the hardware lane-axis
   dynamic gather (jnp.take_along_axis over 128-wide banks), the
   (i, j) corners with four masked FMAs.
4. Un-sort the results by carried lane id (second bitonic sort).

The result matches models/tabulated.eval_raw to ~3e-5 relative (the only
deviation: fractional weights ride the sort as 16-bit fixed point).

Differentiable w.r.t. the table: custom_vjp whose backward runs the
(slow but rarely-traced) XLA gather formulation's VJP — the scatter-add
into table cells that path-replay gradient accumulation needs
(SURVEY.md §3.2). Forward-only renders never touch it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = 0x7FFFFFFF

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
  # python int: avoids capture as a traced kernel constant
LANE = 128
TILE_ROWS = 16  # lanes per tile = TILE_ROWS * LANE = 2048
TILE = TILE_ROWS * LANE
_F16 = 65535.0

# Sort in independent chunks of this many lanes (dimension=1 batched
# bitonic) instead of one global sort. The isolated sort is 40-50%
# cheaper chunked (round-4 sweep, scripts/profile_sort4.py: 2M 4-operand
# 1-D 6.2 ms vs 3.7 ms at 32x64K chunks) — but chunking multiplies the
# *segment-walk iterations* of the downstream kernel by ~the chunk count
# (each chunk re-spans the whole populated key set, so distinct keys per
# tile scale with n_chunks), and for MERL-sized key spaces the kernel
# loss dwarfs the sort win: end-to-end eval at 2M lanes measured 15.8 ms
# global vs 37/59/99 ms at 8/16/32 chunks (PROFILE_sort_r04.json "C").
# Default therefore DISABLES chunking (threshold above any real
# wavefront); the machinery stays for small-key-space callers and tests.
SORT_CHUNK = 1 << 25


def _chunked_sort(operands, n_chunks):
    """lax.sort along dim 0, batched into n_chunks independent chunks."""
    if n_chunks <= 1:
        return jax.lax.sort(
            operands, dimension=0, num_keys=1, is_stable=False
        )
    n = operands[0].shape[0]
    cl = n // n_chunks
    outs = jax.lax.sort(
        [o.reshape(n_chunks, cl) for o in operands],
        dimension=1, num_keys=1, is_stable=False,
    )
    return [o.reshape(n) for o in outs]


def _round_up(x, m):
    return (x + m - 1) // m * m


def _n_chunks(npad, chunk=None, tile=None):
    """Largest chunk count splitting npad into equal tile-aligned chunks
    of >= SORT_CHUNK lanes (static python arithmetic).

    Chunking only pays off at >= 8 chunks — XLA's batched bitonic lowering
    is SLOWER than the 1-D sort at 2 or 4 batches (round-3 on-chip: 4M
    4-operand 1-D 7.7 ms, (2, 2M) 17.5 ms, (4, 1M) 8.3 ms, (8, 512K)
    3.8 ms) — so arrays too small for >= 8 chunks keep the global sort.
    `tile` is the caller's Pallas tile size (chunks must not split a
    tile); callers with a different TILE must pass theirs."""
    chunk = chunk or SORT_CHUNK
    tile = tile or TILE
    c = max(1, npad // chunk)
    if c < 8:
        return 1
    while c > 1 and (npad % c != 0 or (npad // c) % tile != 0):
        c -= 1
    return c if c >= 8 else 1


def _pack_spec(key_space, npad, n_chunks):
    """Static plan for packing (key, chunk-local lane id) into ONE int32
    sort operand — saves a full operand in the forward sort (round-4
    on-chip sweep: 2M 3-op c32 3.26 ms vs 4-op 3.70 ms).

    Returns (local_bits, sent_key) or None when the bit budget (31) does
    not fit. sent_key is the all-ones key that sorts after every valid
    key (valid keys < key_space <= sent_key)."""
    cl = npad // n_chunks
    local_bits = max(1, (cl - 1).bit_length())
    key_bits = max(1, int(key_space).bit_length())
    if key_bits + local_bits > 31:
        return None
    return local_bits, (1 << key_bits) - 1


def _sorted_operands(key, payloads, valid_or_none, npad, n_chunks,
                     key_space):
    """Pad + sort (key, payloads...) grouping equal keys chunk-locally.

    key: (n,) int32 with SENT already in masked lanes. Returns
    (kernel_keys, sorted_payloads, unsort_key) — kernel_keys carry SENT
    in masked/padded lanes; unsort_key re-orders kernel outputs back to
    lane order via one more chunked sort (chunk-local by construction).
    """
    n = key.shape[0]
    pad = npad - n
    key_p = jnp.pad(key, (0, pad), constant_values=int(SENT))
    pays = [jnp.pad(p, (0, pad)) for p in payloads]
    spec = _pack_spec(key_space, npad, n_chunks)
    if spec is not None:
        local_bits, sent_key = spec
        cl = npad // n_chunks
        local = (jnp.arange(npad, dtype=jnp.int32) % cl)
        kk = jnp.where(key_p == SENT, sent_key, key_p)
        packed = (kk << local_bits) | local
        outs = _chunked_sort([packed] + pays, n_chunks)
        sp = outs[0]
        pure = sp >> local_bits
        kernel_keys = jnp.where(pure == sent_key, SENT, pure)
        unsort_key = sp & ((1 << local_bits) - 1)
        return kernel_keys, outs[1:], unsort_key
    lane_id = jnp.arange(npad, dtype=jnp.int32)
    outs = _chunked_sort([key_p] + pays + [lane_id], n_chunks)
    return outs[0], outs[1:-1], outs[-1]


# HBM slab dtype for the permuted table. bf16 halves the per-pair slab
# DMA (VERDICT r3 item: "bf16 table slabs") at ~3 decimal digits of
# table precision — measured accuracy cost ~1e-3 relative on eval
# (tests/test_ops.py bf16 gate), so it stays opt-in: production keeps
# exact f32 slabs, benchmarks can flip this flag for the ablation.
SLAB_DTYPE = jnp.float32


def pack_perm(table, dtype=None):
    """(..., n_th, n_td, n_pd, 3) -> (..., n_th, n_td, 4, KPAD) slabs.

    Channel-major, phi_d minor and zero-padded to a multiple of 128 so the
    kernel's slab DMA and lane-bank gathers are aligned. Pure transpose —
    rebuilt cheaply from `table` inside jitted update steps. dtype
    defaults to SLAB_DTYPE (see above).
    """
    kpad = _round_up(table.shape[-2], LANE)
    perm = jnp.moveaxis(table, -1, -2)  # (..., n_th, n_td, 3, n_pd)
    pad = [(0, 0)] * (perm.ndim - 2) + [(0, 1), (0, kpad - table.shape[-2])]
    return jnp.pad(perm, pad).astype(dtype or SLAB_DTYPE)


def _segment_kernel(n_th, n_td, n_pd, kpad, key_ref, fpack_ref, updf_ref,
                    table_ref, r_ref, g_ref, b_ref, slab, cache_ref, sem):
    """Per-tile segment walk over a persistent (slot, theta_h-pair) slab.

    The slab caches perm[slot, i:i+2] — BOTH theta_h rows x ALL theta_d
    cells (2, n_td, 4, kpad), ~0.7 MB for MERL — so the DMA count per
    kernel is the number of distinct (slot, i) pairs the sorted wavefront
    touches (<= n_mat * n_th), not distinct trilinear cells (up to
    n_mat * n_th * n_td). theta_d corners resolve with scalar dynamic
    slices per segment; the cache persists across sequential grid steps
    (TPU grids are sequential and scratch survives between tiles), so
    consecutive tiles sharing a pair pay nothing. This is what makes
    chunked sorting (SORT_CHUNK) profitable: chunking multiplies distinct
    segments per tile, which only costs VPU microseconds here, while the
    bitonic sort cost drops superlinearly."""
    keys = key_ref[:]  # (TILE_ROWS, LANE) int32, sorted ascending
    fpack = fpack_ref[:]
    # Mosaic lacks a u32->f32 cast; both halves fit in i32 exactly.
    fth = (fpack >> 16).astype(jnp.int32).astype(jnp.float32) * (1.0 / _F16)
    ftd = (fpack & 0xFFFF).astype(jnp.int32).astype(jnp.float32) * (1.0 / _F16)
    updf = updf_ref[:]
    k0f = jnp.floor(updf)
    fpd = updf - k0f
    k0 = jnp.mod(k0f.astype(jnp.int32), n_pd)
    k1 = jnp.mod(k0 + 1, n_pd)

    w00 = (1.0 - fth) * (1.0 - ftd)
    w01 = (1.0 - fth) * ftd
    w10 = fth * (1.0 - ftd)
    w11 = fth * ftd
    w_ab = ((w00, w01), (w10, w11))

    n_banks = kpad // LANE
    zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)

    def lane_pick(row, kk):
        """row (kpad,) broadcast-gathered at per-lane kk -> (TILE_ROWS, LANE)."""
        out = zero
        for bank in range(n_banks):
            seg = jnp.broadcast_to(
                row[bank * LANE:(bank + 1) * LANE][None, :],
                (TILE_ROWS, LANE),
            )
            off = jnp.clip(kk - bank * LANE, 0, LANE - 1)
            got = jnp.take_along_axis(seg, off, axis=1)
            out = jnp.where((kk // LANE) == bank, got, out)
        return out

    n_mat = table_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cache_ref[0] = -1  # no pair resident at kernel start

    def _decode(cur):
        """key -> clamped (slot, i, j); clamping keeps addresses legal
        for the SENT sentinel (whose DMA is never issued)."""
        slot = jnp.clip(cur // (n_th * n_td), 0, n_mat - 1)
        rem = cur - slot * (n_th * n_td)
        i = jnp.clip(rem // n_td, 0, n_th - 2)
        j = jnp.clip(rem - i * n_td, 0, n_td - 2)
        return slot, i, j

    def body(state):
        cur, accs = state
        slot, i, j = _decode(cur)
        pair = slot * n_th + i

        @pl.when(pair != cache_ref[0])
        def _():
            copy = pltpu.make_async_copy(
                table_ref.at[slot, pl.ds(i, 2)], slab, sem
            )
            copy.start()
            copy.wait()
            cache_ref[0] = pair

        m = keys == cur
        new_accs = []
        for c in range(3):
            val = zero
            for a in (0, 1):
                for b in (0, 1):
                    row = slab[a, jnp.clip(j + b, 0, n_td - 1), c, :].astype(
                        jnp.float32
                    )
                    s = lane_pick(row, k0) * (1.0 - fpd) + lane_pick(
                        row, k1
                    ) * fpd
                    val = val + w_ab[a][b] * s
            new_accs.append(accs[c] + jnp.where(m, val, 0.0))
        nxt = jnp.min(jnp.where(keys > cur, keys, SENT))
        return nxt, tuple(new_accs)

    def cond(state):
        cur, _ = state
        return cur != SENT

    # min over the tile, not keys[0,0]: coherent (unsorted) mode feeds
    # natural-order lanes; the segment walk itself is order-agnostic.
    cur0 = jnp.min(keys)
    _, (ar, ag, ab) = jax.lax.while_loop(
        cond, body, (cur0, (zero, zero, zero))
    )
    r_ref[:] = ar
    g_ref[:] = ag
    b_ref[:] = ab


@functools.partial(jax.jit, static_argnums=(4, 5))
def _eval_sorted_impl(perm, key, fpack, updf, n_pd, interpret):
    """Sorted-order kernel launch. key/fpack/updf are PRE-SORTED, length
    a multiple of TILE. Returns (r, g, b) in sorted order. n_pd is the
    TRUE phi_d resolution (perm's minor axis is zero-padded past it)."""
    n_mat, n_th, n_td, _c4, kpad = perm.shape
    npad = key.shape[0]
    shape2 = (npad // LANE, LANE)
    grid = (npad // TILE,)

    kernel = functools.partial(
        _segment_kernel, n_th, n_td, n_pd, kpad
    )
    lane_spec = pl.BlockSpec(
        (TILE_ROWS, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    r, g, b = pl.pallas_call(
        kernel,
        out_shape=[_sds_vma(shape2, jnp.float32, key)] * 3,
        grid=grid,
        in_specs=[
            lane_spec,
            lane_spec,
            lane_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[lane_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, n_td, 4, kpad), perm.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        key.reshape(shape2),
        fpack.reshape(shape2),
        updf.reshape(shape2),
        perm,
    )
    return r.reshape(-1), g.reshape(-1), b.reshape(-1)


def _coords(table_shape, wi, wo):
    """Cell/fraction computation shared with models/tabulated (VPU)."""
    from mitsuba_customization_tpu.core import math as m
    from mitsuba_customization_tpu.core.rusinkiewicz import (
        dirs_to_half_diff_fast,
    )
    from mitsuba_customization_tpu.models.tabulated import _grid_coords

    n_th, n_td, n_pd = table_shape
    theta_h, theta_d, phi_d = dirs_to_half_diff_fast(wi, wo)
    u_th, u_td, u_pd = _grid_coords(
        (n_th, n_td, n_pd, 3), theta_h, theta_d, phi_d
    )
    i0 = jnp.clip(jnp.floor(u_th).astype(jnp.int32), 0, n_th - 2)
    j0 = jnp.clip(jnp.floor(u_td).astype(jnp.int32), 0, n_td - 2)
    fth = jnp.clip(u_th - i0, 0.0, 1.0)
    ftd = jnp.clip(u_td - j0, 0.0, 1.0)
    above = jnp.logical_and(m.cos_theta(wi) > 0.0, m.cos_theta(wo) > 0.0)
    return i0, j0, fth, ftd, u_pd, above


def eval_sorted(table, wi, wo, slot=None, mask=None, interpret=False,
                perm=None, coherent=False):
    """f(wi, wo) per lane (no cosine), exact trilinear, sorted Pallas path.

    table: (n_th, n_td, n_pd, 3) or stacked (n_mat, ...); slot per-lane
    material index into the stack (None = single). mask: lanes to skip
    (masked lanes return 0 and cost no slab work). perm: optional
    precomputed pack_perm(table) (models/tabulated caches it in params so
    the transpose isn't re-traced per bounce). coherent=True skips the
    sort AND unsort entirely and feeds lanes in natural order — the
    segment walk is order-agnostic (it visits each distinct key a tile
    contains, ascending), so this is exact; it is *fast* only when
    neighboring lanes share trilinear cells, i.e. for primary-bounce
    wavefronts where adjacent lanes are adjacent pixels.
    """
    stacked = table.ndim == 5
    n_th, n_td, n_pd = table.shape[-4], table.shape[-3], table.shape[-2]
    if perm is None:
        perm = pack_perm(table if stacked else table[None])
    elif perm.ndim == 4:
        perm = perm[None]
    n_mat = perm.shape[0]

    i0, j0, fth, ftd, u_pd, above = _coords((n_th, n_td, n_pd), wi, wo)
    valid = above
    if mask is not None:
        valid = valid & mask
    s = slot if (stacked and slot is not None) else jnp.zeros_like(i0)
    key = ((s * n_th + i0) * n_td + j0).astype(jnp.int32)
    key = jnp.where(valid, key, SENT)
    fpack = (
        (jnp.round(fth * _F16).astype(jnp.uint32) << 16)
        | jnp.round(ftd * _F16).astype(jnp.uint32)
    )
    u_pd = jnp.where(valid, u_pd, 0.0)  # NaN-free payload for masked lanes

    n = key.shape[0]
    npad = _round_up(max(n, TILE), TILE)
    pad = npad - n

    if coherent:
        sk = jnp.pad(key, (0, pad), constant_values=int(SENT))
        sf = jnp.pad(fpack, (0, pad))
        su = jnp.pad(u_pd, (0, pad))
        rr, gg, bb = _eval_sorted_impl(perm, sk, sf, su, n_pd, interpret)
    else:
        n_chunks = _n_chunks(npad)
        sk, (sf, su), sl = _sorted_operands(
            key, [fpack, u_pd], valid, npad, n_chunks,
            n_mat * n_th * n_td,
        )
        r, g, b = _eval_sorted_impl(perm, sk, sf, su, n_pd, interpret)
        # chunk-local unsort is exact: the forward sort permutes only
        # within each chunk, so the carried ids re-place outputs locally.
        _, rr, gg, bb = _chunked_sort([sl, r, g, b], n_chunks)
    out = jnp.stack([rr[:n], gg[:n], bb[:n]], axis=-1)
    return jnp.where(valid[..., None], jnp.maximum(out, 0.0), 0.0)


# ---------------------------------------------------------------------------
# Differentiable wrapper (table gradients via the XLA gather VJP)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def eval_trilinear(table, perm, wi, wo, slot, mask, interpret=False,
                   coherent=False):
    """Differentiable-in-table sorted trilinear eval (no cosine term).

    Forward reads only `perm` (= pack_perm(table), cached in the params
    pytree); backward scatter-adds into `table`'s cotangent via the XLA
    gather formulation's VJP. Because perm is derived from table at build
    time and its cotangent here is zero, the chain rule routes the entire
    table gradient through the explicit `table` argument — exactly once.
    """
    return eval_sorted(table, wi, wo, slot=slot, mask=mask,
                       interpret=interpret, perm=perm, coherent=coherent)


def _eval_fwd(table, perm, wi, wo, slot, mask, interpret, coherent):
    out = eval_sorted(table, wi, wo, slot=slot, mask=mask,
                      interpret=interpret, perm=perm, coherent=coherent)
    return out, (table, perm, wi, wo, slot, mask)


def _eval_bwd(interpret, coherent, res, g):
    from mitsuba_customization_tpu.models.tabulated import eval_raw

    table, perm, wi, wo, slot, mask = res
    stacked = table.ndim == 5

    def f(t):
        out = eval_raw(t, wi, wo, slot=slot if stacked else None)
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out

    _, vjp = jax.vjp(f, table)
    (gt,) = vjp(g)
    zeros = lambda x: None if x is None else jnp.zeros_like(x)
    return (gt, jnp.zeros_like(perm), zeros(wi), zeros(wo), zeros(slot),
            zeros(mask))


eval_trilinear.defvjp(_eval_fwd, _eval_bwd)

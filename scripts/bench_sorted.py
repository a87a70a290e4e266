"""On-chip microbench for the round-2 hot-path candidates.

Measures at true wavefront size (2M lanes):
  * lax.sort cost (the sorted-segment eval's fixed overhead)
  * ops/merl_sorted.eval_sorted vs models/tabulated.eval_packed
  * one-hot MXU conditional-CDF row fetch (Marginal2D replacement)

Run on the target device: python -u scripts/bench_sorted.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N = 1 << 21
K1, K2 = 4, 12


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _timed(f, c0, tables, k):
    t0 = time.perf_counter()
    r = f(c0, jnp.int32(k), *tables)
    float(r[:4].sum())
    return time.perf_counter() - t0


def bench(name, step, *tables):
    f = jax.jit(
        lambda c0, k, *ts: jax.lax.fori_loop(
            0, k, lambda i, c: c * 0.5 + step(c, i, *ts), c0
        )
    )
    c0 = jnp.zeros((N,), jnp.float32)
    _timed(f, c0, tables, K1)
    best = np.inf
    for _ in range(2):
        t1 = _timed(f, c0, tables, K1)
        t2 = _timed(f, c0, tables, K2)
        best = min(best, (t2 - t1) / (K2 - K1))
    print(f"{name:44s} {best*1e3:9.3f} ms  {N/best/1e6:10.1f} Mlanes/s")
    return best


def unit_vec(i, c, s):
    v = jnp.stack(
        [
            _hash((c * 1e5).astype(jnp.uint32) + jnp.uint32(i + s)).astype(jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e6).astype(jnp.uint32) + jnp.uint32(i + s + 1)).astype(jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e7).astype(jnp.uint32) + jnp.uint32(i + s + 2)).astype(jnp.float32) / 8e9 + 0.3,
        ],
        axis=-1,
    )
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def main():
    rng = np.random.default_rng(0)

    def key_of(i, c):
        base = jax.lax.broadcasted_iota(jnp.uint32, (N, 1), 0)[:, 0]
        mix = _hash(base + jnp.uint32(i) * jnp.uint32(2654435761))
        mix = mix ^ (c * 1e6).astype(jnp.uint32)
        return (mix % jnp.uint32(90 * 90)).astype(jnp.int32)

    def sort1(c, i):
        k = key_of(i, c)
        (sk,) = jax.lax.sort([k], dimension=0, num_keys=1, is_stable=False)
        return c + sk.astype(jnp.float32) * 1e-9

    bench("sort 2M [key]", sort1)

    def sort4(c, i):
        k = key_of(i, c)
        lane = jnp.arange(N, dtype=jnp.int32)
        sk, a, b, d = jax.lax.sort(
            [k, lane, (c * 100).astype(jnp.uint32), c],
            dimension=0, num_keys=1, is_stable=False,
        )
        return c + sk.astype(jnp.float32) * 1e-9 + d * 0.1

    bench("sort 2M [key + 3 payloads]", sort4)

    def sort2x(c, i):
        k = key_of(i, c)
        lane = jnp.arange(N, dtype=jnp.int32)
        sk, sl, sc = jax.lax.sort(
            [k, lane, c], dimension=0, num_keys=1, is_stable=False
        )
        _, un = jax.lax.sort(
            [sl, sc], dimension=0, num_keys=1, is_stable=False
        )
        return c * 0.5 + un * 0.5 + sk.astype(jnp.float32) * 1e-9

    bench("sort+unsort 2M [1 payload each]", sort2x)

    # --- the actual sorted MERL eval vs packed eval --------------------
    from mitsuba_customization_tpu.models import tabulated as tb
    from mitsuba_customization_tpu.ops import merl_sorted as ms

    table = jnp.asarray(
        np.abs(rng.standard_normal((90, 90, 180, 3))), jnp.float32
    )
    # Build the corner-block layout explicitly: on TPU TabulatedBRDF.build
    # sets corners=None and tb.eval would route to the sorted kernel,
    # silently benchmarking it against itself (round-2 verdict item 3).
    corners = tb._pack_corners(table)
    tab = tb.TabulatedBRDF.build(table)
    perm = ms.pack_perm(table)

    def packed(c, i, corners_, _perm, _tbl):
        wi = unit_vec(i, c, 0)
        wo = unit_vec(i + 5, c, 1)
        f = tb.eval_packed(corners_, (90, 90, 180), wi, wo)
        f = f * jnp.maximum(wo[..., 2], 0.0)[..., None]
        return c + f.sum(-1) * 1e-9

    bench("merl eval packed (repo round-1)", packed, corners, perm, table)

    def sorted_eval(c, i, _params, perm, tbl):
        wi = unit_vec(i, c, 0)
        wo = unit_vec(i + 5, c, 1)
        out = ms.eval_sorted(tbl, wi, wo, perm=perm)
        return c + out.sum(-1) * 1e-9

    bench("merl eval sorted-segment Pallas", sorted_eval, tab, perm, table)

    # --- Marginal2D cond-row fetch candidates ---------------------------
    cdf_cond = jnp.asarray(
        rng.random((32, 64, 64)).cumsum(-1) / 64.0, jnp.float32
    )

    def cond_gather(c, i, t):
        tb_ = key_of(i, c) % 32
        row = key_of(i + 3, c) % 64
        rows = t[tb_, row]
        return c + rows.sum(-1) * 1e-9

    bench("cond-CDF row per-lane gather (XLA)", cond_gather, cdf_cond)

    def cond_onehot(c, i, t):
        tb_ = key_of(i, c) % 32
        row = key_of(i + 3, c) % 64
        oh = jax.nn.one_hot(tb_ * 64 + row, 2048, dtype=jnp.float32)
        rows = jax.lax.dot_general(
            oh, t.reshape(2048, 64), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return c + rows.sum(-1) * 1e-9

    bench("cond-CDF row one-hot 2048 f32 MXU", cond_onehot, cdf_cond)

    def cond_onehot_hilo(c, i, t):
        tb_ = key_of(i, c) % 32
        row = key_of(i + 3, c) % 64
        oh = jax.nn.one_hot(tb_ * 64 + row, 2048, dtype=jnp.bfloat16)
        flat = t.reshape(2048, 64)
        hi = flat.astype(jnp.bfloat16)
        lo = (flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f = lambda m: jax.lax.dot_general(
            oh, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows = f(hi) + f(lo)
        return c + rows.sum(-1) * 1e-9

    bench("cond-CDF row one-hot 2048 bf16 hi+lo", cond_onehot_hilo, cdf_cond)

    oh_small = jnp.asarray(rng.random((16, 32, 64)).cumsum(-1), jnp.float32)

    def cond_onehot_small(c, i, t):
        tb_ = key_of(i, c) % 16
        row = key_of(i + 3, c) % 32
        oh = jax.nn.one_hot(tb_ * 32 + row, 512, dtype=jnp.float32)
        rows = jax.lax.dot_general(
            oh, t.reshape(512, 64), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return c + rows.sum(-1) * 1e-9

    bench("cond-CDF row one-hot 512 f32 MXU", cond_onehot_small, oh_small)


if __name__ == "__main__":
    main()

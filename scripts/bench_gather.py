"""Microbenchmark of candidate gather strategies for the MERL hot path.

Measures the true device cost of each implementation strategy for the
pipeline's dominant ops (per-lane trilinear fetch from the 90x90x180x3 BRDF
table — SURVEY.md §3.3, §7.3 item 5; Marginal2D CDF rows; film scatter;
sorts for compaction).

Methodology (hard-won on this axon tunnel):
* Big arrays MUST be jit arguments, never closure constants — embedded
  constants inflate lowering to minutes.
* `block_until_ready` does NOT reliably block on this platform; a small
  host fetch does. Each op is timed at two loop counts k1 < k2 inside one
  dispatch, and the per-iteration cost is (t(k2)-t(k1))/(k2-k1), which
  cancels dispatch/fetch overhead.
* Indices derive from the loop counter + carry so nothing can be hoisted.

Run: python -u scripts/bench_gather.py
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N = 1 << 21
K1, K2 = 8, 40


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def lanes_idx(i, c, n_max):
    base = jax.lax.broadcasted_iota(jnp.uint32, (N, 1), 0)[:, 0]
    mix = _hash(base + jnp.uint32(i) * jnp.uint32(2654435761))
    mix = mix ^ (c * 1e6).astype(jnp.uint32)
    return (mix % jnp.uint32(n_max)).astype(jnp.int32)


def _timed(f, c0, tables, k):
    t0 = time.perf_counter()
    r = f(c0, jnp.int32(k), *tables)
    float(r[:4].sum())  # forces completion through the tunnel
    return time.perf_counter() - t0


def bench(name, step, *tables, lanes=N):
    f = jax.jit(
        lambda c0, k, *ts: jax.lax.fori_loop(
            0, k, lambda i, c: c * 0.5 + step(c, i, *ts), c0
        )
    )
    c0 = jnp.zeros((N,), jnp.float32)
    _timed(f, c0, tables, K1)  # warmup/compile
    best = np.inf
    for _ in range(2):
        t1 = _timed(f, c0, tables, K1)
        t2 = _timed(f, c0, tables, K2)
        best = min(best, (t2 - t1) / (K2 - K1))
    print(f"{name:44s} {best*1e3:9.3f} ms  {lanes/best/1e6:10.1f} Mlanes/s")
    return best


def main():
    rng = np.random.default_rng(0)
    n_cells = 90 * 90 * 180
    corners_f32 = jnp.asarray(
        rng.standard_normal((n_cells, 24)), dtype=jnp.float32
    )
    corners_bf16 = corners_f32.astype(jnp.bfloat16)
    table = jnp.asarray(
        rng.standard_normal((90, 90, 180, 3)), dtype=jnp.float32
    )

    bench(
        "A row-gather (1.46M,24) f32",
        lambda c, i, t: c + t[lanes_idx(i, c, n_cells)].sum(-1) * 1e-9,
        corners_f32,
    )
    bench(
        "B row-gather (1.46M,24) bf16",
        lambda c, i, t: c
        + t[lanes_idx(i, c, n_cells)].astype(jnp.float32).sum(-1) * 1e-9,
        corners_bf16,
    )
    bench(
        "A3 scalar gather (1.46M,) f32",
        lambda c, i, t: c + t[lanes_idx(i, c, n_cells)] * 1e-9,
        corners_f32[:, 0],
    )
    bench(
        "A4 row-gather (8192,24) f32",
        lambda c, i, t: c + t[lanes_idx(i, c, 8192)].sum(-1) * 1e-9,
        corners_f32[:8192],
    )

    def scalar24(c, i, t):
        ii = lanes_idx(i, c, 89)
        jj = lanes_idx(i + 7, c, 89)
        kk = lanes_idx(i + 13, c, 179)
        acc = c * 0.0
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    acc = acc + t[ii + di, jj + dj, kk + dk].sum(-1)
        return c + acc * 1e-9

    bench("D 24 scalar gathers f32", scalar24, table)

    cdf_row = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)

    def onehot_rows(c, i, t):
        oh = jax.nn.one_hot(lanes_idx(i, c, 32), 32, dtype=jnp.float32)
        rows = oh @ t
        return c + rows.sum(-1) * 1e-9

    bench("E one-hot (N,32)@(32,64) MXU", onehot_rows, cdf_row)

    cdf_cond = jnp.asarray(rng.standard_normal((32, 64, 64)), jnp.float32)

    def cond_gather(c, i, t):
        rows = t[lanes_idx(i, c, 32), lanes_idx(i + 3, c, 64)]
        return c + rows.sum(-1) * 1e-9

    bench("F cond-CDF row gather (2048,64)", cond_gather, cdf_cond)

    def do_sort(c, i, _t):
        o = jnp.argsort(lanes_idx(i, c, 1 << 20))
        return c + o.astype(jnp.float32) * 1e-12

    bench("G argsort 2M", do_sort, cdf_row)

    def do_sort_kv(c, i, _t):
        _, v = jax.lax.sort_key_val(lanes_idx(i, c, 90), c)
        return c * 0.5 + v * 0.5

    bench("G2 sort_key_val 2M keys in [0,90)", do_sort_kv, cdf_row)

    def scat(c, i, _t):
        img = jnp.zeros((512 * 512, 3), jnp.float32)
        img = img.at[lanes_idx(i, c, 512 * 512)].add(c[..., None])
        return c + img.sum() * 1e-9

    bench("H film scatter-add 2M->512^2", scat, cdf_row)

    def vpu(c, i, _t):
        x = c + 1.0
        for _ in range(100):
            x = x * 1.0000001 + 0.5
        return x * 1e-9 + c

    bench("I VPU 100 fma/lane", vpu, cdf_row)

    # J. the actual packed MERL eval from the repo (tables as args)
    from mitsuba_customization_tpu.models import tabulated as tb

    tab = tb.TabulatedBRDF.build(
        jnp.asarray(
            np.abs(rng.standard_normal((90, 90, 180, 3))), jnp.float32
        )
    )

    def unit_vec(i, c, flip):
        v = jnp.stack(
            [
                _hash((c * 1e5).astype(jnp.uint32) + jnp.uint32(i)).astype(jnp.float32) / 4e9 - 0.5,
                _hash((c * 1e6).astype(jnp.uint32) + jnp.uint32(i + 1)).astype(jnp.float32) / 4e9 - 0.5,
                _hash((c * 1e7).astype(jnp.uint32) + jnp.uint32(i + 2)).astype(jnp.float32) / 8e9 + 0.3,
            ],
            axis=-1,
        )
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def merl_eval(c, i, params):
        wi = unit_vec(i, c, 0)
        wo = unit_vec(i + 5, c, 1)
        return c + tb.eval(params, wi, wo).sum(-1) * 1e-9

    bench("J merl eval (packed, repo impl)", merl_eval, tab)

    def merl_pdf(c, i, params):
        wi = unit_vec(i, c, 0)
        wo = unit_vec(i + 5, c, 1)
        return c + tb.pdf(params, wi, wo) * 1e-9

    bench("K merl pdf (repo impl)", merl_pdf, tab)

    def merl_sample(c, i, params):
        wi = unit_vec(i, c, 0)
        u2 = jnp.stack(
            [
                _hash((c * 1e5).astype(jnp.uint32)).astype(jnp.float32) / 4.3e9,
                _hash((c * 1e6).astype(jnp.uint32)).astype(jnp.float32) / 4.3e9,
            ],
            axis=-1,
        )
        wo, p, w, _ = tb.sample(params, wi, u2)
        return c + p * 1e-9

    bench("L merl sample (repo impl)", merl_sample, tab)


if __name__ == "__main__":
    main()

"""Round-4 sort-tax experiments (VERDICT.md round-3 item 1).

Measures, on the real chip, the cost of the candidate sort strategies for
the per-bounce sorted-segment kernels (ops/merl_sorted, ops/marginal_sorted):

  A. chunked bitonic sort cost vs chunk count (1..64) at 1M/2M/4M lanes,
     for 2/3/4 int32 operands;
  B. scatter-based unsort (out.at[perm].set(v)) vs sort-based unsort;
  C. end-to-end eval_sorted kernel cost vs SORT_CHUNK (segment-count
     inflation from chunking);
  D. bf16-packed payload sort (2 ops carrying what 4 carried).

Emits PROFILE_sort_r04.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32)), out[:1] if isinstance(out, (tuple, list)) else (out,))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    o = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.asarray(o).ravel()[0].astype(jnp.float32))  # force completion
    return (time.perf_counter() - t0) / n * 1e3


def chunked_sort(ops_, c):
    if c <= 1:
        return jax.lax.sort(ops_, dimension=0, num_keys=1, is_stable=False)
    n = ops_[0].shape[0]
    outs = jax.lax.sort(
        [o.reshape(c, n // c) for o in ops_], dimension=1, num_keys=1,
        is_stable=False,
    )
    return [o.reshape(n) for o in outs]


def main():
    key = jax.random.PRNGKey(0)
    results = {"device": str(jax.devices()[0])}

    # ---- A: sort cost vs chunks x operands x n ----
    A = {}
    for n in (1 << 20, 1 << 21, 1 << 22):
        keys = jax.random.randint(key, (n,), 0, 81000, dtype=jnp.int32)
        pay = [
            jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
            for _ in range(3)
        ]
        for n_ops in (2, 3, 4):
            for c in (1, 4, 8, 16, 32, 64):
                if n // max(c, 1) < 2048 or n % max(c, 1):
                    continue
                f = jax.jit(lambda k, p, c=c, n_ops=n_ops: chunked_sort(
                    [k] + p[: n_ops - 1], c))
                ms = timeit(f, keys, pay)
                A[f"n{n>>20}M_ops{n_ops}_c{c}"] = round(ms, 3)
                print(f"A n={n>>20}M ops={n_ops} chunks={c}: {ms:.3f} ms",
                      flush=True)
    results["A_sort_chunks"] = A

    # ---- B: unsort alternatives at 2M (perm is a true permutation) ----
    n = 1 << 21
    perm = jax.random.permutation(key, n).astype(jnp.int32)
    vals = [jax.random.normal(key, (n,)) for _ in range(3)]

    def unsort_sort(perm, vals):
        return chunked_sort([perm] + vals, 1)[1:]

    def unsort_sort_c8(perm, vals):
        # chunk-local perm: make indices chunk-local for a fair c=8 sort
        return chunked_sort([perm] + vals, 8)[1:]

    def unsort_scatter(perm, vals):
        return [jnp.zeros_like(v).at[perm].set(v, unique_indices=True,
                                               mode="promise_in_bounds")
                for v in vals]

    def unsort_gather(perm, vals):
        # inverse perm once (scatter of iota), then gathers
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True,
            mode="promise_in_bounds")
        return [v[inv] for v in vals]

    B = {}
    for name, f in [("sort", unsort_sort), ("scatter", unsort_scatter),
                    ("gather_inv", unsort_gather)]:
        ms = timeit(jax.jit(f), perm, vals)
        B[name] = round(ms, 3)
        print(f"B unsort {name}: {ms:.3f} ms", flush=True)
    # chunk-local variant with per-chunk indices
    perm8 = jnp.concatenate([
        jax.random.permutation(jax.random.fold_in(key, i), n // 8)
        .astype(jnp.int32) for i in range(8)])
    ms = timeit(jax.jit(unsort_sort_c8), perm8, vals)
    B["sort_c8"] = round(ms, 3)
    print(f"B unsort sort_c8: {ms:.3f} ms", flush=True)
    results["B_unsort"] = B

    # ---- C: end-to-end eval_sorted vs SORT_CHUNK ----
    from mitsuba_customization_tpu.ops import merl_sorted
    from mitsuba_customization_tpu.core import warp

    n = 1 << 21
    tab = jax.random.uniform(key, (2, 90, 90, 180, 3)) + 0.05
    u = jax.random.uniform(key, (n, 4))
    wi = warp.square_to_cosine_hemisphere(u[:, :2])
    wo = warp.square_to_cosine_hemisphere(u[:, 2:])
    slot = (jax.random.uniform(key, (n,)) < 0.5).astype(jnp.int32)
    perm_t = merl_sorted.pack_perm(tab)
    C = {}
    for chunk_pow in (None, 21, 20, 19, 18, 17, 16):
        if chunk_pow is None:
            merl_sorted.SORT_CHUNK = 1 << 19  # default -> _n_chunks gives 1
            label = "global"
        else:
            merl_sorted.SORT_CHUNK = 1 << (chunk_pow - 3)  # force 8+ chunks
            label = f"chunk{1 << (chunk_pow - 3) >> 10}K"
        f = jax.jit(lambda t, p, a, b, s: merl_sorted.eval_sorted(
            t, a, b, slot=s, perm=p))
        ms = timeit(f, tab, perm_t, wi, wo, slot, n=10)
        nc = merl_sorted._n_chunks(n)
        C[f"{label}_nc{nc}"] = round(ms, 3)
        print(f"C eval_sorted {label} (n_chunks={nc}): {ms:.3f} ms",
              flush=True)
    merl_sorted.SORT_CHUNK = 1 << 19
    results["C_eval_sorted"] = C

    # ---- D: packed payload (2 ops vs 4) at 2M, c=8 ----
    n = 1 << 21
    keys = jax.random.randint(key, (n,), 0, 81000, dtype=jnp.int32)
    p1 = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    p2 = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    D = {}
    for n_ops, c in ((4, 8), (3, 8), (2, 8), (4, 16), (3, 16), (2, 16)):
        f = jax.jit(lambda k, a, b, c_=c, n_ops=n_ops: chunked_sort(
            [k, a, b][:n_ops] + ([a] if n_ops == 4 else []), c_))
        ms = timeit(f, keys, p1, p2)
        D[f"ops{n_ops}_c{c}"] = round(ms, 3)
        print(f"D ops={n_ops} c={c}: {ms:.3f} ms", flush=True)
    results["D_packed"] = D

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE_sort_r04.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

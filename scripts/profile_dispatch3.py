"""Part 3: batched-sort sweep + wavefront-size sweep for trace_paths."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.core.sampler import IndependentSampler
from mitsuba_customization_tpu.render import integrator as integ
from mitsuba_customization_tpu.render.records import Ray

OUT = "PROFILE_dispatch3_r03.json"
RESULTS = {"stages": {}}
K1, K2 = 2, 6


def bench(name, step, n):
    f = jax.jit(
        lambda c0, k: jax.lax.fori_loop(
            0, k, lambda i, c: c * 0.5 + step(c, i), c0
        )
    )
    c0 = jnp.zeros((n,), jnp.float32)

    def timed(k):
        t0 = time.perf_counter()
        r = f(c0, jnp.int32(k))
        float(r[:4].sum())
        return time.perf_counter() - t0

    timed(K1)
    best = np.inf
    for _ in range(2):
        t1 = timed(K1)
        t2 = timed(K2)
        best = min(best, (t2 - t1) / (K2 - K1))
    ms = best * 1e3
    print(f"{name:52s} {ms:9.3f} ms", flush=True)
    RESULTS["stages"][name] = round(ms, 4)
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    return best


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def main():
    rng = np.random.default_rng(0)
    M = 1 << 22  # 4M — the combined-eval width at MAX_WAVEFRONT=2M

    key = jnp.asarray(rng.integers(0, 8100, M), dtype=jnp.int32)
    pay = jnp.asarray(rng.random(M), dtype=jnp.float32)

    # batched sort: (chunks, M//chunks) along dimension=1
    for chunks in (1, 2, 4, 8, 16, 64):
        cl = M // chunks

        def bsort(c, i, chunks=chunks, cl=cl):
            k = (key + (c[:4].sum() * 0).astype(jnp.int32)).reshape(
                chunks, cl)
            p = pay.reshape(chunks, cl)
            a, b, d, e = jax.lax.sort(
                [k, p, p, p], dimension=1, num_keys=1, is_stable=False)
            return c * 0.999 + 1e-9 * b.reshape(-1)[: c.shape[0]]

        bench(f"sort 4M 4-op batched x{chunks}", bsort, M)

    # wavefront-size sweep: trace_paths d4 cost per 2M-lane-equivalent
    scene = _flagship_scene(res=512, spp=64, depth=4)
    for shift in (21, 20, 19, 18):
        n = 1 << shift
        o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), dtype=jnp.float32)
        smp = IndependentSampler(0, jnp.arange(n, dtype=jnp.uint32))

        def step(c, i, o=o, smp=smp, n=n):
            d = jnp.stack([
                _hash((c * 1e5).astype(jnp.uint32) + jnp.uint32(i)).astype(
                    jnp.float32) / 4e9 - 0.5,
                _hash((c * 1e6).astype(jnp.uint32) + jnp.uint32(i + 1)).astype(
                    jnp.float32) / 4e9 - 0.5,
                _hash((c * 1e7).astype(jnp.uint32) + jnp.uint32(i + 2)).astype(
                    jnp.float32) / 8e9 + 0.3,
            ], axis=-1)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            L, st = integ.trace_paths(
                scene, Ray.make(o, d), smp, 4, 3, False)
            return c * 0.999 + 1e-6 * L.sum(-1)

        t = bench(f"trace_paths d4 N=2^{shift}", step, n)
        print(f"    -> per-2M-equivalent: {t * (1 << 21) / n * 1e3:.1f} ms",
              flush=True)
        RESULTS["stages"][f"trace d4 2^{shift} per-2M-eq"] = round(
            t * (1 << 21) / n * 1e3, 2)
        with open(OUT, "w") as fh:
            json.dump(RESULTS, fh, indent=1)


if __name__ == "__main__":
    main()

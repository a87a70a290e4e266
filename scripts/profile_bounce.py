"""Bisect the per-bounce cost: kernel-path toggles + component ablations.

Times trace_paths depth 2 vs 4 under different tabulated kernel paths and
bounce_shade in isolation with scene-realistic masks. Run on the TPU:
python -u scripts/profile_bounce.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.core.sampler import IndependentSampler
from mitsuba_customization_tpu.models import bsdf as bsdf_mod, tabulated
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.render.integrator import trace_paths

N = 1 << 21
K1, K2 = 2, 6
OUT = "PROFILE_bounce_r03.json"
RESULTS = {}


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def unit_vec(i, c, s):
    v = jnp.stack(
        [
            _hash((c * 1e5).astype(jnp.uint32) + jnp.uint32(i + s)).astype(
                jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e6).astype(jnp.uint32) + jnp.uint32(i + s + 1)).astype(
                jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e7).astype(jnp.uint32) + jnp.uint32(i + s + 2)).astype(
                jnp.float32) / 8e9 + 0.3,
        ],
        axis=-1,
    )
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def rand01(i, c, s):
    return _hash((c * 1e5).astype(jnp.uint32) + jnp.uint32(i * 7 + s)).astype(
        jnp.float32) / 4.3e9


def bench(name, step):
    f = jax.jit(
        lambda c0, k: jax.lax.fori_loop(
            0, k, lambda i, c: c * 0.5 + step(c, i), c0
        )
    )
    c0 = jnp.zeros((N,), jnp.float32)

    def timed(k):
        t0 = time.perf_counter()
        r = f(c0, jnp.int32(k))
        float(r[:4].sum())
        return time.perf_counter() - t0

    timed(K1)
    best = np.inf
    for _ in range(3):
        t1 = timed(K1)
        t2 = timed(K2)
        best = min(best, (t2 - t1) / (K2 - K1))
    ms = best * 1e3
    print(f"{name:52s} {ms:9.3f} ms", flush=True)
    RESULTS[name] = round(ms, 4)
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    return best


def main():
    scene = _flagship_scene(res=64, spp=4, depth=4)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)), dtype=jnp.float32)
    smp = IndependentSampler(0, jnp.arange(N, dtype=jnp.uint32))
    mat_id = jnp.asarray(rng.integers(0, 3, N), dtype=jnp.int32)

    def full(depth):
        def step(c, i):
            L, _ = trace_paths(
                scene, Ray.make(o, unit_vec(i, c, 0)), smp, depth, 5, False
            )
            return c * 0.999 + 1e-6 * L.sum(-1)
        return step

    for ev, sa, tag in [
        ("sorted", "sorted", "sorted+sorted"),
        ("sorted", "onehot", "sorted+onehot"),
        ("packed", "onehot", "packed+onehot (round-2 cfg)"),
    ]:
        tabulated.EVAL_PATH, tabulated.SAMPLE_PATH = ev, sa
        t2 = bench(f"trace depth=2 [{tag}]", full(2))
        t4 = bench(f"trace depth=4 [{tag}]", full(4))
        RESULTS[f"per_bounce_ms [{tag}]"] = round((t4 - t2) / 2 * 1e3, 3)
        with open(OUT, "w") as fh:
            json.dump(RESULTS, fh, indent=1)
        print(f"  -> per-bounce [{tag}]: {(t4-t2)/2*1e3:.1f} ms", flush=True)

    tabulated.EVAL_PATH = tabulated.SAMPLE_PATH = None

    # bounce_shade in isolation: all-tabulated lanes vs 1/3 tabulated
    def bshade(ids):
        def step(c, i):
            out = bsdf_mod.bounce_shade(
                scene.bsdfs, ids, unit_vec(i, c, 0), unit_vec(i, c, 7),
                jnp.stack([rand01(i, c, 3), rand01(i, c, 4)], axis=-1),
                rand01(i, c, 5),
            )
            return c * 0.999 + 1e-6 * (out[0].sum(-1) + out[4].sum(-1))
        return step

    bench("bounce_shade mat=mixed(1/3 tab)", bshade(mat_id))
    bench("bounce_shade mat=all-tabulated", bshade(jnp.zeros(N, jnp.int32)))

    # combined 2N eval in isolation (the fused eval pass)
    tab = scene.bsdfs.stacks[bsdf_mod.TABULATED]
    slot = jnp.zeros(N, dtype=jnp.int32)

    def eval2n(c, i):
        wi = unit_vec(i, c, 0)
        wi2 = jnp.concatenate([wi, wi], axis=0)
        wo2 = jnp.concatenate(
            [unit_vec(i, c, 7), unit_vec(i, c, 11)], axis=0
        )
        s2 = jnp.concatenate([slot, slot], axis=0)
        f = tabulated.eval(tab, wi2, wo2, slot=s2)
        return c * 0.999 + 1e-6 * (f[:N].sum(-1) + f[N:].sum(-1))

    bench("combined 2N eval (4M lanes)", eval2n)

    # marginal_sorted kernel in isolation via bounce_shade's sample path:
    def marg(c, i):
        out = tabulated.bounce_shade(
            tab, unit_vec(i, c, 0), unit_vec(i, c, 7),
            jnp.stack([rand01(i, c, 3), rand01(i, c, 4)], axis=-1),
            rand01(i, c, 5), slot=slot,
        )
        return c * 0.999 + 1e-6 * out[3]

    tabulated.EVAL_PATH = "packed"  # cheap-ish eval so sampling dominates?
    # no: keep production eval but measure delta via onehot sample toggle
    tabulated.EVAL_PATH = None
    tabulated.SAMPLE_PATH = "sorted"
    bench("tab bounce_shade (sorted sampling)", marg)
    tabulated.SAMPLE_PATH = "onehot"
    bench("tab bounce_shade (onehot sampling)", marg)
    tabulated.SAMPLE_PATH = None


if __name__ == "__main__":
    main()

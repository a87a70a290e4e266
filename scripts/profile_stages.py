"""Stage-level TPU profile: where do the cycles go per 2M-lane bounce?

The profiling surface the reference gets from dr.kernel_history
(SURVEY.md §5.1). Tunnel-feasible by design (the round-2 version chained
K=20 full pipelines and never finished over the axon link):

  * every stage is ONE jitted fori_loop whose trip count is a *traced*
    argument — one compile, two timed calls (K1=2, K2=6), and the
    per-iteration cost is (t2 - t1) / (K2 - K1), which cancels both the
    ~30-60 ms host<->TPU tunnel round-trip and any loop-invariant setup;
  * results stream to stdout AND to PROFILE_r03.json after every stage,
    so a timeout still leaves a committed artifact.

Run on the target device:  python -u scripts/profile_stages.py
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
from mitsuba_customization_tpu.render import emitters as em_mod
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.render.integrator import trace_paths

N = 1 << 21  # the real per-pass wavefront (render/integrator.MAX_WAVEFRONT)
K1, K2 = 2, 6
OUT = "PROFILE_r03.json"

RESULTS = {"n_lanes": N, "device": None, "stages": {}}


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def unit_vec(i, c, s):
    """Pseudo-random unit vectors derived from the carry (non-hoistable)."""
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


def bench(name, step, n_compare=1):
    """step(carry (N,), i) -> (N,); per-iteration seconds via K2-K1 diff."""
    f = jax.jit(
        lambda c0, k: jax.lax.fori_loop(
            0, k, lambda i, c: c * 0.5 + step(c, i), c0
        )
    )
    c0 = jnp.zeros((N,), jnp.float32)

    def timed(k):
        t0 = time.perf_counter()
        r = f(c0, jnp.int32(k))
        float(r[:4].sum())  # host fetch forces completion over the tunnel
        return time.perf_counter() - t0

    timed(K1)  # compile + warm
    best = np.inf
    for _ in range(2):
        t1 = timed(K1)
        t2 = timed(K2)
        best = min(best, (t2 - t1) / (K2 - K1))
    ms = best * 1e3
    print(f"{name:44s} {ms:9.3f} ms  {N / best / 1e6:10.1f} Mlanes/s",
          flush=True)
    RESULTS["stages"][name] = round(ms, 4)
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    return best


def main():
    RESULTS["device"] = str(jax.devices()[0])
    scene = _flagship_scene(res=64, spp=4, depth=4)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)), dtype=jnp.float32)
    mat_id = jnp.asarray(rng.integers(0, 3, N), dtype=jnp.int32)
    smp = IndependentSampler(0, jnp.arange(N, dtype=jnp.uint32))
    tab = scene.bsdfs.stacks[bsdf_mod.TABULATED]
    slot = jnp.zeros(N, dtype=jnp.int32)
    wi_fixed = jnp.broadcast_to(
        jnp.asarray([0.3, 0.1, 0.9486833]), (N, 3)
    )

    bench(
        "sampler next_2d",
        lambda c, i: c + smp.with_dim(0).next_2d().sum(-1) * 1e-9
        + rand01(i, c, 0) * 1e-9,
    )
    bench(
        "ray_intersect (flagship, brute)",
        lambda c, i: c * 0.999
        + 1e-9 * scene.ray_intersect(Ray.make(o, unit_vec(i, c, 0))).p.sum(-1),
    )
    bench(
        "ray_test (shadow)",
        lambda c, i: c * 0.999
        + 1e-9 * scene.ray_test(Ray.make(o, unit_vec(i, c, 0))).astype(
            jnp.float32),
    )
    bench(
        "emitter sample_direction",
        lambda c, i: c * 0.999
        + 1e-6 * em_mod.sample_direction(
            scene.emitters, scene.geometry, o,
            jnp.stack([rand01(i, c, 0), rand01(i, c, 1), rand01(i, c, 2)],
                      axis=-1),
        ).d.sum(-1),
    )
    bench(
        "merl eval (production path)",
        lambda c, i: c * 0.999
        + 1e-6 * tabulated.eval(tab, unit_vec(i, c, 0), wi_fixed,
                                slot=slot).sum(-1),
    )
    bench(
        "merl pdf",
        lambda c, i: c * 0.999
        + 1e-6 * tabulated.pdf(tab, unit_vec(i, c, 0), wi_fixed, slot=slot),
    )
    bench(
        "merl sample",
        lambda c, i: c * 0.999
        + 1e-6 * tabulated.sample(
            tab, unit_vec(i, c, 0),
            jnp.stack([rand01(i, c, 3), rand01(i, c, 4)], axis=-1),
            slot=slot,
        )[0].sum(-1),
    )
    bench(
        "bsdf dispatch eval_pdf (3 kernels)",
        lambda c, i: c * 0.999
        + 1e-6 * bsdf_mod.eval_pdf(
            scene.bsdfs, mat_id, unit_vec(i, c, 0), unit_vec(i, c, 7)
        )[0].sum(-1),
    )
    bench(
        "bsdf dispatch sample (3 kernels)",
        lambda c, i: c * 0.999
        + 1e-6 * bsdf_mod.sample(
            scene.bsdfs, mat_id, unit_vec(i, c, 0),
            jnp.stack([rand01(i, c, 3), rand01(i, c, 4)], axis=-1),
            rand01(i, c, 5),
        )[0].sum(-1),
    )

    def bshade(c, i):
        out = bsdf_mod.bounce_shade(
            scene.bsdfs, mat_id, unit_vec(i, c, 0), unit_vec(i, c, 7),
            jnp.stack([rand01(i, c, 3), rand01(i, c, 4)], axis=-1),
            rand01(i, c, 5),
        )
        return c * 0.999 + 1e-6 * (out[0].sum(-1) + out[4].sum(-1))

    bench("bounce_shade dispatch (fused)", bshade)

    def emit_hit(c, i):
        ray = Ray.make(o, unit_vec(i, c, 0))
        si = scene.ray_intersect(ray)
        hit = em_mod.eval_hit(scene.emitters, si)
        hp = em_mod.pdf_hit_direction(
            scene.emitters, scene.geometry, si, ray.o
        )
        bg = em_mod.eval_background(scene.emitters, ray.d)
        bp = em_mod.pdf_miss_direction(scene.emitters, ray.d)
        return c * 0.999 + 1e-6 * (hit.sum(-1) + hp + bg.sum(-1) + bp)

    bench("emitter-hit block (incl intersect)", emit_hit)

    def full(depth):
        def step(c, i):
            L, _ = trace_paths(
                scene, Ray.make(o, unit_vec(i, c, 0)), smp, depth, 5, False
            )
            return c * 0.999 + 1e-6 * L.sum(-1)
        return step

    t1 = bench("full bounce (trace_paths depth=1)", full(1))
    t2 = bench("full path (trace_paths depth=2)", full(2))
    t4 = bench("full path (trace_paths depth=4)", full(4))
    RESULTS["per_bounce_ms_d2"] = round((t2 - t1) * 1e3, 3)
    RESULTS["per_bounce_ms_d4"] = round((t4 - t1) / 3 * 1e3, 3)
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    print(f"marginal per-bounce cost: {(t4 - t1) / 3 * 1e3:.1f} ms "
          f"per {N >> 20}M lanes", flush=True)


if __name__ == "__main__":
    main()

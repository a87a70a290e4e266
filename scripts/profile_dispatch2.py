"""Part 2: unsort strategies + sampling-path choice + per-pass overhead."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.models import bsdf as bsdf_mod, tabulated
from mitsuba_customization_tpu.render.integrator import render_lanes

N = 1 << 21
K1, K2 = 2, 6
OUT = "PROFILE_dispatch2_r03.json"
RESULTS = {"n_lanes": N, "stages": {}}


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


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
    for _ in range(2):
        t1 = timed(K1)
        t2 = timed(K2)
        best = min(best, (t2 - t1) / (K2 - K1))
    ms = best * 1e3
    print(f"{name:46s} {ms:9.3f} ms", flush=True)
    RESULTS["stages"][name] = round(ms, 4)
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    return best


def main():
    scene = _flagship_scene(res=64, spp=4, depth=4)
    table = scene.bsdfs
    tab = table.stacks[bsdf_mod.TABULATED]
    rng = np.random.default_rng(0)
    M = 2 * N
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    r = jnp.asarray(rng.random(M), dtype=jnp.float32)
    ones_mask = jnp.ones(N, dtype=bool)
    slot0 = jnp.zeros(N, dtype=jnp.int32)

    # unsort via scatter: out[perm[i]] = val[i], 3 channels fused
    def scat(c, i):
        vals = jnp.stack([r + rand01(i, c, 0)[0], r, r], axis=-1)
        out = jnp.zeros((M, 3), jnp.float32).at[perm].set(
            vals, unique_indices=True, indices_are_sorted=False)
        return c * 0.999 + 1e-9 * out[:N, 0]

    bench("unsort scatter (4M,3) f32", scat)

    # unsort via 3-op sort (rgb packed to bf16 pairs + f32)
    def sort3(c, i):
        rg = ((r * 0).astype(jnp.int32) + perm)  # stand-in payload i32
        a, b, d = jax.lax.sort(
            [perm + (c[:4] .sum() * 0).astype(jnp.int32), rg,
             r + rand01(i, c, 0)[0]],
            dimension=0, num_keys=1, is_stable=False)
        return c * 0.999 + 1e-9 * d[:N]

    bench("sort 4M 3-operand", sort3)

    def sort5(c, i):
        a, b, d, e, f_ = jax.lax.sort(
            [perm[:N] + (c[:4].sum() * 0).astype(jnp.int32), r[:N], r[:N],
             r[:N], r[:N] + rand01(i, c, 0)[0]],
            dimension=0, num_keys=1, is_stable=False)
        return c * 0.999 + 1e-9 * f_[:N]

    bench("sort 2M 5-operand", sort5)

    # one-hot vs sorted sampling inside tabulated.bounce_shade
    def unit_vec(i, c, s):
        v = jnp.stack([
            _hash((c * 1e5).astype(jnp.uint32) + jnp.uint32(i + s)).astype(
                jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e6).astype(jnp.uint32) + jnp.uint32(i + s + 1)).astype(
                jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e7).astype(jnp.uint32) + jnp.uint32(i + s + 2)).astype(
                jnp.float32) / 8e9 + 0.3,
        ], axis=-1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def s2(i, c):
        return jnp.stack([rand01(i, c, 3), rand01(i, c, 4)], axis=-1)

    for path in ("sorted", "onehot"):
        tabulated.SAMPLE_PATH = path

        def tabbs(c, i):
            f_nee, p_nee, wo, p_s, w, d = tabulated.bounce_shade(
                tab, unit_vec(i, c, 0), unit_vec(i, c, 3), s2(i, c),
                rand01(i, c, 9), slot=slot0, mask=ones_mask,
                mask_nee=ones_mask)
            return c * 0.999 + 1e-6 * (
                f_nee.sum(-1) + p_nee + wo.sum(-1) + p_s + w.sum(-1))

        bench(f"tab bounce_shade [{path} sampling]", tabbs)
    tabulated.SAMPLE_PATH = None

    # full production pass (render_lanes d4) vs trace-only profile
    scene_b = _flagship_scene(res=512, spp=64, depth=4)

    def full_pass(c, i):
        L, xy, stats = render_lanes(
            scene_b, 64, jnp.uint32(0), None, 4,
            pixel=(jnp.arange(N, dtype=jnp.uint32) // 8),
            sample_idx=(jnp.arange(N, dtype=jnp.uint32) % 8
                        + (c[:1].sum() * 0).astype(jnp.uint32)),
        )
        return c * 0.999 + 1e-6 * L.sum(-1)

    bench("render_lanes full pass d4 (real rays)", full_pass)


if __name__ == "__main__":
    main()

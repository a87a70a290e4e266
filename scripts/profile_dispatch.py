"""Decompose the fused bounce_shade dispatch cost on-chip.

Answers (round 3, post-fusion): of the ~47 ms/bounce bounce_shade
dispatch at 2M lanes, how much is (a) the 4M-lane eval sorts, (b) the
Pallas segment kernel, (c) the tabulated sampling kernel, (d) each
analytic kernel's masked run-all trio, (e) dispatch bookkeeping
(take_rows + where-merges)?

Run: python -u scripts/profile_dispatch.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.models import bsdf as bsdf_mod, tabulated
from mitsuba_customization_tpu.models import diffuse, roughconductor
from mitsuba_customization_tpu.ops import merl_sorted
from mitsuba_customization_tpu.ops.onehot import take_rows

N = 1 << 21
K1, K2 = 2, 6
OUT = "PROFILE_dispatch_r03.json"
RESULTS = {"n_lanes": N, "device": None, "stages": {}}


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def unit_vec(i, c, s, n=N):
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
    RESULTS["device"] = str(jax.devices()[0])
    scene = _flagship_scene(res=64, spp=4, depth=4)
    table = scene.bsdfs
    rng = np.random.default_rng(0)
    mat_id = jnp.asarray(rng.integers(0, 3, N), dtype=jnp.int32)
    mat_tab = jnp.zeros((N,), jnp.int32)  # material 0 = merl sphere
    tab = table.stacks[bsdf_mod.TABULATED]
    slot0 = jnp.zeros(N, dtype=jnp.int32)
    ones_mask = jnp.ones(N, dtype=bool)

    def s2(i, c):
        return jnp.stack([rand01(i, c, 3), rand01(i, c, 4)], axis=-1)

    # --- raw sort costs ---
    key = jnp.asarray(rng.integers(0, 8100, 2 * N), dtype=jnp.int32)
    pay = jnp.asarray(rng.random(2 * N), dtype=jnp.float32)

    def sort4(c, i):
        k = key + (c[:4].sum() * 0).astype(jnp.int32)
        a, b, d, e = jax.lax.sort(
            [k, pay + rand01(i, c, 0)[0], pay, pay],
            dimension=0, num_keys=1, is_stable=False)
        return c * 0.999 + 1e-9 * (b[:N] + d[:N] + e[:N])

    bench("lax.sort 4M lanes 4-operand", sort4)

    def sort2(c, i):
        k = key + (c[:4].sum() * 0).astype(jnp.int32)
        a, b = jax.lax.sort(
            [k, pay + rand01(i, c, 0)[0]], dimension=0, num_keys=1,
            is_stable=False)
        return c * 0.999 + 1e-9 * b[:N]

    bench("lax.sort 4M lanes 2-operand", sort2)

    # --- eval_f production path, 4M lanes (the combined [nee;sampled]) ---
    def eval4m(c, i):
        wi = unit_vec(i, c, 0)
        wo = unit_vec(i, c, 3)
        wi2 = jnp.concatenate([wi, wi], axis=0)
        wo2 = jnp.concatenate([wo, -wo], axis=0)
        f2 = tabulated.eval_f(
            tab, wi2, wo2, slot=jnp.zeros(2 * N, jnp.int32),
            mask=jnp.ones(2 * N, bool))
        return c * 0.999 + 1e-6 * (f2[:N].sum(-1) + f2[N:].sum(-1))

    bench("tab eval_f 4M lanes (combined)", eval4m)

    # --- tabulated bounce_shade direct ---
    def tabbs(c, i):
        f_nee, p_nee, wo, p_s, w, d = tabulated.bounce_shade(
            tab, unit_vec(i, c, 0), unit_vec(i, c, 3), s2(i, c),
            rand01(i, c, 9), slot=slot0, mask=ones_mask,
            mask_nee=ones_mask)
        return c * 0.999 + 1e-6 * (
            f_nee.sum(-1) + p_nee + wo.sum(-1) + p_s + w.sum(-1))

    bench("tabulated.bounce_shade direct", tabbs)

    # --- full dispatch (3 kernels, mixed ids) ---
    def disp(c, i, mid):
        f_nee, p_nee, wo, p_s, w, d, fa = bsdf_mod.bounce_shade(
            table, mid, unit_vec(i, c, 0), unit_vec(i, c, 3), s2(i, c),
            rand01(i, c, 9), active=ones_mask)
        return c * 0.999 + 1e-6 * (
            f_nee.sum(-1) + p_nee + wo.sum(-1) + p_s + w.sum(-1))

    bench("dispatch bounce_shade (mixed ids)", lambda c, i: disp(c, i, mat_id))
    bench("dispatch bounce_shade (all-tab ids)",
          lambda c, i: disp(c, i, mat_tab))

    # --- analytic trios alone ---
    ggx = take_rows(
        jax.tree_util.tree_map(lambda x: x, table.stacks[
            bsdf_mod.ROUGHCONDUCTOR]), slot0
    ) if bsdf_mod.ROUGHCONDUCTOR in table.stacks else None
    if ggx is not None:
        def ggx_trio(c, i):
            wi = unit_vec(i, c, 0)
            wo, p, w, dlt = roughconductor.sample(ggx, wi, s2(i, c),
                                                  rand01(i, c, 9))
            f = roughconductor.eval(ggx, wi, unit_vec(i, c, 3))
            pp = roughconductor.pdf(ggx, wi, unit_vec(i, c, 3))
            return c * 0.999 + 1e-6 * (
                wo.sum(-1) + p + w.sum(-1) + f.sum(-1) + pp)

        bench("roughconductor trio (sample+eval+pdf)", ggx_trio)

    dif = take_rows(table.stacks[bsdf_mod.DIFFUSE], slot0)

    def dif_trio(c, i):
        wi = unit_vec(i, c, 0)
        wo, p, w, dlt = diffuse.sample(dif, wi, s2(i, c), rand01(i, c, 9))
        f = diffuse.eval(dif, wi, unit_vec(i, c, 3))
        pp = diffuse.pdf(dif, wi, unit_vec(i, c, 3))
        return c * 0.999 + 1e-6 * (
            wo.sum(-1) + p + w.sum(-1) + f.sum(-1) + pp)

    bench("diffuse trio (sample+eval+pdf)", dif_trio)

    # --- take_rows / bookkeeping ---
    def tr(c, i):
        t = take_rows(table.mat_type, mat_id)
        s = take_rows(table.mat_slot, mat_id)
        return c * 0.999 + 1e-6 * (t + s).astype(jnp.float32) + rand01(
            i, c, 0) * 1e-9

    bench("take_rows mat_type+mat_slot", tr)

    # --- marginal sampling kernel alone ---
    from mitsuba_customization_tpu.ops import marginal_sorted
    from mitsuba_customization_tpu.models.tabulated import (
        SAMPLE_RES_H, SAMPLE_RES_PHI, N_THETA_I)

    rr = jnp.asarray(rng.integers(0, SAMPLE_RES_H, N), dtype=jnp.int32)
    cc = jnp.asarray(rng.integers(0, SAMPLE_RES_PHI, N), dtype=jnp.int32)
    tb = jnp.asarray(rng.integers(0, N_THETA_I, N), dtype=jnp.int32)

    def marg(c, i):
        x, mo, mn, mc = marginal_sorted.cond_sample_pdf(
            tab.condT, SAMPLE_RES_H, tb, rand01(i, c, 2), rr, rr, cc, rr,
            cc, ones_mask)
        return c * 0.999 + 1e-6 * (x + mo + mn + mc)

    bench("marginal cond_sample_pdf kernel", marg)


if __name__ == "__main__":
    main()

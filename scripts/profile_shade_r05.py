"""Decompose bounce_shade (the per-bounce BSDF stage) on matpreview-like
lane distributions: tabulated (MERL) fused kernel vs its parts
(marginal_sorted conditional-CDF kernel, the combined 2N sorted eval) vs
the analytic kernels. Writes PROFILE_shade_r05.json."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 21


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(jnp.ravel(leaves[0])[:1]))


def timeit(fn, *args, n_iter=3, warm=1):
    for _ in range(warm):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        _force(fn(*args))
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    from __graft_entry__ import _matpreview_scene
    from mitsuba_customization_tpu.models import bsdf as bsdf_mod
    from mitsuba_customization_tpu.models import tabulated as tab_mod
    from mitsuba_customization_tpu.core.sampler import make_sampler

    rec = {"lanes": N}
    scene = _matpreview_scene(res=512, spp=8, depth=8, n_sub=5)
    print("built", flush=True)

    # synthetic matpreview-like lane distribution: ~45% MERL (10 slots),
    # ~40% GGX floor, rest dead; directions random hemisphere
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mat = scene.bsdfs.mat_type
    n_mats = int(mat.shape[0])
    merl_ids = [i for i in range(n_mats)
                if int(mat[i]) == bsdf_mod.TABULATED]
    ggx_ids = [i for i in range(n_mats)
               if int(mat[i]) == bsdf_mod.ROUGHCONDUCTOR]
    r = jax.random.uniform(k1, (N,))
    mat_id = jnp.where(
        r < 0.45,
        jnp.asarray(merl_ids)[
            (r * 1000).astype(jnp.int32) % len(merl_ids)
        ],
        jnp.asarray(ggx_ids[0], jnp.int32),
    )
    active = r < 0.85

    def hemi(k):
        u = jax.random.uniform(k, (N, 2))
        ct = jnp.sqrt(u[:, 0])
        st = jnp.sqrt(1 - u[:, 0] * u[:, 0])
        ph = 2 * jnp.pi * u[:, 1]
        return jnp.stack([st * jnp.cos(ph), st * jnp.sin(ph), ct], -1)

    wi = hemi(k2)
    wo_nee = hemi(k3)
    u2 = jax.random.uniform(k4, (N, 2))
    u1 = jax.random.uniform(k1, (N,))
    uv = jnp.zeros((N, 2))
    smp = make_sampler("independent", jnp.uint32(3),
                       jnp.arange(N, dtype=jnp.uint32),
                       jnp.zeros(N, jnp.uint32), 1)
    _force(wi)

    # ---- full fused dispatch (all kernels) ----
    @jax.jit
    def full_shade(sc, wi, wo_nee, u2, u1, mat_id, active):
        out = bsdf_mod.bounce_shade(
            sc.bsdfs, mat_id, wi, wo_nee, u2, u1, uv=uv,
            has_nee=True, active=active)
        return out[0], out[3]
    rec["bounce_shade_full_ms"] = timeit(
        full_shade, scene, wi, wo_nee, u2, u1, mat_id, active)
    print("bounce_shade_full_ms", rec["bounce_shade_full_ms"], flush=True)

    # ---- tabulated fused kernel only (mask = merl lanes) ----
    stack = scene.bsdfs.stacks[bsdf_mod.TABULATED]
    slot = scene.bsdfs.mat_slot[mat_id]
    is_merl = scene.bsdfs.mat_type[mat_id] == bsdf_mod.TABULATED

    @jax.jit
    def tab_only(stack, wi, wo_nee, u2, u1, slot, mask):
        out = tab_mod.bounce_shade(
            stack, wi, wo_nee, u2, u1, slot=slot, mask=mask,
            mask_nee=mask)
        return out[0], out[3]
    rec["tabulated_bounce_shade_ms"] = timeit(
        tab_only, stack, wi, wo_nee, u2, u1, slot, is_merl & active)
    print("tabulated_bounce_shade_ms", rec["tabulated_bounce_shade_ms"],
          flush=True)

    # ---- the combined sorted trilinear eval alone (2N lanes) ----
    from mitsuba_customization_tpu.ops import merl_sorted

    wi2 = jnp.concatenate([wi, wi], 0)
    wo2 = jnp.concatenate([wo_nee, hemi(k2)], 0)
    slot2 = jnp.concatenate([slot, slot], 0)
    mask2 = jnp.concatenate([is_merl & active] * 2, 0)

    @jax.jit
    def eval2n(stack, wi2, wo2, slot2, mask2):
        return merl_sorted.eval_sorted(
            stack.table, wi2, wo2, slot=slot2, mask=mask2,
            perm=stack.perm)
    rec["eval_sorted_2N_ms"] = timeit(
        eval2n, stack, wi2, wo2, slot2, mask2)
    print("eval_sorted_2N_ms", rec["eval_sorted_2N_ms"], flush=True)

    # ---- GGX analytic kernel alone on all lanes ----
    from mitsuba_customization_tpu.models import roughconductor as rc
    from mitsuba_customization_tpu.ops.onehot import gather_tree

    ggx_stack = scene.bsdfs.stacks[bsdf_mod.ROUGHCONDUCTOR]

    @jax.jit
    def ggx_only(stack, wi, wo_nee, u2, u1):
        params = gather_tree(stack, jnp.zeros(N, jnp.int32))
        wo, p, w, d = rc.sample(params, wi, u2, u1)
        f = rc.eval(params, wi, wo_nee)
        pp = rc.pdf(params, wi, wo_nee)
        return f, p + pp
    rec["ggx_kernel_ms"] = timeit(ggx_only, ggx_stack, wi, wo_nee, u2, u1)
    print("ggx_kernel_ms", rec["ggx_kernel_ms"], flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_shade_r05.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

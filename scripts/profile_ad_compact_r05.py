"""AD-mode compaction ablation (VERDICT r4 item 3): time one
loss-and-grad step of the matpreview-class inverse loop with per-bounce
compaction ON vs OFF. Writes PROFILE_adcompact_r05.json."""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _matpreview_scene
from bench import _probe_compact_schedule
from mitsuba_customization_tpu.render import params as params_mod
from mitsuba_customization_tpu.render.integrator import render


def timeit(fn, *args, n_iter=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    rec = {}
    spp = 4
    base = _matpreview_scene(res=256, spp=spp, depth=6, n_sub=5)
    withc, fracs = _probe_compact_schedule(base, spp=4)
    rec["schedule"] = [round(f, 3) for f in fracs]
    noc = dataclasses.replace(
        base, config=dataclasses.replace(withc.config, compact=None)
    )
    target = jnp.zeros((256, 256, 3))
    full = params_mod.traverse(base)
    p0 = {"bsdf.tabulated.table": full["bsdf.tabulated.table"]}

    def make_step(scene):
        @jax.jit
        def step(p, seed):
            def loss_fn(p):
                sc = params_mod.update(scene, p)
                img = render(sc, spp=spp, seed=seed, ad_mode=True)
                return jnp.mean((img - target) ** 2)
            return jax.value_and_grad(loss_fn)(p)
        return step

    s_on = make_step(withc)
    s_off = make_step(noc)
    l_on, g_on = s_on(p0, jnp.uint32(1))
    l_off, g_off = s_off(p0, jnp.uint32(1))
    go = np.asarray(g_on["bsdf.tabulated.table"]).ravel()
    gf = np.asarray(g_off["bsdf.tabulated.table"]).ravel()
    nz = np.abs(gf) > 1e-10
    corr = float(np.corrcoef(go[nz], gf[nz])[0, 1]) if nz.any() else 1.0
    rec["grad_corr_on_vs_off"] = corr
    rec["loss_on"] = float(l_on)
    rec["loss_off"] = float(l_off)
    print("grad corr", corr, "losses", rec["loss_on"], rec["loss_off"],
          flush=True)

    rec["step_ms_compact_on"] = timeit(s_on, p0, jnp.uint32(2))
    print("on", rec["step_ms_compact_on"], flush=True)
    rec["step_ms_compact_off"] = timeit(s_off, p0, jnp.uint32(2))
    print("off", rec["step_ms_compact_off"], flush=True)
    rec["speedup"] = rec["step_ms_compact_off"] / rec["step_ms_compact_on"]

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_adcompact_r05.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

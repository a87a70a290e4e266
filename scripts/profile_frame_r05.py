"""In-situ frame decomposition of matpreview: depth sweep + stage
knockouts (shadow test forced transparent, MERL swapped for diffuse).
Unlike the standalone stage timings (profile_stage_r05.py), these measure
each subsystem's contribution INSIDE the fused frame, where XLA overlaps
and fusions apply. Writes PROFILE_frame_r05.json."""

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

SPP = 8


def timeit(fn, *args, n_iter=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
        float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
        float(jnp.sum(out))
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    from mitsuba_customization_tpu.render.integrator import render

    rec = {}
    scene = _matpreview_scene(res=512, spp=SPP, depth=8, n_sub=5)
    scene, fracs = _probe_compact_schedule(scene, spp=4)
    print("built; schedule", [round(f, 3) for f in fracs], flush=True)

    import dataclasses

    for depth in (1, 2, 4, 8):
        sc_d = dataclasses.replace(
            scene, config=dataclasses.replace(scene.config, max_depth=depth)
        )
        f = jax.jit(lambda sc, s, _d=depth: render(
            sc, spp=SPP, seed=s, max_depth=_d))
        rec[f"frame_depth{depth}_ms"] = timeit(f, sc_d, jnp.uint32(1))
        print(f"frame_depth{depth}_ms", rec[f"frame_depth{depth}_ms"],
              flush=True)

    # ---- knockout: shadow rays free (ray_test -> False) ----
    from mitsuba_customization_tpu.render import scene as scene_mod

    orig_ray_test = scene_mod.Scene.ray_test
    scene_mod.Scene.ray_test = lambda self, ray: (
        jnp.zeros(ray.maxt.shape, bool)
    )
    try:
        f = jax.jit(lambda sc, s: render(sc, spp=SPP, seed=s))
        rec["frame_noshadow_ms"] = timeit(f, scene, jnp.uint32(1))
        print("frame_noshadow_ms", rec["frame_noshadow_ms"], flush=True)
    finally:
        scene_mod.Scene.ray_test = orig_ray_test

    # ---- knockout: closest-hit replaced by primary-only cache? too
    # invasive; instead: diffuse-only materials (kills the MERL kernels)
    sc_diff = _matpreview_scene(res=512, spp=SPP, depth=8, n_sub=5,
                                n_materials=1)
    # swap every MERL band for plain diffuse by rebuilding the dict is
    # expensive; cheap proxy: compare n_materials=1 (one MERL) vs 10
    sc_diff, _ = _probe_compact_schedule(sc_diff, spp=4)
    f = jax.jit(lambda sc, s: render(sc, spp=SPP, seed=s))
    rec["frame_1merl_ms"] = timeit(f, sc_diff, jnp.uint32(1))
    print("frame_1merl_ms", rec["frame_1merl_ms"], flush=True)

    # ---- reference full frame (post env/dirarea gating) ----
    f = jax.jit(lambda sc, s: render(sc, spp=SPP, seed=s))
    rec["frame_full_ms"] = timeit(f, scene, jnp.uint32(2))
    print("frame_full_ms", rec["frame_full_ms"], flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_frame_r05.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

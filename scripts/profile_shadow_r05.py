"""Any-hit (shadow) kernel sweep on matpreview bounce-0 NEE rays:
tile_rows x {entry-ordered, linear} visit order. Appends to
PROFILE_shadow_r05.json."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _matpreview_scene
from mitsuba_customization_tpu.core.sampler import make_sampler
from mitsuba_customization_tpu.ops import clusters as cl_mod
from mitsuba_customization_tpu.render import emitters as em_mod
from mitsuba_customization_tpu.render import geometry as geo
from mitsuba_customization_tpu.render import integrator as integ
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.render.sensors import sample_ray

RES, SPP = 512, 8
N = RES * RES * SPP


def _force(x):
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1]))


def timeit(fn, *args, n_iter=3, warm=1):
    for _ in range(warm):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        _force(fn(*args))
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    rec = {}
    scene = _matpreview_scene(res=RES, spp=SPP, depth=8, n_sub=5)
    cfg = scene.config
    block = 16
    order = np.arange(RES * RES, dtype=np.uint32).reshape(
        RES // block, block, RES // block, block
    ).transpose(0, 2, 1, 3).reshape(-1)
    pixel = jnp.repeat(jnp.asarray(order), SPP, total_repeat_length=N)
    sidx = jnp.tile(jnp.arange(SPP, dtype=jnp.uint32), RES * RES)
    smp = make_sampler(cfg.sampler, jnp.uint32(7), pixel, sidx, SPP)

    @jax.jit
    def shadow_rays(scene):
        s = make_sampler(cfg.sampler, jnp.uint32(7), pixel, sidx, SPP)
        jitter = s.next_2d()
        ap = s.next_2d()
        px = (pixel % jnp.uint32(RES)).astype(jnp.float32)
        py = (pixel // jnp.uint32(RES)).astype(jnp.float32)
        film_uv = (jnp.stack([px, py], -1) + jitter) / RES
        ray0 = sample_ray(scene.sensor, film_uv, ap, 1.0)
        si = scene.ray_intersect(ray0)
        s_nee = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS + integ._OFF_NEE))
        u3 = jnp.stack([s_nee.next_1d(), s_nee.next_1d(), s_nee.next_1d()],
                       -1)
        ds = em_mod.sample_direction(scene.emitters, scene.geometry, si.p, u3)
        o = geo.spawn_ray(si, ds.d).o
        nee_ok = si.valid & (ds.pdf > 0.0) & (
            si.to_local(ds.d)[..., 2] > 0.0
        )
        maxt = jnp.where(nee_ok,
                         jnp.where(jnp.isinf(ds.dist), 1e30,
                                   ds.dist * (1 - 1e-3)), 0.0)
        return Ray(o=o, d=ds.d, maxt=maxt)

    sh = shadow_rays(scene)
    _force(sh.o)
    rec["live_frac"] = float(jnp.mean(sh.maxt > 0))
    print("live", rec["live_frac"], flush=True)

    for tr in (8, 16, 32):
        f = jax.jit(lambda sc, r, _t=tr: cl_mod.occluded(
            sc.shadow_clusters or sc.clusters, r, tile_rows=_t))
        rec[f"shadow_tr{tr}_ms"] = timeit(f, scene, sh)
        print(f"shadow_tr{tr}_ms", rec[f"shadow_tr{tr}_ms"], flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_shadow_r05.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

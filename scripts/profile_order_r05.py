"""Measure the round-5 ordered-descent cluster kernels on matpreview.

Times closest (primary / bounce-1 unsorted / sorted, tile_rows sweep) and
the any-hit kernel (mixed NEE / area-only / sky-only shadow rays) after
the entry-ordered descent + early-out rewrite. Appends results to
PROFILE_order_r05.json.
"""

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
from mitsuba_customization_tpu.models import bsdf as bsdf_mod
from mitsuba_customization_tpu.ops import clusters as cl_mod
from mitsuba_customization_tpu.render import emitters as em_mod
from mitsuba_customization_tpu.render import geometry as geo
from mitsuba_customization_tpu.render import integrator as integ
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.render.sensors import sample_ray

RES = 512
SPP = 8
N = RES * RES * SPP


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
    rec = {"lanes": N}
    scene = _matpreview_scene(res=RES, spp=SPP, depth=8, n_sub=5)
    print("built", int(scene.geometry.n_prims), scene.config.intersector,
          "n_super", int(scene.clusters.n_super), flush=True)

    cfg = scene.config
    block = 16
    order = np.arange(RES * RES, dtype=np.uint32).reshape(
        RES // block, block, RES // block, block
    ).transpose(0, 2, 1, 3).reshape(-1)
    pixel = jnp.repeat(jnp.asarray(order), SPP, total_repeat_length=N)
    sidx = jnp.tile(jnp.arange(SPP, dtype=jnp.uint32), RES * RES)
    smp = make_sampler(cfg.sampler, jnp.uint32(7), pixel, sidx, SPP)

    @jax.jit
    def gen(scene):
        s = make_sampler(cfg.sampler, jnp.uint32(7), pixel, sidx, SPP)
        jitter = s.next_2d()
        ap = s.next_2d()
        px = (pixel % jnp.uint32(RES)).astype(jnp.float32)
        py = (pixel // jnp.uint32(RES)).astype(jnp.float32)
        film_uv = (jnp.stack([px, py], -1) + jitter) / RES
        return sample_ray(scene.sensor, film_uv, ap, 1.0)

    ray0 = gen(scene)
    _force(ray0.o)

    @jax.jit
    def bounce0(scene, ray0):
        si = scene.ray_intersect(ray0)
        s = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS))
        s_nee = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS + integ._OFF_NEE))
        u2 = s.next_2d()
        u_lobe = s.next_1d()
        u3 = jnp.stack([s_nee.next_1d(), s_nee.next_1d(), s_nee.next_1d()], -1)
        ds = em_mod.sample_direction(scene.emitters, scene.geometry, si.p, u3)
        wo_nee = si.to_local(ds.d)
        active = si.valid
        _, _, wo, p_s, _, _, _ = bsdf_mod.bounce_shade(
            scene.bsdfs, si.mat_id, si.wi, wo_nee, u2, u_lobe,
            uv=si.uv, has_nee=True, active=active)
        nray = geo.spawn_ray(si, si.to_world(wo))
        shadow_o = geo.spawn_ray(si, ds.d).o
        maxt = jnp.where(jnp.isinf(ds.dist), 1e30, ds.dist * (1 - 1e-3))
        nee_ok = active & (ds.pdf > 0.0)
        maxt = jnp.where(nee_ok, maxt, 0.0)
        act1 = active & (p_s > 0.0)
        sky = jnp.isinf(ds.dist)
        return (Ray(o=shadow_o, d=ds.d, maxt=maxt), sky,
                Ray(o=nray.o, d=nray.d,
                    maxt=jnp.where(act1, jnp.inf, 0.0)), act1)

    shadow0, sky0, ray1, act1 = bounce0(scene, ray0)
    _force(ray1.o)

    f_int = jax.jit(lambda sc, r: sc.ray_intersect(r).t)
    rec["primary_ms"] = timeit(f_int, scene, ray0)
    print("primary_ms", rec["primary_ms"], flush=True)

    rec["shadow_b0_mixed_ms"] = timeit(
        jax.jit(lambda sc, r: sc.ray_test(r)), scene, shadow0)
    print("shadow_b0_mixed_ms", rec["shadow_b0_mixed_ms"], flush=True)

    area_only = Ray(o=shadow0.o, d=shadow0.d,
                    maxt=jnp.where(sky0, 0.0, shadow0.maxt))
    sky_only = Ray(o=shadow0.o, d=shadow0.d,
                   maxt=jnp.where(sky0, shadow0.maxt, 0.0))
    rec["shadow_b0_area_ms"] = timeit(
        jax.jit(lambda sc, r: sc.ray_test(r)), scene, area_only)
    rec["shadow_b0_sky_ms"] = timeit(
        jax.jit(lambda sc, r: sc.ray_test(r)), scene, sky_only)
    print("area/sky", rec["shadow_b0_area_ms"], rec["shadow_b0_sky_ms"],
          flush=True)

    rec["bounce1_unsorted_ms"] = timeit(f_int, scene, ray1)
    print("bounce1_unsorted_ms", rec["bounce1_unsorted_ms"], flush=True)

    # spatially sorted bounce rays (the integrator's per-bounce order)
    sc_box = scene.clusters.sc_box
    s_lo = jnp.min(sc_box[:, 0:3], axis=0)
    s_hi = jnp.max(sc_box[:, 3:6], axis=0)
    s_span = jnp.maximum(s_hi - s_lo, 1e-6)

    @jax.jit
    def sort_rays(ray, act):
        oct_ = ((ray.d[:, 0] > 0).astype(jnp.int32)
                + 2 * (ray.d[:, 1] > 0).astype(jnp.int32)
                + 4 * (ray.d[:, 2] > 0).astype(jnp.int32))
        cell = jnp.clip(((ray.o - s_lo) / s_span * 127.99).astype(jnp.int32),
                        0, 127)

        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x
        mkey = (spread(cell[:, 0]) | (spread(cell[:, 1]) << 1)
                | (spread(cell[:, 2]) << 2))
        key = jnp.where(act, (oct_ << 21) | mkey, jnp.int32(1 << 25))
        s = jax.lax.sort(
            [key, ray.o[:, 0], ray.o[:, 1], ray.o[:, 2],
             ray.d[:, 0], ray.d[:, 1], ray.d[:, 2], ray.maxt],
            dimension=0, num_keys=1, is_stable=False)
        return Ray(o=jnp.stack(s[1:4], -1), d=jnp.stack(s[4:7], -1),
                   maxt=s[7])

    ray1s = sort_rays(ray1, act1)
    _force(ray1s.o)
    for tr in (8, 16, 32):
        f = jax.jit(lambda sc, r, _tr=tr: cl_mod.intersect(
            sc.clusters, r, tile_rows=_tr)[0])
        rec[f"bounce1_sorted_tr{tr}_ms"] = timeit(f, scene, ray1s)
        print(f"bounce1_sorted_tr{tr}_ms", rec[f"bounce1_sorted_tr{tr}_ms"],
              flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE_order_r05.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

"""Cluster-kernel visit-cost decomposition (round-5).

Times the closest-hit Pallas kernel on the matpreview primary and
(spatially sorted) bounce-1 wavefronts with kernel stages ablated
(ops/clusters._closest_kernel `ablate` bits) to locate the per-visit
cost: slab DMA wait vs 32-slot intersection math vs box tests vs the
winner-field walk. Drives the choice between double-buffered DMA and an
MXU reformulation of the slot tests. Writes PROFILE_visit_r05.json.
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
    for leaf in leaves[:1]:
        np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timeit(fn, *args, n_iter=3, warm=1):
    for _ in range(warm):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        _force(fn(*args))
    return (time.perf_counter() - t0) / n_iter * 1e3


def blocked_pixel_order(rows, w, chunk, block=16):
    order = np.arange(rows * w, dtype=np.uint32).reshape(
        rows // block, block, w // block, block
    ).transpose(0, 2, 1, 3).reshape(-1)
    pixel = jnp.repeat(jnp.asarray(order), chunk,
                       total_repeat_length=rows * w * chunk)
    sidx = jnp.tile(jnp.arange(chunk, dtype=jnp.uint32), rows * w)
    return pixel, sidx


def main():
    rec = {"lanes": N}
    scene = _matpreview_scene(res=RES, spp=SPP, depth=8, n_sub=5)
    cfg = scene.config
    pixel, sidx = blocked_pixel_order(RES, RES, SPP)
    smp = make_sampler(cfg.sampler, jnp.uint32(7), pixel, sidx, SPP)

    @jax.jit
    def gen_primary(scene):
        s = make_sampler(cfg.sampler, jnp.uint32(7), pixel, sidx, SPP)
        jitter = s.next_2d()
        ap = s.next_2d()
        px = (pixel % jnp.uint32(RES)).astype(jnp.float32)
        py = (pixel // jnp.uint32(RES)).astype(jnp.float32)
        film_uv = (jnp.stack([px, py], -1) + jitter) / RES
        return sample_ray(scene.sensor, film_uv, ap, 1.0)

    ray0 = gen_primary(scene)
    _force(ray0.o)

    @jax.jit
    def bounce0(scene, ray0):
        si = scene.ray_intersect(ray0)
        s = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS))
        s_nee = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS + integ._OFF_NEE))
        u2 = s.next_2d()
        u_lobe = s.next_1d()
        u3 = jnp.stack([s_nee.next_1d()] * 3, -1)
        ds = em_mod.sample_direction(scene.emitters, scene.geometry, si.p, u3)
        wo_nee = si.to_local(ds.d)
        active = si.valid
        _f, _p, wo, p_s, _w, _d, _a = bsdf_mod.bounce_shade(
            scene.bsdfs, si.mat_id, si.wi, wo_nee, u2, u_lobe,
            uv=si.uv, has_nee=True, active=active)
        d_world = si.to_world(wo)
        nray = geo.spawn_ray(si, d_world)
        act1 = active & (p_s > 0.0)
        return Ray(o=nray.o, d=nray.d,
                   maxt=jnp.where(act1, jnp.inf, 0.0)), act1

    ray1, act1 = bounce0(scene, ray0)
    _force(ray1.o)

    # spatial (octant, morton) sort of the bounce rays, as the compacting
    # runner orders them
    sc_box = scene.clusters.sc_box
    s_lo = jnp.min(sc_box[:, 0:3], axis=0)
    s_span = jnp.maximum(jnp.max(sc_box[:, 3:6], 0) - s_lo, 1e-6)

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
        ops = jax.lax.sort(
            [key, ray.o[:, 0], ray.o[:, 1], ray.o[:, 2],
             ray.d[:, 0], ray.d[:, 1], ray.d[:, 2], ray.maxt],
            dimension=0, num_keys=1, is_stable=False)
        return Ray(o=jnp.stack(ops[1:4], -1), d=jnp.stack(ops[4:7], -1),
                   maxt=ops[7])

    ray1s = sort_rays(ray1, act1)
    _force(ray1s.o)

    variants = {
        "full": 0,
        "no_dma": 1,
        "no_slots": 2,
        "no_winner": 4,
        "no_slots_no_winner": 6,
        "boxes_only": 7,
    }
    for name, rays in (("primary", ray0), ("bounce1s", ray1s)):
        for vn, bits in variants.items():
            f = jax.jit(
                lambda sc, r, _b=bits: cl_mod.intersect(
                    sc.clusters, r, tile_rows=32, ablate=_b)[0]
            )
            rec[f"{name}_{vn}_ms"] = timeit(f, scene, rays)
            print(name, vn, round(rec[f"{name}_{vn}_ms"], 2), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_visit_r05.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

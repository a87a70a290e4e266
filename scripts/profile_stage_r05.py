"""Round-5 stage profile of the matpreview (BASELINE north-star) frame.

Decomposes one 2M-lane (512x512 @ 8spp) depth-8 frame into its stage
costs — primary/bounce intersects, shadow tests, bounce_shade (10 MERL +
GGX dispatch), emitter work, the compaction sort, and film develop — so
round-5 optimization attacks the measured maxima instead of guesses.
Writes PROFILE_stage_r05.json.

Method: every stage is jitted standalone and fed realistic device inputs
captured from the real frame (bounce-1 rays come from actually running
bounce 0). Completion is forced through a scalar host fetch (the axon
tunnel's block_until_ready caveat — see bench.py).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _matpreview_scene
from mitsuba_customization_tpu.core.sampler import make_sampler
from mitsuba_customization_tpu.models import bsdf as bsdf_mod
from mitsuba_customization_tpu.models.normalmap import apply_normal_maps
from mitsuba_customization_tpu.render import emitters as em_mod
from mitsuba_customization_tpu.render import film as film_mod
from mitsuba_customization_tpu.render import geometry as geo
from mitsuba_customization_tpu.render import integrator as integ
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.render.sensors import sample_ray

RES = 512
SPP = 8
DEPTH = 8
N = RES * RES * SPP  # 2,097,152 lanes


def timeit(fn, *args, n_iter=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
        _force(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / n_iter * 1e3  # ms


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    # reduce-to-scalar fetch forces completion on the axon tunnel
    float(jnp.sum(leaves[0].astype(jnp.float32) * 0 + 1) + 0.0) if leaves else None
    for leaf in leaves[:1]:
        np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def blocked_pixel_order(rows, w, chunk, block=16):
    order = np.arange(rows * w, dtype=np.uint32).reshape(
        rows // block, block, w // block, block
    ).transpose(0, 2, 1, 3).reshape(-1)
    pixel = jnp.repeat(jnp.asarray(order), chunk,
                       total_repeat_length=rows * w * chunk)
    sidx = jnp.tile(jnp.arange(chunk, dtype=jnp.uint32), rows * w)
    return pixel, sidx


def main():
    rec = {"device": str(jax.devices()[0]), "lanes": N}
    scene = _matpreview_scene(res=RES, spp=SPP, depth=DEPTH, n_sub=5)
    print("scene built:", scene.geometry.n_prims, "prims,",
          scene.config.intersector)

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

    # ---- stage: primary closest-hit (blocked order) ----
    f_int = jax.jit(lambda sc, r: sc.ray_intersect(r).t)
    rec["primary_intersect_ms"] = timeit(f_int, scene, ray0)
    print("primary_intersect_ms", rec["primary_intersect_ms"])
    from mitsuba_customization_tpu.ops import clusters as cl_mod

    f_int32 = jax.jit(
        lambda sc, r: cl_mod.intersect(sc.clusters, r, tile_rows=32)[0]
    )
    rec["primary_intersect_tr32_ms"] = timeit(f_int32, scene, ray0)
    print("primary_intersect_tr32_ms", rec["primary_intersect_tr32_ms"])

    # ---- capture bounce-0 products (si, NEE dir, wo, next ray) ----
    @jax.jit
    def bounce0(scene, ray0):
        si = scene.ray_intersect(ray0)
        si = apply_normal_maps(scene.bsdfs, si)
        s = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS))
        s_nee = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS + integ._OFF_NEE))
        u2 = s.next_2d()
        u_lobe = s.next_1d()
        u3 = jnp.stack([s_nee.next_1d(), s_nee.next_1d(), s_nee.next_1d()], -1)
        ds = em_mod.sample_direction(scene.emitters, scene.geometry, si.p, u3)
        wo_nee = si.to_local(ds.d)
        active = si.valid
        f_nee, p_nee, wo, p_s, w, is_d, _ = bsdf_mod.bounce_shade(
            scene.bsdfs, si.mat_id, si.wi, wo_nee, u2, u_lobe,
            uv=si.uv, has_nee=True, active=active)
        d_world = si.to_world(wo)
        nray = geo.spawn_ray(si, d_world)
        shadow = Ray(o=geo.spawn_ray(si, ds.d).o, d=ds.d,
                     maxt=jnp.where(jnp.isinf(ds.dist), 1e30,
                                    ds.dist * (1 - 1e-3)))
        act1 = active & (p_s > 0.0)
        return (si, ds, wo_nee, u2, u_lobe, shadow,
                Ray(o=nray.o, d=nray.d, maxt=jnp.full((N,), jnp.inf)), act1)

    (si0, ds0, wo_nee0, u2_0, ul_0, shadow0, ray1, act1) = bounce0(scene, ray0)
    _force(ray1.o)
    frac1 = float(jnp.mean(act1))
    rec["bounce1_live_frac"] = frac1
    print("live frac entering bounce 1:", frac1)

    # ---- stage: emitter work (sample_direction + hit eval/pdf) ----
    @jax.jit
    def emwork(scene, si, ray):
        s_nee = smp.with_dim(jnp.uint32(integ.CAMERA_DIMS + integ._OFF_NEE))
        u3 = jnp.stack([s_nee.next_1d(), s_nee.next_1d(), s_nee.next_1d()], -1)
        ds = em_mod.sample_direction(scene.emitters, scene.geometry, si.p, u3)
        hr = em_mod.eval_hit(scene.emitters, si)
        hp = em_mod.pdf_hit_direction(scene.emitters, scene.geometry, si, ray.o)
        br = em_mod.eval_background(scene.emitters, ray.d)
        bp = em_mod.pdf_miss_direction(scene.emitters, ray.d)
        return ds.pdf + hp + bp, hr + br
    rec["emitter_work_ms"] = timeit(emwork, scene, si0, ray0)
    print("emitter_work_ms", rec["emitter_work_ms"])

    # ---- stage: bounce_shade on the b0 distribution ----
    @jax.jit
    def shade(scene, si, wo_nee, u2, ul, active):
        out = bsdf_mod.bounce_shade(
            scene.bsdfs, si.mat_id, si.wi, wo_nee, u2, ul,
            uv=si.uv, has_nee=True, active=active)
        return out[0], out[3]
    rec["bounce_shade_ms"] = timeit(shade, scene, si0, wo_nee0, u2_0, ul_0,
                                    si0.valid)
    print("bounce_shade_ms", rec["bounce_shade_ms"])

    # ---- stage: shadow test b0 ----
    f_sh = jax.jit(lambda sc, r: sc.ray_test(r))
    rec["shadow_b0_ms"] = timeit(f_sh, scene, shadow0)
    print("shadow_b0_ms", rec["shadow_b0_ms"])

    # ---- stage: bounce-1 intersect, unsorted lane order ----
    rec["bounce1_intersect_unsorted_ms"] = timeit(f_int, scene, ray1)
    print("bounce1_intersect_unsorted_ms", rec["bounce1_intersect_unsorted_ms"])

    # ---- stage: the 16-operand compaction sort at 2M (what
    # _run_bounces_compact actually pays entering bounce 1) ----
    sc_box = scene.clusters.sc_box
    s_lo = jnp.min(sc_box[:, 0:3], axis=0)
    s_hi = jnp.max(sc_box[:, 3:6], axis=0)
    s_span = jnp.maximum(s_hi - s_lo, 1e-6)

    def spatial_key(o3, d3):
        oct_ = ((d3[:, 0] > 0).astype(jnp.int32)
                + 2 * (d3[:, 1] > 0).astype(jnp.int32)
                + 4 * (d3[:, 2] > 0).astype(jnp.int32))
        cell = jnp.clip(((o3 - s_lo) / s_span * 127.99).astype(jnp.int32),
                        0, 127)

        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x
        m = (spread(cell[:, 0]) | (spread(cell[:, 1]) << 1)
             | (spread(cell[:, 2]) << 2))
        return (oct_ << 21) | m

    @jax.jit
    def compact_sort16(ray, act):
        key = jnp.where(act, spatial_key(ray.o, ray.d), jnp.int32(1 << 25))
        tag = jnp.arange(N, dtype=jnp.int32)
        z = ray.o[:, 0] * 0.0
        ops = [key, tag,
               ray.o[:, 0], ray.o[:, 1], ray.o[:, 2],
               ray.d[:, 0], ray.d[:, 1], ray.d[:, 2],
               ray.maxt, z, z, z, z, z, z, z, pixel, sidx]
        s = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=False)
        return s[2] + s[3]
    rec["compact_sort18ops_2M_ms"] = timeit(compact_sort16, ray1, act1)
    print("compact_sort18ops_2M_ms", rec["compact_sort18ops_2M_ms"])

    # ---- stage: bounce-1 intersect on spatially sorted rays ----
    @jax.jit
    def sort_rays(ray, act):
        key = jnp.where(act, spatial_key(ray.o, ray.d), jnp.int32(1 << 25))
        s = jax.lax.sort(
            [key, ray.o[:, 0], ray.o[:, 1], ray.o[:, 2],
             ray.d[:, 0], ray.d[:, 1], ray.d[:, 2], ray.maxt],
            dimension=0, num_keys=1, is_stable=False)
        return Ray(o=jnp.stack(s[1:4], -1), d=jnp.stack(s[4:7], -1),
                   maxt=s[7])
    ray1_sorted = sort_rays(ray1, act1)
    _force(ray1_sorted.o)
    rec["bounce1_intersect_sorted_ms"] = timeit(f_int, scene, ray1_sorted)
    print("bounce1_intersect_sorted_ms", rec["bounce1_intersect_sorted_ms"])

    # sorted + compacted to 70% cap (what bounce 1 actually runs on)
    cap1 = int(N * 0.70) // 2048 * 2048
    ray1_cap = Ray(o=ray1_sorted.o[:cap1], d=ray1_sorted.d[:cap1],
                   maxt=ray1_sorted.maxt[:cap1])
    rec["bounce1_intersect_sorted_cap70_ms"] = timeit(f_int, scene, ray1_cap)
    print("bounce1_intersect_sorted_cap70_ms",
          rec["bounce1_intersect_sorted_cap70_ms"])

    # ---- stage: film develop (box, blocked) + final unsort ----
    @jax.jit
    def film_unsort(L3, tag):
        _, r, g, b = jax.lax.sort([tag, L3[:, 0], L3[:, 1], L3[:, 2]],
                                  dimension=0, num_keys=1, is_stable=False)
        L = jnp.stack([r, g, b], -1)
        return film_mod.develop_box_blocked(L, RES, RES, SPP, 16)
    L3 = jnp.abs(ray1.o)
    tag = jnp.arange(N, dtype=jnp.int32)
    rec["film_unsort_develop_ms"] = timeit(film_unsort, L3, tag)
    print("film_unsort_develop_ms", rec["film_unsort_develop_ms"])

    # ---- full frame for reconciliation ----
    import dataclasses
    from mitsuba_customization_tpu.render.integrator import render

    @jax.jit
    def full(scene, seed):
        img, st = render(scene, spp=SPP, seed=seed, return_stats=True)
        return img.sum(), st["rays_traced"]

    # probed compaction schedule, as bench.py uses
    from bench import _probe_compact_schedule
    scene_c, fracs = _probe_compact_schedule(scene, spp=4)
    rec["compact_schedule"] = [round(f, 4) for f in fracs]
    s, rays = full(scene_c, jnp.uint32(0))
    float(s)
    t0 = time.perf_counter()
    n_it = 3
    tot = 0.0
    for i in range(n_it):
        s, rays = full(scene_c, jnp.uint32(i + 1))
        float(s)
        tot += float(rays)
    dt = (time.perf_counter() - t0) / n_it
    rec["full_frame_ms"] = dt * 1e3
    rec["rays_per_frame"] = tot / n_it
    rec["rays_per_s"] = tot / n_it / dt
    print("full_frame_ms", rec["full_frame_ms"], "rays/s", rec["rays_per_s"])

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE_stage_r05.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

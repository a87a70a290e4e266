"""On-chip profile: ray intersection on the configs[4]-class mesh scene.

Round-3 verdict missing item 2: the BVH (render/bvh.py skip-link
lock-step traversal) had never run on the TPU hot path — the flagship
scene sits under the brute-force threshold. This script measures, on the
real chip, per-wavefront cost of:

  * closest-hit `scene.ray_intersect` on coherent primary rays,
  * closest-hit on incoherent (hemisphere-bounce) rays,
  * any-hit `scene.ray_test` shadow rays toward the area light,

at growing wavefront sizes, writing results incrementally to
PROFILE_mesh_r04.json (tunnel runs can die; partial data must survive).

Usage: python scripts/profile_mesh.py [--nsub 5] [--maxn 21]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PROFILE_mesh_r04.json",
)
RESULTS = {}


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def timeit(f, *args, n=3):
    o = f(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
        # axon tunnel: block_until_ready is unreliable; force via host fetch
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), o
        )
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsub", type=int, default=5)
    ap.add_argument("--maxn", type=int, default=20)
    ap.add_argument("--skip-slow", action="store_true")
    args = ap.parse_args()

    from __graft_entry__ import _matpreview_scene
    from mitsuba_customization_tpu.render.records import Ray
    from mitsuba_customization_tpu.render.sensors import sample_ray

    t0 = time.time()
    scene = _matpreview_scene(res=512, spp=16, depth=8, n_sub=args.nsub)
    RESULTS["device"] = str(jax.devices()[0])
    RESULTS["n_prims"] = int(scene.geometry.n_prims)
    RESULTS["bvh_nodes"] = int(scene.bvh.n_nodes) if scene.bvh else 0
    RESULTS["build_s"] = round(time.time() - t0, 1)
    save()
    print("scene built:", RESULTS, flush=True)

    def primaries(n):
        """Blocked-coherent primary rays (the render loop's lane order)."""
        lanes = jnp.arange(n, dtype=jnp.uint32)
        spp = max(1, n // (512 * 512))
        pixel = lanes // spp
        w = 512
        px = (pixel % w).astype(jnp.float32) + 0.5
        py = (pixel // w).astype(jnp.float32) + 0.5
        uv = jnp.stack([px / w, py / w], axis=-1)
        ap2 = jnp.zeros((n, 2))
        return sample_ray(scene.sensor, uv, ap2, 1.0)

    def bounce_rays(n, seed=7):
        """Incoherent rays: origins at primary hits, directions uniform
        hemisphere (worst-case divergence for the traversal)."""
        r = jax.jit(primaries, static_argnums=0)(n)
        si = jax.jit(lambda rr: scene.ray_intersect(rr))(r)
        k = np.random.RandomState(seed)
        d = k.randn(n, 3).astype(np.float32)
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        dj = jnp.asarray(d)
        flip = jnp.sum(dj * si.n, axis=-1, keepdims=True) < 0
        dj = jnp.where(flip, -dj, dj)
        o = jnp.where(si.valid[..., None], si.p + 1e-3 * dj, r.o)
        return Ray.make(o, dj)

    def shadow_rays(n):
        r = primaries(n)
        si = scene.ray_intersect(r)
        target = jnp.asarray([1.5, 3.2, -1.0])
        d = target - si.p
        dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = d / jnp.maximum(dist, 1e-6)
        o = si.p + 1e-3 * d
        return Ray(o=o, d=d, maxt=dist[..., 0] * 0.999)

    import dataclasses

    def with_mode(mode):
        return dataclasses.replace(
            scene, config=dataclasses.replace(scene.config, intersector=mode)
        )

    sc_cluster = with_mode("cluster")
    sc_bvh = with_mode("bvh")

    # correctness cross-check at 64K lanes: cluster kernel vs skip-link
    n0 = 1 << 16
    ray0 = jax.jit(primaries, static_argnums=0)(n0)
    t_cl = jax.device_get(
        jax.jit(lambda r: sc_cluster.ray_intersect(r).t)(ray0)
    )
    t_bv = jax.device_get(jax.jit(lambda r: sc_bvh.ray_intersect(r).t)(ray0))
    both = np.isfinite(t_cl) & np.isfinite(t_bv)
    RESULTS["xcheck_hit_agree"] = float(
        (np.isfinite(t_cl) == np.isfinite(t_bv)).mean()
    )
    RESULTS["xcheck_t_maxerr"] = float(
        np.abs(t_cl[both] - t_bv[both]).max() if both.any() else -1
    )
    save()
    print("cross-check:", RESULTS["xcheck_hit_agree"],
          RESULTS["xcheck_t_maxerr"], flush=True)

    plans = [("cluster", sc_cluster, range(16, args.maxn + 1, 2))]
    if not args.skip_slow:
        plans.append(("bvh", sc_bvh, [16]))
    for mode, sc, logns in plans:
        isect = jax.jit(lambda r, sc=sc: sc.ray_intersect(r).t)
        occ = jax.jit(lambda r, sc=sc: sc.ray_test(r))
        for logn in logns:
            n = 1 << logn
            key = f"{mode}_n{n >> 10}K"
            try:
                ray_p = jax.jit(primaries, static_argnums=0)(n)
                ms = timeit(isect, ray_p, n=1 if mode == "bvh" else 3)
                RESULTS[f"closest_primary_ms_{key}"] = round(ms, 2)
                save()
                print(f"primary {key}: {ms:.1f} ms", flush=True)

                ray_b = bounce_rays(n)
                ms = timeit(isect, ray_b, n=1 if mode == "bvh" else 3)
                RESULTS[f"closest_bounce_ms_{key}"] = round(ms, 2)
                save()
                print(f"bounce  {key}: {ms:.1f} ms", flush=True)

                ray_s = jax.jit(shadow_rays, static_argnums=0)(n)
                ms = timeit(occ, ray_s, n=1 if mode == "bvh" else 3)
                RESULTS[f"shadow_ms_{key}"] = round(ms, 2)
                save()
                print(f"shadow  {key}: {ms:.1f} ms", flush=True)
            except Exception as e:  # keep partial results on OOM/timeout
                RESULTS[f"error_{key}"] = repr(e)[:200]
                save()
                print("error at", key, repr(e)[:200], flush=True)
                break


if __name__ == "__main__":
    main()

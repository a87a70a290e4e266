"""Cluster-kernel coherence ablations (round 4).

Measures, on the real chip, how lane ordering drives the packet kernel's
cost (ops/clusters.py): per-tile work is the union of clusters the
tile's rays touch, so tile-compact lane orderings are the whole game.

  * null-RTT: host fetch round-trip (the floor every timing carries)
  * primary rays: row-major strips vs 16x16 pixel blocks (the render's
    production ordering)
  * diffuse bounce rays: unsorted vs sorted by (direction octant,
    origin Morton cell)

Writes PROFILE_cluster2_r04.json incrementally.
"""

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
    "PROFILE_cluster2_r04.json",
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
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), o
        )
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from __graft_entry__ import _matpreview_scene
    from mitsuba_customization_tpu.ops import clusters as cl
    from mitsuba_customization_tpu.render.records import Ray
    from mitsuba_customization_tpu.render.sensors import sample_ray

    scene = _matpreview_scene(res=512, spp=16, depth=8, n_sub=5)
    cs = scene.clusters
    RESULTS["n_super"] = int(cs.n_super)
    RESULTS["n_clusters"] = int(cs.cl_box.shape[0])
    save()
    print("built", RESULTS, flush=True)

    # RTT floor
    f0 = jax.jit(lambda x: x * 2.0)
    RESULTS["null_rtt_ms"] = round(timeit(f0, jnp.ones((8,)), n=10), 2)
    save()
    print("rtt", RESULTS["null_rtt_ms"], flush=True)

    W = 512

    def primaries(n, blocked):
        lanes = np.arange(n)
        spp = max(1, n // (W * W))
        pixel = lanes // spp
        if blocked:
            # render/integrator.py lane order: 16x16 pixel blocks
            order = (
                np.arange(W * W)
                .reshape(W // 16, 16, W // 16, 16)
                .transpose(0, 2, 1, 3)
                .reshape(-1)
            )
            pixel = order[pixel]
        px = (pixel % W).astype(np.float32) + 0.5
        py = (pixel // W).astype(np.float32) + 0.5
        uv = jnp.asarray(
            np.stack([px / W, py / W], axis=-1).astype(np.float32)
        )
        return sample_ray(scene.sensor, uv, jnp.zeros((n, 2)), 1.0)

    isect = jax.jit(lambda r: cl.intersect(cs, r)[0])
    occl = jax.jit(lambda r: cl.occluded(cs, r))

    for n in (1 << 18, 1 << 20):
        key = f"n{n >> 10}K"
        ray_row = jax.jit(primaries, static_argnums=(0, 1))(n, False)
        RESULTS[f"primary_rowmajor_ms_{key}"] = round(timeit(isect, ray_row), 2)
        save()
        ray_blk = jax.jit(primaries, static_argnums=(0, 1))(n, True)
        RESULTS[f"primary_blocked_ms_{key}"] = round(timeit(isect, ray_blk), 2)
        save()
        print(key, "primary row/blocked:",
              RESULTS[f"primary_rowmajor_ms_{key}"],
              RESULTS[f"primary_blocked_ms_{key}"], flush=True)

        # diffuse bounce rays from block-ordered primary hits
        si_t, si_prim, _, _, g = jax.jit(
            lambda r: cl.intersect(cs, r)
        )(ray_blk)
        rng = np.random.RandomState(5)
        d = rng.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dj = jnp.asarray(d)
        p = ray_blk.o + ray_blk.d * jnp.where(
            jnp.isfinite(si_t), si_t, 2.0
        )[..., None]
        nrm = jnp.cross(g.e1, g.e2)
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9
        )
        flip = jnp.sum(dj * nrm, axis=-1, keepdims=True) < 0
        dj = jnp.where(flip, -dj, dj)
        o = p + 1e-3 * dj
        ray_b = Ray.make(o, dj)
        RESULTS[f"bounce_unsorted_ms_{key}"] = round(timeit(isect, ray_b), 2)
        save()

        # sorted by (octant, origin morton)
        @jax.jit
        def sort_rays(ray):
            o, dd = ray.o, ray.d
            oct_ = (
                (dd[:, 0] > 0).astype(jnp.int32)
                + 2 * (dd[:, 1] > 0).astype(jnp.int32)
                + 4 * (dd[:, 2] > 0).astype(jnp.int32)
            )
            lo = jnp.min(o, axis=0)
            hi = jnp.max(o, axis=0)
            cell = jnp.clip(
                ((o - lo) / jnp.maximum(hi - lo, 1e-6) * 15.99)
                .astype(jnp.int32), 0, 15,
            )
            # 12-bit morton-ish interleave (4 bits per axis)
            def spread(x):
                x = (x | (x << 8)) & 0xF00F
                x = (x | (x << 4)) & 0x30C3
                x = (x | (x << 2)) & 0x9249
                return x
            m = (
                spread(cell[:, 0])
                | (spread(cell[:, 1]) << 1)
                | (spread(cell[:, 2]) << 2)
            )
            keyv = (oct_ << 12) | m
            ops = [keyv, o[:, 0], o[:, 1], o[:, 2],
                   dd[:, 0], dd[:, 1], dd[:, 2]]
            s = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=False)
            return Ray.make(
                jnp.stack(s[1:4], axis=-1), jnp.stack(s[4:7], axis=-1)
            )

        ray_bs = sort_rays(ray_b)
        RESULTS[f"bounce_sorted_ms_{key}"] = round(timeit(isect, ray_bs), 2)
        RESULTS[f"bounce_sort_cost_ms_{key}"] = round(
            timeit(sort_rays, ray_b), 2
        )
        save()
        print(key, "bounce unsorted/sorted/sortcost:",
              RESULTS[f"bounce_unsorted_ms_{key}"],
              RESULTS[f"bounce_sorted_ms_{key}"],
              RESULTS[f"bounce_sort_cost_ms_{key}"], flush=True)

        # shadow rays toward the area light (from blocked hits)
        target = jnp.asarray([1.5, 3.2, -1.0])
        dsh = target - p
        dist = jnp.linalg.norm(dsh, axis=-1, keepdims=True)
        dsh = dsh / jnp.maximum(dist, 1e-6)
        ray_s = Ray(o=p + 1e-3 * dsh, d=dsh, maxt=dist[..., 0] * 0.999)
        RESULTS[f"shadow_blocked_ms_{key}"] = round(timeit(occl, ray_s), 2)
        save()
        print(key, "shadow:", RESULTS[f"shadow_blocked_ms_{key}"], flush=True)


if __name__ == "__main__":
    main()

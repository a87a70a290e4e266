"""Packet (tile) size sweep for the cluster kernel.

Incoherent rays pay per-visit cost for every lane in a tile, so smaller
packets shrink the wasted work; coherent rays prefer bigger packets
(fewer grid steps / DMAs). Writes PROFILE_tiles_r04.json. Timings carry
the ~38 ms host-fetch RTT (PROFILE_cluster2_r04.json "null_rtt_ms") —
compare differences, not absolutes.
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
    "PROFILE_tiles_r04.json",
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
    W = 512
    n = 1 << 20

    def primaries_blocked():
        lanes = np.arange(n)
        spp = max(1, n // (W * W))
        pixel = lanes // spp
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

    ray_p = jax.jit(primaries_blocked)()
    t0, prim0, _, _, g = jax.jit(lambda r: cl.intersect(cs, r))(ray_p)
    rng = np.random.RandomState(5)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dj = jnp.asarray(d)
    p = ray_p.o + ray_p.d * jnp.where(jnp.isfinite(t0), t0, 2.0)[..., None]
    nrm = jnp.cross(g.e1, g.e2)
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9
    )
    dj = jnp.where(jnp.sum(dj * nrm, -1, keepdims=True) < 0, -dj, dj)
    ray_b = Ray.make(p + 1e-3 * dj, dj)

    for tr in (8, 16, 32):  # f32 blocks need >=8 sublanes
        f = jax.jit(
            lambda r, tr=tr: cl.intersect(cs, r, tile_rows=tr)[0]
        )
        RESULTS[f"primary_blocked_tr{tr}_ms"] = round(timeit(f, ray_p), 2)
        RESULTS[f"bounce_unsorted_tr{tr}_ms"] = round(timeit(f, ray_b), 2)
        save()
        print(tr, RESULTS[f"primary_blocked_tr{tr}_ms"],
              RESULTS[f"bounce_unsorted_tr{tr}_ms"], flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: rays/s on the flagship MERL+GGX scene (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json throughput target of
2x H100 Dr.Jit-CUDA rays/s. No reference numbers are published
(BASELINE.md); we peg the H100 Dr.Jit path-tracing figure at 2e9 rays/s
(order of magnitude of Mitsuba 3 cuda_ad_rgb on simple scenes), so the
target is 4e9 rays/s/chip and vs_baseline = value / 4e9.
"""

import json
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.render.integrator import render

TARGET_RAYS_PER_S = 4.0e9  # 2x assumed H100 Dr.Jit-CUDA rays/s


def main():
    res = 512
    spp = 64
    depth = 4
    scene = _flagship_scene(res=res, spp=spp, depth=depth)

    @jax.jit
    def run(scene, seed):
        img, stats = render(scene, spp=spp, seed=seed, return_stats=True)
        return img.sum(), stats["rays_traced"]

    # warmup/compile. NOTE: on the axon tunnel block_until_ready does not
    # reliably block; a small host fetch (float()) does. All timings below
    # therefore force completion through a scalar fetch.
    s, rays = run(scene, jnp.uint32(0))
    float(s)

    n_iter = 5
    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(n_iter):
        s, rays = run(scene, jnp.uint32(i + 1))
        float(s)  # forces completion
        total_rays += float(rays)
    dt = time.perf_counter() - t0

    rays_per_s = total_rays / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_second_single_chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / TARGET_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()

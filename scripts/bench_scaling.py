"""Scaling measurement on the virtual 8-device CPU mesh.

BASELINE.json demands rays/s at 1 device vs N devices and a scaling
efficiency; only one physical TPU chip is ever attached here, so this
harness measures the *sharding* path on XLA's forced-host-device CPU mesh
(the loopback pattern of SURVEY.md §4.2) and reports:

  * rays_1dev / rays_ndev  — same total frame, 1-device vs n-device mesh
  * sharding_efficiency    — t_1dev / t_ndev. The 8 virtual devices share
    this machine's physical cores, so ideal scaling is 1.0 (equal wall
    time for equal total work); values below 1 quantify the overhead the
    mesh path adds (collectives, shard bookkeeping), NOT parallel speedup.

Prints ONE JSON line; bench.py embeds it in its output.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene  # noqa: E402
from mitsuba_customization_tpu.parallel import mesh as pmesh  # noqa: E402
from mitsuba_customization_tpu.render.integrator import render  # noqa: E402


def _timed(fn, iters=3):
    fn()  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    res, spp, depth = 128, 8, 3
    scene = _flagship_scene(res=res, spp=spp, depth=depth)
    devices = jax.devices()
    n = len(devices)

    @jax.jit
    def run_stats(scene, seed):
        img, stats = render(scene, spp=spp, seed=seed, return_stats=True)
        return img.sum(), stats["rays_traced"]

    s, rays = run_stats(scene, jnp.uint32(0))
    rays = float(rays)

    mesh1 = pmesh.make_mesh(devices[:1])
    meshn = pmesh.make_mesh_2level(devices, n_hosts=2)

    def run_mesh(mesh):
        img = pmesh.render_sharded_jit(scene, mesh, spp=spp, seed=0)
        jax.block_until_ready(img)

    t1 = _timed(lambda: run_mesh(mesh1))
    tn = _timed(lambda: run_mesh(meshn))
    out = {
        "n_dev": n,
        "mesh": "dcn2 x ici4",
        "rays_per_frame": rays,
        "rays_1dev": rays / t1,
        "rays_ndev": rays / tn,
        "sharding_efficiency": t1 / tn,
        "note": (
            "virtual CPU devices share physical cores: equal total work, "
            "efficiency = wall-time ratio (1.0 = zero sharding overhead)"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

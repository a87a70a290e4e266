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

Round-5 changes (VERDICT r4 weak 2): the measured scene uses a GAUSSIAN
reconstruction filter so the splat-slab + ppermute halo-exchange path is
on the measured path (the round-4 harness measured the box fast path);
timings are median-of-N with the spread reported, so the committed number
is reproducible rather than a lucky best-of-3.

Prints ONE JSON line; bench.py embeds it in its output.
"""

import dataclasses
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
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene  # noqa: E402
from mitsuba_customization_tpu.parallel import mesh as pmesh  # noqa: E402
from mitsuba_customization_tpu.render.integrator import render  # noqa: E402

N_ITERS = 7


def _timed(fn, iters=N_ITERS):
    fn()  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return float(np.median(ts)), float(np.percentile(ts, 75)
                                       - np.percentile(ts, 25))


def main():
    # Shard size matters: at 128^2 x 8spp / 8 devices each shard renders
    # only 16k lanes and per-program fixed costs (dispatch, splat allocs,
    # collective setup) dominate the ratio — that measures overhead, not
    # the sharding design (real pod shards are orders of magnitude
    # larger). 192^2 x 8 gives 37k lanes/shard, still CPU-affordable.
    res, spp, depth = 192, 8, 3
    scene = _flagship_scene(res=res, spp=spp, depth=depth)
    # gaussian filter -> the sharded splat-slab halo-exchange path
    scene = dataclasses.replace(
        scene, config=dataclasses.replace(scene.config, rfilter="gaussian")
    )
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

    t1, s1 = _timed(lambda: run_mesh(mesh1))
    tn, sn = _timed(lambda: run_mesh(meshn))
    out = {
        "n_dev": n,
        "mesh": "dcn2 x ici4",
        "rfilter": "gaussian (halo-exchange path)",
        "rays_per_frame": rays,
        "rays_1dev": rays / t1,
        "rays_ndev": rays / tn,
        "sharding_efficiency": t1 / tn,
        "t1_median_s": t1,
        "tn_median_s": tn,
        "iqr_frac": max(s1 / t1, sn / tn),
        "iters": N_ITERS,
        "note": (
            "virtual CPU devices share physical cores: equal total work, "
            "efficiency = wall-time ratio (1.0 = zero sharding overhead); "
            "median of N with IQR spread"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Benchmark: rays/s on the matpreview-class mesh scene (the workload
BASELINE.json's "metric" names: MERL + GGX, mesh geometry, depth 8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The HEADLINE value is the matpreview scene (20k-tri blob, 10 MERL
materials, GGX floor, area light + constant sky — cluster packet
traversal on the hot path); the 3-analytic-prim flagship of rounds 1-4
is kept under "flagship" for series comparability. vs_baseline is
measured against the BASELINE.json throughput target of 2x H100
Dr.Jit-CUDA rays/s. The reference publishes NO numbers (BASELINE.md:
"published": {}), so the H100 figure is an ASSUMED peg of 2e9 rays/s
(order of magnitude of Mitsuba 3 cuda_ad_rgb on simple scenes; full
path tracing on production scenes is nearer 2e8) — the "baseline_note"
key carries this caveat into the recorded JSON.

A scaling measurement on the virtual 8-device CPU mesh (1-dev vs 8-dev
wall time for the same frame — scripts/bench_scaling.py) is appended
under "scaling" when it completes; only one physical TPU chip is ever
attached, so multi-chip efficiency is measured on the forced-host-device
mesh (SURVEY.md §4.2 loopback pattern).
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.render.integrator import render

TARGET_RAYS_PER_S = 4.0e9  # 2x ASSUMED H100 Dr.Jit-CUDA rays/s (see above)
BASELINE_NOTE = (
    "target pegs H100 Dr.Jit-CUDA at an assumed 2e9 rays/s (no published "
    "reference numbers exist); vs_baseline = value / 4e9"
)


def _scaling_subprocess():
    """Run the CPU-mesh scaling harness in a child (needs its own XLA
    flags before backend init); returns its JSON dict or None."""
    try:
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU out of it
        out = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts", "bench_scaling.py")],
            capture_output=True, text=True, timeout=1500, env=env,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def _probe_compact_schedule(scene, spp=8):
    """One cheap pass -> per-bounce live fractions -> compaction schedule.

    rays_per_bounce counts live lanes entering each bounce (plus NEE
    shadow rays, making the fractions conservative); the schedule keeps
    20% + 2pt headroom so systematic thinning of live lanes stays rare
    (render/integrator._run_bounces_compact docstring).
    """
    import dataclasses

    from mitsuba_customization_tpu.render.integrator import render_lanes

    @jax.jit
    def probe(scene):
        _, _, st = render_lanes(scene, spp, jnp.uint32(0))
        return st["rays_per_bounce"]

    rpb = jax.device_get(probe(scene)).astype(float)
    fracs = [1.0] + [
        min(1.0, float(f) * 1.2 + 0.02) for f in (rpb[1:] / max(rpb[0], 1))
    ]
    cfg = dataclasses.replace(scene.config, compact=tuple(fracs))
    return dataclasses.replace(scene, config=cfg), fracs


def _measure(scene, spp, n_iter=5):
    """rays/s of `scene` at `spp` (jitted, warm, completion-forced)."""

    @jax.jit
    def run(scene, seed):
        img, stats = render(scene, spp=spp, seed=seed, return_stats=True)
        return img.sum(), stats["rays_traced"]

    # warmup/compile. NOTE: on the axon tunnel block_until_ready does not
    # reliably block; a small host fetch (float()) does. All timings below
    # therefore force completion through a scalar fetch.
    s, rays = run(scene, jnp.uint32(0))
    float(s)

    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(n_iter):
        s, rays = run(scene, jnp.uint32(i + 1))
        float(s)  # forces completion
        total_rays += float(rays)
    dt = time.perf_counter() - t0
    return total_rays / dt


def main():
    # HEADLINE — configs[4]-class matpreview mesh scene (20k-tri blob, 10
    # MERL materials, GGX floor, area light, 8-bounce): cluster packet
    # traversal on the hot path (the BASELINE.json "metric" workload;
    # round-4 verdict: "make the matpreview number the headline").
    from __graft_entry__ import _matpreview_scene

    mp_spp = 8  # 512*512*8 = one full 2M-lane wavefront pass
    mp = _matpreview_scene(res=512, spp=mp_spp, depth=8, n_sub=5)
    mp, mp_fracs = _probe_compact_schedule(mp, spp=4)
    mp_rays = _measure(mp, mp_spp, n_iter=3)

    record = {
        "metric": "matpreview_rays_per_second_single_chip",
        "value": mp_rays,
        "unit": "rays/s",
        "vs_baseline": mp_rays / TARGET_RAYS_PER_S,
        "baseline_note": BASELINE_NOTE,
        "matpreview": {
            "rays_per_s": mp_rays,
            "n_prims": int(mp.geometry.n_prims),
            "intersector": mp.config.intersector,
            "max_depth": 8,
            "compact_schedule": [round(f, 4) for f in mp_fracs],
        },
    }

    # Secondary — flagship (3 analytic prims, MERL+GGX, depth 4): the
    # round-1..4 headline series, kept for comparability.
    try:
        spp = 64
        scene = _flagship_scene(res=512, spp=spp, depth=4)
        scene, compact_fracs = _probe_compact_schedule(scene)
        record["flagship"] = {
            "rays_per_s": _measure(scene, spp),
            "compact_schedule": [round(f, 4) for f in compact_fracs],
        }
    except Exception as e:  # never lose the headline number
        record["flagship"] = {"error": repr(e)[:300]}

    scaling = _scaling_subprocess()
    if scaling is not None:
        record["scaling"] = scaling
    print(json.dumps(record))


if __name__ == "__main__":
    main()

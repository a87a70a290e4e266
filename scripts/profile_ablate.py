"""Ablation profile: knock out bounce components to find hidden cost.

Monkeypatches pieces of the bounce body and measures the depth-4 minus
depth-2 marginal per-bounce cost. Run on the TPU:
python -u scripts/profile_ablate.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.core.sampler import IndependentSampler
from mitsuba_customization_tpu.models import bsdf as bsdf_mod
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.render import integrator as integ

N = 1 << 21
K1, K2 = 2, 6
RESULTS = {}
OUT = "PROFILE_ablate_r03.json"


def _hash(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def unit_vec(i, c, s):
    v = jnp.stack(
        [
            _hash((c * 1e5).astype(jnp.uint32) + jnp.uint32(i + s)).astype(
                jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e6).astype(jnp.uint32) + jnp.uint32(i + s + 1)).astype(
                jnp.float32) / 4e9 - 0.5,
            _hash((c * 1e7).astype(jnp.uint32) + jnp.uint32(i + s + 2)).astype(
                jnp.float32) / 8e9 + 0.3,
        ],
        axis=-1,
    )
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def bench(name, step):
    f = jax.jit(
        lambda c0, k: jax.lax.fori_loop(
            0, k, lambda i, c: c * 0.5 + step(c, i), c0
        )
    )
    c0 = jnp.zeros((N,), jnp.float32)

    def timed(k):
        t0 = time.perf_counter()
        r = f(c0, jnp.int32(k))
        float(r[:4].sum())
        return time.perf_counter() - t0

    timed(K1)
    best = np.inf
    for _ in range(2):
        t1 = timed(K1)
        t2 = timed(K2)
        best = min(best, (t2 - t1) / (K2 - K1))
    print(f"{name:56s} {best*1e3:9.3f} ms", flush=True)
    RESULTS[name] = round(best * 1e3, 4)
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    return best


def per_bounce(tag, scene, o, smp):
    def full(depth):
        def step(c, i):
            L, _ = integ.trace_paths(
                scene, Ray.make(o, unit_vec(i, c, 0)), smp, depth, 5, False
            )
            return c * 0.999 + 1e-6 * L.sum(-1)
        return step

    t2 = bench(f"d2 [{tag}]", full(2))
    t4 = bench(f"d4 [{tag}]", full(4))
    RESULTS[f"per_bounce [{tag}]"] = round((t4 - t2) / 2 * 1e3, 3)
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    print(f"  -> per-bounce [{tag}]: {(t4 - t2) / 2 * 1e3:.1f} ms",
          flush=True)


def main():
    scene = _flagship_scene(res=64, spp=4, depth=4)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)), dtype=jnp.float32)
    smp = IndependentSampler(0, jnp.arange(N, dtype=jnp.uint32))

    per_bounce("baseline(+active-mask)", scene, o, smp)

    # --- no shadow rays ---
    orig_ray_test = type(scene).ray_test
    type(scene).ray_test = lambda self, ray: jnp.zeros(
        ray.o.shape[:-1], bool
    )
    per_bounce("no ray_test", scene, o, smp)
    type(scene).ray_test = orig_ray_test

    # --- stub bounce_shade (cheap diffuse math, no tabulated kernels) ---
    orig_bs = bsdf_mod.bounce_shade

    def fake_bs(table, mat_id, wi, wo_nee, s2, s1=None, uv=None,
                need_attached=False, has_nee=True, active=None):
        from mitsuba_customization_tpu.core import math as m
        from mitsuba_customization_tpu.core.warp import (
            square_to_cosine_hemisphere,
            square_to_cosine_hemisphere_pdf,
        )

        wo = square_to_cosine_hemisphere(s2)
        p = square_to_cosine_hemisphere_pdf(wo)
        f = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), wi.shape) * (
            jnp.maximum(m.cos_theta(wo_nee), 0.0) / jnp.pi
        )[..., None]
        w = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), wi.shape)
        pn = square_to_cosine_hemisphere_pdf(wo_nee)
        return (f, pn, wo, p, w, jnp.zeros(p.shape, bool),
                f if need_attached else None)

    bsdf_mod.bounce_shade = fake_bs
    per_bounce("stub bounce_shade", scene, o, smp)
    bsdf_mod.bounce_shade = orig_bs

    # --- no emitters (kills NEE + emitter-hit blocks) ---
    import mitsuba_customization_tpu as mct
    from mitsuba_customization_tpu.render.sensors import look_at

    table = np.asarray(scene.bsdfs.stacks[bsdf_mod.TABULATED].table)[0]
    scene_noem = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 4},
            "sensor": {
                "type": "perspective",
                "fov": 45,
                "to_world": look_at([0, 1.5, -4], [0, 0, 0], [0, 1, 0]),
                "film": {"width": 64, "height": 64},
                "sampler": {"type": "independent", "sample_count": 4},
            },
            "merl_sphere": {
                "type": "sphere",
                "center": [-0.8, 0, 0],
                "radius": 0.9,
                "bsdf": {"type": "merl", "table": table},
            },
            "ggx_sphere": {
                "type": "sphere",
                "center": [1.2, 0, 0.5],
                "radius": 0.9,
                "bsdf": {"type": "roughconductor", "alpha": 0.15},
            },
            "floor": {
                "type": "rectangle",
                "to_world": {
                    "rotate": {"axis": [1, 0, 0], "angle": -90},
                    "scale": 8.0,
                    "translate": [0, -0.95, 0],
                },
                "bsdf": {"type": "diffuse", "reflectance": [0.6, 0.6, 0.6]},
            },
        }
    )
    per_bounce("no emitters", scene_noem, o, smp)


if __name__ == "__main__":
    main()

"""Stage-level TPU microbenchmark: where do the cycles go?

Times each pipeline stage in isolation on 1M lanes (the per-pass wavefront)
— the profiling surface the reference gets from dr.kernel_history
(SURVEY.md §5.1). Run on the target device: python scripts/profile_stages.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_scene
from mitsuba_customization_tpu.core.sampler import IndependentSampler
from mitsuba_customization_tpu.models import bsdf as bsdf_mod, tabulated
from mitsuba_customization_tpu.render import geometry as geo
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.render import emitters as em_mod

N = 1 << 20


def bench(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms   {N/dt/1e6:10.1f} Mlanes/s")
    return out


def main():
    scene = _flagship_scene(res=64, spp=4, depth=4)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)), dtype=jnp.float32)
    d = jnp.asarray(rng.normal(size=(N, 3)), dtype=jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray.make(o, d)
    wi = jnp.abs(d)
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wo = jnp.roll(wi, 1, axis=0)
    u2 = jax.random.uniform(key, (N, 2))
    u1 = jax.random.uniform(key, (N,))
    mat_id = jnp.asarray(rng.integers(0, 3, N), dtype=jnp.int32)

    smp = IndependentSampler(0, jnp.arange(N, dtype=jnp.uint32))

    bench("sampler next_2d", jax.jit(lambda: smp.with_dim(8).next_2d()))
    bench(
        "intersect_brute (4 prims)",
        jax.jit(lambda r: geo.intersect_brute(scene.geometry, r)[0]),
        ray,
    )
    bench(
        "compute_interaction",
        jax.jit(
            lambda r: scene.ray_intersect(r).p
        ),
        ray,
    )

    tab = scene.bsdfs.stacks[bsdf_mod.TABULATED]
    slot = jnp.zeros(N, dtype=jnp.int32)
    bench(
        "merl eval (trilinear gather)",
        jax.jit(lambda a, b: tabulated.eval(tab, a, b, slot=slot)),
        wi, wo,
    )
    bench(
        "merl pdf",
        jax.jit(lambda a, b: tabulated.pdf(tab, a, b, slot=slot)),
        wi, wo,
    )
    bench(
        "merl sample",
        jax.jit(lambda a, u: tabulated.sample(tab, a, u, slot=slot)[0]),
        wi, u2,
    )
    bench(
        "bsdf dispatch eval (3 kernels)",
        jax.jit(lambda m_, a, b: bsdf_mod.eval(scene.bsdfs, m_, a, b)),
        mat_id, wi, wo,
    )
    bench(
        "bsdf dispatch sample",
        jax.jit(
            lambda m_, a, u, v: bsdf_mod.sample(scene.bsdfs, m_, a, u, v)[0]
        ),
        mat_id, wi, u2, u1,
    )
    bench(
        "emitter sample_direction",
        jax.jit(
            lambda p, u: em_mod.sample_direction(
                scene.emitters, scene.geometry, p, u
            ).d
        ),
        o, jnp.concatenate([u2, u1[:, None]], -1),
    )

    # full bounce reference: one path bounce via trace_paths at depth 1
    from mitsuba_customization_tpu.render.integrator import trace_paths

    bench(
        "full path depth=1",
        jax.jit(
            lambda r: trace_paths(scene, r, smp, 1, 5, False)[0]
        ),
        ray,
        iters=5,
    )
    bench(
        "full path depth=4",
        jax.jit(
            lambda r: trace_paths(scene, r, smp, 4, 5, False)[0]
        ),
        ray,
        iters=5,
    )


if __name__ == "__main__":
    main()

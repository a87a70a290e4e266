"""Stage-level TPU microbenchmark: where do the cycles go?

Times each pipeline stage on 1M lanes (the per-pass wavefront) — the
profiling surface the reference gets from dr.kernel_history (SURVEY.md
§5.1). Each stage runs K times *inside one jitted dispatch* (chained
through a carry) so the measurement amortizes away the host<->TPU tunnel
round-trip (~30-60 ms on this link), which would otherwise swamp every
stage. Run on the target device: python scripts/profile_stages.py
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
K = 20


def bench(name, step, init, iters=3, k=K, lanes=N):
    """step(carry, i) -> carry, repeated k times inside one dispatch."""
    f = jax.jit(
        lambda x0: jax.lax.fori_loop(0, k, lambda i, x: step(x, i), x0)
    )
    jax.block_until_ready(f(init))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(init))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / k
    print(f"{name:36s} {dt*1e3:9.3f} ms   {lanes/dt/1e6:10.1f} Mlanes/s")


def main():
    scene = _flagship_scene(res=64, spp=4, depth=4)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)), dtype=jnp.float32)
    d0 = jnp.asarray(rng.normal(size=(N, 3)), dtype=jnp.float32)
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    wi = jnp.abs(d0)
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    u2 = jax.random.uniform(key, (N, 2))
    u1 = jax.random.uniform(key, (N,))
    mat_id = jnp.asarray(rng.integers(0, 3, N), dtype=jnp.int32)
    smp = IndependentSampler(0, jnp.arange(N, dtype=jnp.uint32))

    # Every step perturbs its input from the loop counter so XLA cannot
    # hoist the body out of the loop, and returns a same-typed carry.
    def vary(v, i):
        return v * (1.0 + 1e-9 * i)

    bench(
        "sampler next_2d",
        lambda c, i: c + 1e-9 * smp.with_dim(2 * (0 * i)).next_2d().sum(-1)[:, None] * 0 + smp.with_dim(0).next_2d() * 1e-9,
        u2,
    )
    bench(
        "intersect_brute (5 prims)",
        lambda c, i: vary(c, i) * 0.999
        + 1e-9
        * geo.intersect_brute(
            scene.geometry, Ray.make(o * (1 + 1e-9 * i), vary(c, i) / jnp.linalg.norm(c, axis=-1, keepdims=True))
        )[0][:, None],
        d0,
    )
    bench(
        "full interaction (intersect+frame)",
        lambda c, i: vary(c, i) * 0.999
        + 1e-9
        * scene.ray_intersect(
            Ray.make(o, vary(c, i) / jnp.linalg.norm(c, axis=-1, keepdims=True))
        ).p,
        d0,
    )

    tab = scene.bsdfs.stacks[bsdf_mod.TABULATED]
    slot = jnp.zeros(N, dtype=jnp.int32)

    def unit(c):
        return c / jnp.linalg.norm(c, axis=-1, keepdims=True)

    bench(
        "merl eval (packed trilinear)",
        lambda c, i: vary(c, i) * 0.999
        + 1e-6 * tabulated.eval(tab, unit(vary(c, i)), wi, slot=slot),
        d0,
    )
    bench(
        "merl pdf",
        lambda c, i: vary(c, i) * 0.999
        + 1e-6 * tabulated.pdf(tab, unit(vary(c, i)), wi, slot=slot)[:, None],
        d0,
    )
    bench(
        "merl sample",
        lambda c, i: vary(c, i) * 0.999
        + 1e-6 * tabulated.sample(
            tab, wi, jnp.abs(vary(c, i)[:, :2]) % 1.0, slot=slot
        )[0],
        d0,
    )
    bench(
        "bsdf dispatch eval (3 kernels)",
        lambda c, i: vary(c, i) * 0.999
        + 1e-6 * bsdf_mod.eval(scene.bsdfs, mat_id, unit(vary(c, i)), wi),
        d0,
    )
    bench(
        "emitter sample_direction",
        lambda c, i: vary(c, i) * 0.999
        + 1e-6
        * em_mod.sample_direction(
            scene.emitters, scene.geometry, o,
            jnp.abs(vary(c, i)) % 1.0,
        ).d,
        d0,
    )

    from mitsuba_customization_tpu.render.integrator import trace_paths

    for depth in (1, 4):
        bench(
            f"full path depth={depth}",
            lambda c, i, depth=depth: vary(c, i) * 0.999
            + 1e-6
            * trace_paths(
                scene,
                Ray.make(o, unit(vary(c, i))),
                smp,
                depth,
                5,
                False,
            )[0],
            d0,
            k=5,
        )


if __name__ == "__main__":
    main()

"""Crossover measurement: sorted-segment kernels vs gather paths by
wavefront size (round-5). The segment-walk kernels' iteration counts are
bounded below by the number of DISTINCT table cells the wavefront
touches, which shrinks sublinearly as the wavefront shrinks — so at the
compacted late-bounce sizes (42-180k lanes) a plain XLA gather (or the
one-hot CDF fallback) may win. Measures, per size:

  eval_sorted   — ops/merl_sorted incoherent production path
  eval_raw      — 24-scalar-gather XLA formulation
  eval_packed   — corner-block single-row-gather (needs 24x table HBM)
  samp_sorted   — ops/marginal_sorted cond_sample_pdf
  samp_onehot   — one-hot MXU CDF fallback

Writes PROFILE_paths_r05.json. Loop-in-jit (x10) so the ~38 ms tunnel
RTT amortizes to noise.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mitsuba_customization_tpu.models import tabulated as tab
from mitsuba_customization_tpu.ops import marginal_sorted, merl_sorted

N_MAT = 10
REPS = 10


def _p(x, i):
    """Perturb by the loop index so XLA cannot hoist the body out of the
    fori_loop as loop-invariant (the perturbation is ~f32 epsilon)."""
    import jax.numpy as jnp

    return x + 1e-12 * i.astype(jnp.float32)


def timeit(fn, *args, warm=1, n_iter=3):
    # float() host fetch: block_until_ready does not actually block on the
    # tunneled axon backend. The ~38 ms RTT amortizes over REPS in-jit reps.
    for _ in range(warm):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        float(fn(*args))
    return (time.perf_counter() - t0) / n_iter * 1e3 / REPS


def _loop(f):
    """Run f REPS times inside one jit with fori_loop, accumulating."""

    def run(*args):
        def body(i, acc):
            return acc + f(i, *args)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    tables = jax.random.uniform(
        key, (N_MAT, 90, 90, 180, 3), minval=0.01, maxval=1.0
    )
    params = tab.TabulatedBRDF.build_stack(tables)
    corners = jax.vmap(tab._pack_corners)(tables)
    print("built; corners", corners.nbytes / 1e9, "GB", flush=True)

    rec = {"device": str(jax.devices()[0].device_kind)}
    sizes = [1 << 16, 1 << 17, 1 << 18, 1 << 19, 1 << 20, 1 << 21]
    for n in sizes:
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(n), 4)
        # random upper-hemisphere directions (late-bounce incoherence)
        def hemi(k):
            v = jax.random.normal(k, (n, 3))
            v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
            return v.at[:, 2].set(jnp.abs(v[:, 2]) + 1e-3)

        wi = hemi(k1)
        wo = hemi(k2)
        slot = jax.random.randint(k3, (n,), 0, N_MAT)
        u2 = jax.random.uniform(k4, (n, 2))
        tag = f"{n >> 10}k"

        ev_sorted = _loop(
            lambda i, tb, pm, wi, wo, slot: jnp.sum(
                merl_sorted.eval_sorted(
                    tb, _p(wi, i), wo, slot=slot, perm=pm
                )
            )
        )
        rec[f"eval_sorted_{tag}_ms"] = timeit(
            ev_sorted, params.table, params.perm, wi, wo, slot
        )

        ev_raw = _loop(
            lambda i, tb, wi, wo, slot: jnp.sum(
                tab.eval_raw(tb, _p(wi, i), wo, slot=slot)
            )
        )
        rec[f"eval_raw_{tag}_ms"] = timeit(ev_raw, params.table, wi, wo, slot)

        ev_packed = _loop(
            lambda i, cn, wi, wo, slot: jnp.sum(
                tab.eval_packed(cn, (90, 90, 180), _p(wi, i), wo, slot=slot)
            )
        )
        rec[f"eval_packed_{tag}_ms"] = timeit(ev_packed, corners, wi, wo, slot)

        # ---- sampling-CDF paths ----
        theta_i, phi_i = tab._canonical_wi(wi)
        tbin = tab._slice_index(theta_i)
        flat_key = slot * tab.N_THETA_I + tbin
        r = jax.random.randint(k1, (n,), 0, tab.SAMPLE_RES_H)
        c = jax.random.randint(k2, (n,), 0, tab.SAMPLE_RES_PHI)
        u = u2[:, 1]
        mask = jnp.ones((n,), bool)

        sp_sorted = _loop(
            lambda i, ct, fk, u, r, c, mask: sum(
                jnp.sum(o)
                for o in marginal_sorted.cond_sample_pdf(
                    ct, tab.SAMPLE_RES_H, fk,
                    jnp.clip(u + 1e-9 * i.astype(jnp.float32), 0.0, 1.0),
                    r, r, c, r, c, mask,
                )
            )
        )
        rec[f"samp_sorted_{tag}_ms"] = timeit(
            sp_sorted, params.condT, flat_key, u, r, c, mask
        )

        from mitsuba_customization_tpu.core.distr import (
            _fetch_stacked,
            _invert_cdf,
        )

        def onehot(i, cc, slot, tbin, u, r, c, mask):
            slc = (slot, tbin)
            cond = _fetch_stacked(cc, slc + (r,))
            col, col_lo, mass = _invert_cdf(
                cond, jnp.clip(u + 1e-9 * i.astype(jnp.float32), 0.0, 1.0)
            )
            cond_nee = _fetch_stacked(cc, slc + (r,))
            m_nee = tab._row_mass_at(cond_nee, c)
            cond_cos = _fetch_stacked(cc, slc + (r,))
            m_cos = tab._row_mass_at(cond_cos, c)
            return (
                jnp.sum(col) + jnp.sum(mass) + jnp.sum(m_nee)
                + jnp.sum(m_cos) + 0.0 * i
            )

        sp_onehot = _loop(onehot)
        rec[f"samp_onehot_{tag}_ms"] = timeit(
            sp_onehot, params.sampling.cdf_cond, slot, tbin, u, r, c, mask
        )
        print(
            tag,
            {k.replace(f"_{tag}_ms", ""): round(v, 2)
             for k, v in rec.items() if tag in k},
            flush=True,
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE_paths_r05.json",
    )
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

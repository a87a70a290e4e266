"""Cluster packet intersector (ops/clusters.py) vs brute force.

The Pallas kernels run in interpret mode on the CPU test backend; the
brute-force all-pairs intersector (render/geometry.py) is the oracle —
the same gate render/bvh.py traversal passes (SURVEY.md §4.1: scalar
variant as the de-facto reference backend).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_customization_tpu.ops import clusters as cl
from mitsuba_customization_tpu.render import geometry as geo
from mitsuba_customization_tpu.render.records import Ray
from mitsuba_customization_tpu.utils.meshgen import (
    icosphere_blob,
    vertex_normals,
)


def _mesh_geometry(n_sub=2, extra_analytic=False):
    v, f = icosphere_blob(n_sub=n_sub)
    vn = vertex_normals(v, f)
    p = f.shape[0]
    rng = np.random.RandomState(3)
    g = dict(
        prim_type=np.zeros(p, np.int32),
        p0=v[f[:, 0]],
        e1=v[f[:, 1]] - v[f[:, 0]],
        e2=v[f[:, 2]] - v[f[:, 0]],
        vn0=vn[f[:, 0]], vn1=vn[f[:, 1]], vn2=vn[f[:, 2]],
        uv0=rng.rand(p, 2).astype(np.float32),
        uv1=rng.rand(p, 2).astype(np.float32),
        uv2=rng.rand(p, 2).astype(np.float32),
        mat_id=(np.arange(p) % 5).astype(np.int32),
        emitter_id=np.where(np.arange(p) % 17 == 0, 1, -1).astype(np.int32),
        shape_id=(np.arange(p) % 3).astype(np.int32),
    )
    if extra_analytic:
        # append a sphere and a cylinder primitive
        def add(prim_type, p0, e1, e2):
            g["prim_type"] = np.concatenate(
                [g["prim_type"], [np.int32(prim_type)]]
            )
            for k, val in (("p0", p0), ("e1", e1), ("e2", e2)):
                g[k] = np.concatenate([g[k], np.asarray([val], np.float32)])
            for k in ("vn0", "vn1", "vn2"):
                g[k] = np.concatenate([g[k], [[0, 0, 1]]]).astype(np.float32)
            for k in ("uv0", "uv1", "uv2"):
                g[k] = np.concatenate([g[k], [[0, 0]]]).astype(np.float32)
            for k in ("mat_id", "shape_id"):
                g[k] = np.concatenate([g[k], [0]]).astype(np.int32)
            g["emitter_id"] = np.concatenate(
                [g["emitter_id"], [-1]]
            ).astype(np.int32)

        add(geo.SPHERE, [2.0, 0.3, 0.1], [0.7, 0, 0], [0, 0, 0])
        add(geo.CYLINDER, [-2.0, -1.0, 0.0], [0.0, 2.0, 0.0], [0.5, 0, 0])
    return geo.Geometry(**{k: jnp.asarray(val) for k, val in g.items()})


def _rays(n, seed=0, aim_frac=0.5):
    rng = np.random.RandomState(seed)
    o = (
        np.tile(np.asarray([[0, 0, -4.0]], np.float32), (n, 1))
        + rng.randn(n, 3).astype(np.float32) * 0.4
    )
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    k = int(n * aim_frac)
    d[:k] = -o[:k] + rng.randn(k, 3) * 0.5
    d[:k] /= np.linalg.norm(d[:k], axis=-1, keepdims=True)
    return Ray.make(jnp.asarray(o), jnp.asarray(d))


@pytest.mark.parametrize("extra_analytic", [
    pytest.param(False, marks=pytest.mark.slow),  # tri-only subset
    True,
])
def test_closest_matches_brute(extra_analytic):
    g = _mesh_geometry(n_sub=2, extra_analytic=extra_analytic)
    cs = cl.build(g)
    ray = _rays(cl.TILE)
    t, prim, u, v, gg = cl.intersect(cs, ray, interpret=True)
    tb, pb, ub, vb = geo.intersect_brute(g, ray)
    t, prim, u, v = map(np.asarray, (t, prim, u, v))
    tb, pb = np.asarray(tb), np.asarray(pb)
    assert ((prim >= 0) == (pb >= 0)).all()
    m = prim >= 0
    assert np.allclose(t[m], tb[m], rtol=1e-4, atol=1e-5)
    # ties on shared mesh edges may pick either prim; t equality is the
    # correctness statement, prim agreement the common case
    assert (prim[m] == pb[m]).mean() > 0.99
    same = m & (prim == pb)
    assert np.allclose(u[same], np.asarray(ub)[same], atol=2e-4)
    assert np.allclose(v[same], np.asarray(vb)[same], atol=2e-4)


def test_winner_fields_match_geometry_rows():
    g = _mesh_geometry(n_sub=2)
    cs = cl.build(g)
    ray = _rays(cl.TILE, seed=5)
    t, prim, u, v, gg = cl.intersect(cs, ray, interpret=True)
    prim = np.asarray(prim)
    m = prim >= 0
    safe = np.maximum(prim, 0)
    for field in ("p0", "e1", "e2", "vn0", "vn1", "vn2", "uv0", "uv1",
                  "uv2"):
        got = np.asarray(getattr(gg, field))[m]
        ref = np.asarray(getattr(g, field))[safe][m]
        assert np.allclose(got, ref), field
    for field in ("prim_type", "mat_id", "emitter_id", "shape_id"):
        got = np.asarray(getattr(gg, field))[m]
        ref = np.asarray(getattr(g, field))[safe][m]
        assert (got == ref).all(), field


def test_occluded_and_maxt():
    g = _mesh_geometry(n_sub=2)
    cs = cl.build(g)
    ray = _rays(cl.TILE, seed=9)
    # finite maxt: clip half the rays just before their brute-force hit
    tb, pb, _, _ = geo.intersect_brute(g, ray)
    tb = np.asarray(tb)
    maxt = np.where(
        np.isfinite(tb) & (np.arange(cl.TILE) % 2 == 0), tb * 0.5, 1e30
    ).astype(np.float32)
    ray2 = Ray(o=ray.o, d=ray.d, maxt=jnp.asarray(maxt))
    occ = np.asarray(cl.occluded(cs, ray2, interpret=True))
    occ_ref = np.asarray(geo.occluded_brute(g, ray2))
    assert (occ == occ_ref).all()
    # closest-hit with capped maxt: capped lanes must miss
    t2, p2, _, _, _ = cl.intersect(cs, ray2, interpret=True)
    p2 = np.asarray(p2)
    capped = np.isfinite(tb) & (np.arange(cl.TILE) % 2 == 0)
    assert (p2[capped] == -1).all()


@pytest.mark.slow  # heavy; faster sibling stays in the default run
def test_scene_cluster_render_matches_bvh():
    """Full-scene parity: the cluster path and the BVH path render the
    same image (CPU: cluster kernel forced via interpret monkeypatch)."""
    import dataclasses

    from __graft_entry__ import _matpreview_scene
    from mitsuba_customization_tpu.render.integrator import render

    scene = _matpreview_scene(res=16, spp=1, depth=2, n_sub=2)
    assert scene.config.intersector == "cluster"
    img_bvh = np.asarray(render(scene, spp=1, seed=0))  # cpu -> bvh mode

    from mitsuba_customization_tpu.ops import clusters as cl_mod
    from mitsuba_customization_tpu.render import scene as scene_mod

    orig_i, orig_o = cl_mod.intersect, cl_mod.occluded
    cl_mod.intersect = lambda cs, r, interpret=False, **kw: orig_i(
        cs, r, True, **kw)
    cl_mod.occluded = lambda cs, r, interpret=False, **kw: orig_o(
        cs, r, True, **kw)
    orig_mode = scene_mod.Scene._mode
    scene_mod.Scene._mode = lambda self: self.config.intersector
    try:
        img_cl = np.asarray(render(scene, spp=1, seed=0))
    finally:
        cl_mod.intersect, cl_mod.occluded = orig_i, orig_o
        scene_mod.Scene._mode = orig_mode
    assert np.allclose(img_cl, img_bvh, rtol=1e-3, atol=1e-4)


def test_capacity_fallback_pinned(monkeypatch, caplog):
    """Scenes past the cluster capacity contract fall back to the BVH
    with a LOUD warning (round-4 verdict: the ~20x perf cliff must not
    be silent). Pinned with a shrunken MAX_PRIMS so the test stays
    cheap."""
    import logging

    import mitsuba_customization_tpu as mct
    from mitsuba_customization_tpu.render import scene as scene_mod
    from mitsuba_customization_tpu.utils.meshgen import icosphere_blob

    v, f = icosphere_blob(n_sub=2)  # 320 faces

    def build(n_cap):
        monkeypatch.setattr(cl, "MAX_PRIMS", n_cap)
        return mct.load_dict(
            {
                "type": "scene",
                "sensor": {
                    "type": "perspective",
                    "film": {"width": 8, "height": 8},
                },
                "blob": {"type": "mesh", "vertices": v, "faces": f,
                         "bsdf": {"type": "diffuse"}},
                "sky": {"type": "constant", "radiance": [1, 1, 1]},
            }
        )

    # under the cap: cluster structure built
    sc = build(1000)
    assert sc.config.intersector == "cluster"
    assert sc.clusters is not None

    # over the cap: BVH fallback + warning
    with caplog.at_level(logging.WARNING, "mitsuba_customization_tpu"):
        sc2 = build(100)
    assert sc2.config.intersector == "bvh"
    assert sc2.clusters is None
    assert any("capacity contract" in r.message for r in caplog.records)

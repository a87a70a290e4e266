"""Geometry + BVH tests: primitive intersection against closed forms, and
BVH traversal equivalence with the brute-force reference intersector."""

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_customization_tpu.render import bvh as bvh_mod
from mitsuba_customization_tpu.render import geometry as geo
from mitsuba_customization_tpu.render.records import Ray


def _make_geom(prim_type, p0, e1, e2, **kw):
    p = len(prim_type)
    zeros3 = np.zeros((p, 3), np.float32)
    zeros2 = np.zeros((p, 2), np.float32)
    d = dict(
        prim_type=jnp.asarray(prim_type, dtype=jnp.int32),
        p0=jnp.asarray(p0, dtype=jnp.float32),
        e1=jnp.asarray(e1, dtype=jnp.float32),
        e2=jnp.asarray(e2, dtype=jnp.float32),
        vn0=jnp.asarray(kw.get("vn0", zeros3)),
        vn1=jnp.asarray(kw.get("vn1", zeros3)),
        vn2=jnp.asarray(kw.get("vn2", zeros3)),
        uv0=jnp.asarray(zeros2),
        uv1=jnp.asarray(zeros2),
        uv2=jnp.asarray(zeros2),
        mat_id=jnp.zeros(p, dtype=jnp.int32),
        emitter_id=jnp.full(p, -1, dtype=jnp.int32),
        shape_id=jnp.zeros(p, dtype=jnp.int32),
    )
    return geo.Geometry(**d)


def test_ray_sphere_closed_form():
    g = _make_geom(
        [geo.SPHERE],
        [[0.0, 0.0, 5.0]],
        [[1.0, 0, 0]],  # radius 1
        [[0, 0, 0]],
    )
    ray = Ray.make(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]])
    )
    t, prim, u, v = geo.intersect_brute(g, ray)
    assert abs(float(t[0]) - 4.0) < 1e-5
    assert int(prim[0]) == 0
    # from inside: hits far side
    ray2 = Ray.make(jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    t2, _, _, _ = geo.intersect_brute(g, ray2)
    assert abs(float(t2[0]) - 1.0) < 1e-5


def test_ray_triangle_closed_form():
    # triangle in z=2 plane
    g = _make_geom(
        [geo.TRI],
        [[0.0, 0.0, 2.0]],
        [[2.0, 0.0, 0.0]],
        [[0.0, 2.0, 0.0]],
        vn0=[[0, 0, -1.0]],
        vn1=[[0, 0, -1.0]],
        vn2=[[0, 0, -1.0]],
    )
    ray = Ray.make(jnp.asarray([[0.5, 0.5, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    t, prim, u, v = geo.intersect_brute(g, ray)
    assert abs(float(t[0]) - 2.0) < 1e-5
    assert abs(float(u[0]) - 0.25) < 1e-5 and abs(float(v[0]) - 0.25) < 1e-5
    # miss outside the triangle
    ray2 = Ray.make(jnp.asarray([[3.0, 3.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    t2, prim2, _, _ = geo.intersect_brute(g, ray2)
    assert np.isinf(float(t2[0])) and int(prim2[0]) == -1


def test_interaction_normals():
    g = _make_geom(
        [geo.SPHERE], [[0.0, 0.0, 0.0]], [[2.0, 0, 0]], [[0, 0, 0]]
    )
    ray = Ray.make(jnp.asarray([[5.0, 0.0, 0.0]]), jnp.asarray([[-1.0, 0.0, 0.0]]))
    si = geo.compute_interaction(g, ray, *geo.intersect_brute(g, ray))
    assert bool(si.valid[0])
    assert np.allclose(np.asarray(si.p[0]), [2.0, 0, 0], atol=1e-5)
    assert np.allclose(np.asarray(si.n[0]), [1.0, 0, 0], atol=1e-5)
    # wi in local frame points along +z (normal incidence)
    assert np.allclose(np.asarray(si.wi[0]), [0, 0, 1.0], atol=1e-5)


def _random_scene(rng, n_tri=200, n_sph=20):
    # random small triangles + spheres in [-1,1]^3
    base = rng.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (n_tri, 3)).astype(np.float32)
    centers = rng.uniform(-1, 1, (n_sph, 3)).astype(np.float32)
    radii = rng.uniform(0.05, 0.2, (n_sph, 1)).astype(np.float32)
    prim_type = [geo.TRI] * n_tri + [geo.SPHERE] * n_sph
    p0 = np.concatenate([base, centers])
    e1_all = np.concatenate([e1, np.concatenate([radii, np.zeros((n_sph, 2), np.float32)], 1)])
    e2_all = np.concatenate([e2, np.zeros((n_sph, 3), np.float32)])
    return _make_geom(prim_type, p0, e1_all, e2_all)


def test_bvh_matches_brute(rng):
    g = _random_scene(rng)
    tree = bvh_mod.build(g)
    n_rays = 500
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray.make(jnp.asarray(o), jnp.asarray(d))
    t_b, p_b, u_b, v_b = jax.jit(geo.intersect_brute)(g, ray)
    t_t, p_t, u_t, v_t = jax.jit(bvh_mod.intersect, static_argnums=())(
        tree, g, ray
    )
    np.testing.assert_allclose(np.asarray(t_t), np.asarray(t_b), rtol=1e-4)
    # same primitive except exact ties
    same = np.asarray(p_t) == np.asarray(p_b)
    assert same.mean() > 0.995, same.mean()


def test_bvh_occlusion_matches(rng):
    g = _random_scene(rng, 100, 10)
    tree = bvh_mod.build(g)
    n_rays = 300
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    maxt = rng.uniform(0.5, 3.0, n_rays).astype(np.float32)
    ray = Ray(o=jnp.asarray(o), d=jnp.asarray(d), maxt=jnp.asarray(maxt))
    occ_b = np.asarray(geo.occluded_brute(g, ray))
    occ_t = np.asarray(bvh_mod.occluded(tree, g, ray))
    assert (occ_b == occ_t).mean() > 0.995


def test_bvh_single_prim():
    g = _make_geom([geo.SPHERE], [[0.0, 0.0, 3.0]], [[1.0, 0, 0]], [[0, 0, 0]])
    tree = bvh_mod.build(g)
    assert tree.n_nodes == 1
    ray = Ray.make(jnp.zeros((4, 3)) , jnp.broadcast_to(jnp.asarray([0.0, 0, 1.0]), (4, 3)))
    t, prim, _, _ = bvh_mod.intersect(tree, g, ray)
    assert np.allclose(np.asarray(t), 2.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Cylinder + instancing (round-2 verdict item 8)
# ---------------------------------------------------------------------------


def test_ray_cylinder_axis_cases():
    from mitsuba_customization_tpu.render.geometry import ray_cylinder

    p0 = jnp.asarray([0.0, 0.0, 0.0])
    axis = jnp.asarray([0.0, 0.0, 2.0])
    # perpendicular hit at the midpoint
    o = jnp.asarray([3.0, 0.0, 1.0])
    d = jnp.asarray([-1.0, 0.0, 0.0])
    t, hit = ray_cylinder(o, d, p0, axis, 0.5)
    assert bool(hit) and abs(float(t) - 2.5) < 1e-5
    # beyond the segment end: no caps -> miss
    o2 = jnp.asarray([3.0, 0.0, 5.0])
    t2, hit2 = ray_cylinder(o2, d, p0, axis, 0.5)
    assert not bool(hit2)
    # ray parallel to axis outside the tube -> miss
    o3 = jnp.asarray([1.0, 0.0, -5.0])
    d3 = jnp.asarray([0.0, 0.0, 1.0])
    t3, hit3 = ray_cylinder(o3, d3, p0, axis, 0.5)
    assert not bool(hit3)
    # from inside: exits through the wall
    o4 = jnp.asarray([0.0, 0.0, 1.0])
    t4, hit4 = ray_cylinder(o4, jnp.asarray([1.0, 0.0, 0.0]), p0, axis, 0.5)
    assert bool(hit4) and abs(float(t4) - 0.5) < 1e-5


def test_cylinder_scene_render():
    import mitsuba_customization_tpu as mct

    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "aov_normals"},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": {
                    "look_at": {
                        "origin": [0, 0, -4], "target": [0, 0, 0],
                        "up": [0, 1, 0],
                    }
                },
                "film": {"width": 32, "height": 32},
                "sampler": {"type": "independent", "sample_count": 1},
            },
            "rod": {
                "type": "cylinder",
                "p0": [0, -1, 0],
                "p1": [0, 1, 0],
                "radius": 0.4,
                "bsdf": {"type": "diffuse"},
            },
            "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
        }
    )
    img = np.asarray(mct.render(scene, spp=1, seed=0))
    # the rod covers the center column; normals point back at the camera
    # (-z world) there => aov encodes ~(0.5, 0.5, 0)
    center = img[16, 16]
    assert center[2] < 0.2 and abs(center[0] - 0.5) < 0.2
    # background stays black
    assert img[2, 2].sum() == 0.0


def test_instance_matches_manual_copies():
    import mitsuba_customization_tpu as mct

    base = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective",
            "fov": 45,
            "to_world": {
                "look_at": {
                    "origin": [0, 1, -5], "target": [0, 0, 0],
                    "up": [0, 1, 0],
                }
            },
            "film": {"width": 24, "height": 24},
            "sampler": {"type": "independent", "sample_count": 8},
        },
        "light": {"type": "constant", "radiance": [1.0, 1.0, 1.0]},
    }
    pair = {
        "ball": {
            "type": "sphere", "radius": 0.5,
            "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.2, 0.2]},
        },
        "box": {
            "type": "cube",
            "to_world": {"scale": 0.3, "translate": [0, 0.9, 0]},
            "bsdf": {"type": "diffuse", "reflectance": [0.2, 0.8, 0.2]},
        },
    }
    inst = dict(base)
    inst["grp"] = {"type": "shapegroup", **pair}
    inst["i0"] = {
        "type": "instance", "shapegroup": "grp",
        "to_world": {"translate": [-1.2, 0, 0]},
    }
    inst["i1"] = {
        "type": "instance", "shapegroup": "grp",
        "to_world": {"translate": [1.2, 0, 0], "rotate": {
            "axis": [0, 1, 0], "angle": 45}},
    }

    manual = dict(base)
    import copy

    from mitsuba_customization_tpu.render.scene import _as_transform

    for name, shift, rot in (
        ("a", [-1.2, 0, 0], None),
        ("b", [1.2, 0, 0], {"axis": [0, 1, 0], "angle": 45}),
    ):
        outer = {"translate": shift}
        if rot is not None:
            outer = {"rotate": rot, "translate": shift}
        outer_m = _as_transform(outer).astype(np.float64)
        for sname, sval in pair.items():
            sv = copy.deepcopy(sval)
            inner_m = _as_transform(sv.get("to_world")).astype(np.float64)
            sv["to_world"] = (outer_m @ inner_m).tolist()
            manual[f"{name}_{sname}"] = sv

    img_i = np.asarray(mct.render(mct.load_dict(inst), spp=8, seed=0))
    img_m = np.asarray(mct.render(mct.load_dict(manual), spp=8, seed=0))
    np.testing.assert_allclose(img_i, img_m, rtol=1e-4, atol=1e-5)

"""Multi-bounce external anchors: matpreview-class scene vs the
independent numpy MIS path tracer (round-2 verdict item 5).

Gates BASELINE configs 1-2: a displaced-icosphere OBJ mesh with a MERL
material + GGX floor + rectangle area light, 3-bounce path tracing with
NEE + MIS on both sides. The reference uses different RNG, cosine BSDF
sampling (vs luminance IS / VNDF), an independently-written trilinear
MERL lookup, and its own MIS pairing — agreement is a Z-test over MC
standard errors. This anchor caught a real bug on first use:
face_normals=True silently produced smooth shading (round-3 fix in
render/scene.py add_mesh).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba_customization_tpu as mct
from mitsuba_customization_tpu.render.integrator import render_jit

from fixtures import synthetic_table
from reference_renderer import (
    PathScene,
    make_blob_mesh,
    render_path_reference,
    ztest_images,
)

ETA = [0.2, 0.92, 1.1]
K = [3.9, 2.45, 2.14]
ALPHA = 0.3
LIGHT_RAD = [12.0, 11.0, 10.0]
CAM = {"origin": [0, 1.0, -3.8], "target": [0, 0, 0], "fov": 40.0}


def _quad(y, half, normal_up):
    """Axis-aligned horizontal quad at height y -> (verts, faces)."""
    v = np.asarray(
        [
            [-half, y, -half],
            [half, y, -half],
            [half, y, half],
            [-half, y, half],
        ],
        np.float32,
    )
    if normal_up:
        f = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    else:
        f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    # verify orientation
    n = np.cross(v[f[0, 1]] - v[f[0, 0]], v[f[0, 2]] - v[f[0, 0]])
    assert (n[1] > 0) == normal_up, n
    return v, f


def _build_scene_pair(tmp_path):
    """(mct scene, PathScene) with identical geometry + materials."""
    bv, bf = make_blob_mesh(n_sub=2)
    bv = bv * 0.85  # keep the blob above the floor
    fv, ff = _quad(-1.0, 4.0, True)
    lv, lf = _quad(2.5, 1.0, False)
    table = synthetic_table(alpha=0.35, diffuse=0.25, spec=0.4,
                            rgb=(0.3, 0.4, 0.9))

    # --- framework scene (blob through the OBJ loader) ---
    obj_path = os.path.join(tmp_path, "blob.obj")
    with open(obj_path, "w") as fh:
        for p in bv:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for a, b, c in bf + 1:
            fh.write(f"f {a} {b} {c}\n")
    scene = mct.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "moment", "max_depth": 3,
                           "rr_depth": 99},
            "sensor": {
                "type": "perspective",
                "fov": CAM["fov"],
                "to_world": {
                    "look_at": {
                        "origin": CAM["origin"], "target": CAM["target"],
                        "up": [0, 1, 0],
                    }
                },
                "film": {"width": 24, "height": 24},
                "sampler": {"type": "independent", "sample_count": 256},
            },
            "blob": {
                "type": "obj",
                "filename": obj_path,
                "face_normals": True,
                "bsdf": {"type": "merl", "table": table},
            },
            "floor": {
                "type": "mesh",
                "vertices": fv.tolist(),
                "faces": ff.tolist(),
                "face_normals": True,
                "bsdf": {
                    "type": "roughconductor", "alpha": ALPHA,
                    "eta": ETA, "k": K,
                },
            },
            "panel": {
                "type": "mesh",
                "vertices": lv.tolist(),
                "faces": lf.tolist(),
                "face_normals": True,
                "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
                "emitter": {"type": "area", "radiance": LIGHT_RAD},
            },
        }
    )

    # --- reference scene (one triangle soup) ---
    def soup(v, f):
        p0 = v[f[:, 0]].astype(np.float64)
        e1 = v[f[:, 1]].astype(np.float64) - p0
        e2 = v[f[:, 2]].astype(np.float64) - p0
        return p0, e1, e2

    parts = [soup(bv, bf), soup(fv, ff), soup(lv, lf)]
    p0 = np.concatenate([p[0] for p in parts])
    e1 = np.concatenate([p[1] for p in parts])
    e2 = np.concatenate([p[2] for p in parts])
    mat_id = np.concatenate(
        [
            np.zeros(len(bf), np.int32),
            np.ones(len(ff), np.int32),
            np.full(len(lf), 2, np.int32),
        ]
    )
    emissive = np.concatenate(
        [np.zeros(len(bf) + len(ff), bool), np.ones(len(lf), bool)]
    )
    ref_scene = PathScene(
        p0, e1, e2, mat_id, emissive, LIGHT_RAD,
        materials=[
            {"type": "merl", "table": np.asarray(table)},
            {"type": "ggx", "alpha": ALPHA, "eta": ETA, "k": K},
            {"type": "diffuse", "albedo": [0, 0, 0]},
        ],
    )
    return scene, ref_scene


@pytest.mark.slow
def test_matpreview_class_ztest(tmp_path):
    scene, ref_scene = _build_scene_pair(str(tmp_path))
    spp = 256
    img = np.asarray(render_jit(scene, spp=spp, seed=11))
    ours = img[..., :3]
    ours_var = np.maximum(img[..., 3:] - ours * ours, 0.0)

    ref_spp = 384
    ref, ref_var = render_path_reference(
        ref_scene, CAM, res=24, spp=ref_spp, max_depth=3, seed=5
    )
    # Z-test over MC noise + a floor for deterministic interpolation bias
    # (nearest-neighbor vs trilinear MERL) — SURVEY.md §4.1 pattern.
    se = np.sqrt(ours_var / spp + ref_var / ref_spp) + 0.015 * (ref + 0.05)
    z = np.abs(ours - ref) / se
    frac_ok = float(np.mean(z < 4.0))
    assert frac_ok > 0.98, (frac_ok, float(z.max()))
    # global brightness agreement
    assert abs(ours.mean() - ref.mean()) / ref.mean() < 0.05, (
        ours.mean(), ref.mean())


@pytest.mark.slow
def test_config2_gradient_fd_vs_ad(tmp_path):
    """Gradient anchor on the config-2 scene: AD (detached path replay)
    vs central finite differences of the primal renderer on the GGX floor
    roughness. Expectations agree; the FD estimator shares seeds."""
    from mitsuba_customization_tpu.render import params as params_mod
    from mitsuba_customization_tpu.render.integrator import render

    scene, _ = _build_scene_pair(str(tmp_path))
    full = params_mod.traverse(scene)
    key = "bsdf.roughconductor.alpha_u"
    key_v = "bsdf.roughconductor.alpha_v"
    spp = 96

    def mean_img(alpha, seed):
        sc = params_mod.update(
            scene, {key: alpha, key_v: alpha}
        )
        img = render(sc, spp=spp, seed=seed, integrator="path",
                     ad_mode=True)
        return jnp.mean(img)

    a0 = full[key]
    g_ad = 0.0
    fd = 0.0
    eps = 0.02
    seeds = (3, 4, 5)
    for s in seeds:
        g_ad += float(jnp.sum(jax.grad(mean_img)(a0, jnp.uint32(s))))
        fp = float(mean_img(a0 + eps, jnp.uint32(s)))
        fm = float(mean_img(a0 - eps, jnp.uint32(s)))
        fd += (fp - fm) / (2 * eps)
    g_ad /= len(seeds)
    fd /= len(seeds)
    assert np.isfinite(g_ad) and np.isfinite(fd)
    assert abs(g_ad - fd) < 0.35 * max(abs(fd), 0.02), (g_ad, fd)

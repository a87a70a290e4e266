"""Round-5 third-accel-level proof: a >500k-triangle scene traced by the
packet cluster path (VMEM-resident box table). Renders one frame of a
two-blob matpreview variant and records rays/s + per-stage timings.
Writes PROFILE_bigscene_r05.json."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def big_scene(res=512, spp=4, depth=4):
    import mitsuba_customization_tpu as mct
    from __graft_entry__ import _synthetic_merl_table
    from mitsuba_customization_tpu.render.sensors import look_at
    from mitsuba_customization_tpu.utils.meshgen import (
        icosphere_blob, vertex_normals,
    )

    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": depth},
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": look_at([0, 1.6, -3.9], [0, 0.1, 0], [0, 1, 0]),
            "film": {"width": res, "height": res},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "floor": {
            "type": "rectangle",
            "to_world": {"rotate": {"axis": [1, 0, 0], "angle": -90},
                         "scale": 12.0, "translate": [0, -1.2, 0]},
            "bsdf": {"type": "roughconductor", "alpha": 0.25},
        },
        "light": {
            "type": "rectangle",
            "to_world": {"rotate": {"axis": [1, 0, 0], "angle": 90},
                         "scale": 1.2, "translate": [1.5, 3.2, -1.0]},
            "emitter": {"type": "area", "radiance": [18.0, 17.0, 15.0]},
        },
        "sky": {"type": "constant", "radiance": [0.08, 0.09, 0.12]},
    }
    for i, (nsub, off) in enumerate(((7, [-0.9, 0, 0.3]),
                                     (7, [1.2, -0.2, -0.4]))):
        v, f = icosphere_blob(n_sub=nsub)
        vn = vertex_normals(v, f)
        d[f"blob_{i}"] = {
            "type": "mesh",
            "vertices": (v * 0.8 + np.asarray(off, np.float32)),
            "faces": f,
            "normals": vn,
            "bsdf": {"type": "merl",
                     "table": _synthetic_merl_table(0.1, [1.0, 0.8, 0.5])},
        }
    return mct.load_dict(d)


def main():
    from bench import _measure, _probe_compact_schedule

    t0 = time.time()
    scene = big_scene()
    build_s = time.time() - t0
    n_prims = int(scene.geometry.n_prims)
    rec = {
        "n_prims": n_prims,
        "intersector": scene.config.intersector,
        "n_clusters": int(scene.clusters.cl_box.shape[0])
        if scene.clusters is not None else 0,
        "box_table": "VMEM" if (
            scene.clusters is not None
            and scene.clusters.cl_box.shape[0] > 8192
        ) else "SMEM",
        "build_s": round(build_s, 1),
    }
    print(rec, flush=True)
    assert scene.config.intersector == "cluster", "fell back to BVH!"
    assert n_prims > 500_000

    scene, fracs = _probe_compact_schedule(scene, spp=2)
    rec["compact_schedule"] = [round(f, 3) for f in fracs]
    rec["rays_per_s"] = _measure(scene, 4, n_iter=3)
    print("rays_per_s", rec["rays_per_s"], flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_bigscene_r05.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

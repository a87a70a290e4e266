"""Quick matpreview-only rays/s measurement (the BASELINE north-star
workload), plus a primary-intersect tile_rows check. Used during round-5
optimization; bench.py remains the driver entry."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _matpreview_scene
from bench import _measure, _probe_compact_schedule


def main():
    spp = 8
    mp = _matpreview_scene(res=512, spp=spp, depth=8, n_sub=5)
    mp, fracs = _probe_compact_schedule(mp, spp=4)
    r = _measure(mp, spp, n_iter=3)
    out = {
        "matpreview_rays_per_s": r,
        "compact_schedule": [round(f, 4) for f in fracs],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Packet-style two-level cluster intersector — the TPU-native accel path.

TPU counterpart of the reference's accelerated `Scene::ray_intersect`
([S3] mitsuba3 src/render/scene_embree.inl / scene_optix.inl, SURVEY.md
§2.3 L3). GPUs traverse per-ray BVHs with hardware stacks; a TPU has
neither per-lane gathers nor divergent control flow, so per-lane node
cursors (render/bvh.py lock-step skip links) pay an XLA gather per step —
milliseconds per step at wavefront scale. This module restructures
traversal around what the hardware does well, following the same design
rule as the sorted-segment BRDF kernels (ops/merl_sorted.py): uniform
tile-level control flow + dense vector math + scalar-indexed DMAs.

Structure:

* Host build (numpy): primitives are partitioned by recursive
  widest-axis median split into spatially tight CLUSTERS of <= L=32
  prims, emitted in DFS order (neighbors stay adjacent); every GROUP=16
  consecutive clusters form a SUPERCLUSTER with a union AABB. Cluster
  payloads (all per-prim fields) are packed into (C, 32, 128) f32 slabs.
* Pallas kernel: the grid walks 2048-lane ray tiles. Each tile tests the
  supercluster boxes (scalar loads from SMEM, dense VPU slab tests over
  all lanes), descends into a group only when ANY lane's entry distance
  beats its current best hit, then per surviving cluster DMAs the 16 KB
  slab into VMEM (persistent single-slot cache across the sequential
  grid) and runs a statically unrolled masked Moller-Trumbore /
  sphere / cylinder loop over the 32 slots. This is classic packet
  traversal at packet size 2048: lanes ride their tile's union of
  visited clusters, so the render loop's blocked lane order (16x16
  pixel blocks) is what makes it fast.
* Winner payload: instead of a post-pass per-lane gather of 13 geometry
  fields (the XLA gather costs ~3.8 ms/field at 2M lanes), the kernel
  resolves the winning slot's full field row in-kernel with one
  take_along_axis per field per improving cluster visit, and returns a
  ready-made per-lane Geometry row — `interaction_from_g` consumes it
  directly.

Capacity contract: cluster boxes live in SMEM up to SMEM_BOXES_MAX
clusters and migrate whole into VMEM past that (1 MB at 32k clusters —
the round-5 third accel level); slabs always stream from HBM (16 KB per
cluster). MAX_PRIMS (~0.5M) bounds the build; past it render/scene.py
falls back to the skip-link BVH with a loud warning.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_customization_tpu.render import geometry as geo
from mitsuba_customization_tpu.render.records import Ray

LANE = 128
# Default packet: 4096 lanes. Larger packets amortize per-visit slab work
# better once the entry-ordered descent prunes most visits (round-5
# sweep, PROFILE_order_r05.json: bounce closest 124 ms @ 32 rows vs
# 147 @ 16 at 2M sorted rays; primary 83 vs 102); smaller packets shrink
# each tile's union of visited clusters. TILE_ROWS stays a launch
# parameter for per-pass tuning.
TILE_ROWS = 32
TILE = TILE_ROWS * LANE


def auto_tile_rows(n):
    """Packet size by STATIC wavefront size. Compaction concentrates the
    late-bounce survivors, so a 4096-lane tile of a small wavefront spans
    a huge spatial region and visits many clusters; smaller packets cut
    the per-visit (tile_rows, LANE) slot-test cost faster than the visit
    count grows (round-5 sweep on real b2/b3 wavefronts)."""
    if n >= 1 << 20:
        return 32
    if n >= 1 << 18:
        return 16
    return 8

L = 32       # prims per cluster (slab slot count)
GROUP = 16   # clusters per supercluster

# Field rows in a cluster slab (minor axis = slot, padded to LANE).
_F_TYPE = 0            # prim_type (-1 = empty slot)
_F_P0 = 1              # 1..3
_F_E1 = 4              # 4..6
_F_E2 = 7              # 7..9
_F_VN0 = 10            # 10..12
_F_VN1 = 13            # 13..15
_F_VN2 = 16            # 16..18
_F_UV0 = 19            # 19..20
_F_UV1 = 21            # 21..22
_F_UV2 = 23            # 23..24
_F_MAT = 25
_F_EMIT = 26
_F_SHAPE = 27
_F_PRIM = 28
NFIELDS = 32           # rows per slab (padded to a DMA-friendly multiple)

_BIG = 1e30
SENT_CODE = 1e9  # winner-walk sentinel (all valid codes < C_pad * L)

# Capacity contract (round-5, third accel level): cluster AABBs live in
# SMEM (C_pad * 32 B) up to SMEM_BOXES_MAX clusters; past that the box
# table moves WHOLE into VMEM (32k clusters = 1 MB — far under the VMEM
# budget) with identical kernel code, so the packet path now covers
# ~0.5M-primitive scenes. Slabs always stream from HBM (16 KB/cluster).
# Past MAX_PRIMS render/scene.py keeps the skip-link BVH (with a loud
# warning).
SMEM_BOXES_MAX = 8192
# 1M prims => worst case ~64k clusters => 2 MB VMEM boxes + ~1 GB HBM
# slabs — both comfortably inside budget.
MAX_PRIMS = 1 << 20


def _box_spec(c_pad):
    if c_pad <= SMEM_BOXES_MAX:
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.BlockSpec(memory_space=pltpu.VMEM)

# Opt-in: run the kernels in Pallas interpret mode on CPU backends instead
# of falling back to the skip-link BVH (render/scene.py _mode). This keeps
# the PRODUCTION intersector on the traced path for virtual-device mesh
# tests and the driver's dryrun_multichip (round-4 verdict: multi-chip
# mesh-scene rendering was untested in any mode).
ALLOW_INTERPRET = False


def _auto_interpret(interpret):
    if interpret:
        return True
    return ALLOW_INTERPRET and jax.default_backend() == "cpu"


class ClusterSet(NamedTuple):
    """Device-resident cluster acceleration structure.

    sc_box:  (S, 8) f32 supercluster AABBs [min xyz, max xyz, pad, pad]
    cl_box:  (C_pad, 8) f32 cluster AABBs (empty clusters = inverted box)
    cl_meta: (C_pad,) i32 bit0 = cluster contains non-triangle prims
    slabs:   (C_pad, NFIELDS, LANE) f32 packed per-prim fields
    """

    sc_box: jnp.ndarray
    cl_box: jnp.ndarray
    cl_meta: jnp.ndarray
    slabs: jnp.ndarray

    @property
    def n_super(self):
        return self.sc_box.shape[0]


# ---------------------------------------------------------------------------
# Host-side build
# ---------------------------------------------------------------------------


def _partition(ids, bb_min, bb_max, out):
    """Recursive widest-axis median split to <= L prims, DFS order."""
    if len(ids) <= L:
        out.append(ids)
        return
    c = 0.5 * (bb_min[ids] + bb_max[ids])
    axis = int(np.argmax(c.max(0) - c.min(0)))
    order = np.argsort(c[:, axis], kind="stable")
    half = len(ids) // 2
    _partition(ids[order[:half]], bb_min, bb_max, out)
    _partition(ids[order[half:]], bb_min, bb_max, out)


def build(geom: geo.Geometry) -> ClusterSet:
    """Pack the primitive soup into the two-level cluster structure.

    Accepts a numpy or device Geometry; all build arithmetic is host
    numpy (eager device ops pay per-op compile RPCs on tunneled TPU
    backends — see scene.py build_np).
    """
    g = jax.tree_util.tree_map(np.asarray, geom)
    is_tri = g.prim_type == geo.TRI
    is_cyl = g.prim_type == geo.CYLINDER
    p1 = g.p0 + g.e1
    p2 = g.p0 + g.e2
    tri_min = np.minimum(g.p0, np.minimum(p1, p2))
    tri_max = np.maximum(g.p0, np.maximum(p1, p2))
    r = g.e1[:, 0:1]
    rc = g.e2[:, 0:1]
    bb_min = np.where(
        is_tri[:, None], tri_min,
        np.where(is_cyl[:, None], np.minimum(g.p0, p1) - rc, g.p0 - r),
    ).astype(np.float64)
    bb_max = np.where(
        is_tri[:, None], tri_max,
        np.where(is_cyl[:, None], np.maximum(g.p0, p1) + rc, g.p0 + r),
    ).astype(np.float64)
    n = g.prim_type.shape[0]

    clusters: list[np.ndarray] = []
    _partition(np.arange(n, dtype=np.int64), bb_min, bb_max, clusters)

    c_pad = max(GROUP, (len(clusters) + GROUP - 1) // GROUP * GROUP)
    s_count = c_pad // GROUP

    cl_box = np.zeros((c_pad, 8), np.float32)
    cl_box[:, 0:3] = _BIG
    cl_box[:, 3:6] = -_BIG
    cl_meta = np.zeros((c_pad,), np.int32)
    slabs = np.zeros((c_pad, NFIELDS, LANE), np.float32)
    slabs[:, _F_TYPE, :] = -1.0

    for ci, ids in enumerate(clusters):
        cl_box[ci, 0:3] = bb_min[ids].min(0)
        cl_box[ci, 3:6] = bb_max[ids].max(0)
        cl_meta[ci] = int((g.prim_type[ids] != geo.TRI).any())
        k = len(ids)
        slabs[ci, _F_TYPE, :k] = g.prim_type[ids]
        slabs[ci, _F_P0:_F_P0 + 3, :k] = g.p0[ids].T
        slabs[ci, _F_E1:_F_E1 + 3, :k] = g.e1[ids].T
        slabs[ci, _F_E2:_F_E2 + 3, :k] = g.e2[ids].T
        slabs[ci, _F_VN0:_F_VN0 + 3, :k] = g.vn0[ids].T
        slabs[ci, _F_VN1:_F_VN1 + 3, :k] = g.vn1[ids].T
        slabs[ci, _F_VN2:_F_VN2 + 3, :k] = g.vn2[ids].T
        slabs[ci, _F_UV0:_F_UV0 + 2, :k] = g.uv0[ids].T
        slabs[ci, _F_UV1:_F_UV1 + 2, :k] = g.uv1[ids].T
        slabs[ci, _F_UV2:_F_UV2 + 2, :k] = g.uv2[ids].T
        slabs[ci, _F_MAT, :k] = g.mat_id[ids]
        slabs[ci, _F_EMIT, :k] = g.emitter_id[ids]
        slabs[ci, _F_SHAPE, :k] = g.shape_id[ids]
        slabs[ci, _F_PRIM, :k] = ids

    sc_box = np.zeros((s_count, 8), np.float32)
    for s in range(s_count):
        grp = cl_box[s * GROUP:(s + 1) * GROUP]
        sc_box[s, 0:3] = grp[:, 0:3].min(0)
        sc_box[s, 3:6] = grp[:, 3:6].max(0)

    return ClusterSet(
        sc_box=jnp.asarray(sc_box),
        cl_box=jnp.asarray(cl_box),
        cl_meta=jnp.asarray(cl_meta),
        slabs=jnp.asarray(slabs),
    )


# ---------------------------------------------------------------------------
# Kernel helpers (run inside Pallas)
# ---------------------------------------------------------------------------


def _box_entry(box_at, c, o, inv, t_best):
    """Scalar-box vs lane-bundle slab test; returns (hit mask, t_entry).

    box_at(c, k) is a scalar accessor closure — SMEM box tables are
    stored FLAT (c * 8 + k indexing; 2-D SMEM arrays pad the minor axis
    to the 512-B sublane stride, 16x the footprint), VMEM tables stay
    (C, 8)."""
    near = None
    far = None
    for k in range(3):
        lo = (box_at(c, k) - o[k]) * inv[k]
        hi = (box_at(c, 3 + k) - o[k]) * inv[k]
        tmin = jnp.minimum(lo, hi)
        tmax = jnp.maximum(lo, hi)
        near = tmin if near is None else jnp.maximum(near, tmin)
        far = tmax if far is None else jnp.minimum(far, tmax)
    hit = (near <= far) & (far > 0.0) & (near < t_best)
    return hit, near


def _tri_test(o, d, p0, e1, e2):
    """Moller-Trumbore against one broadcast triangle. Returns (t, u, v)
    with t = _BIG on miss (scalar prim data, lane-bundle rays)."""
    px = d[1] * e2[2] - d[2] * e2[1]
    py = d[2] * e2[0] - d[0] * e2[2]
    pz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tx = o[0] - p0[0]
    ty = o[1] - p0[1]
    tz = o[2] - p0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    )
    return jnp.where(ok, t, _BIG), u, v


def _sphere_test(o, d, c3, radius):
    ox = o[0] - c3[0]
    oy = o[1] - c3[1]
    oz = o[2] - c3[2]
    b = ox * d[0] + oy * d[1] + oz * d[2]
    cc = ox * ox + oy * oy + oz * oz - radius * radius
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 1e-7, t0, t1)
    ok = (disc >= 0.0) & (t > 1e-7)
    return jnp.where(ok, t, _BIG)


def _cyl_test(o, d, p0, axis3, radius):
    ax, ay, az = axis3
    length = jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-24))
    nx, ny, nz = ax / length, ay / length, az / length
    ocx = o[0] - p0[0]
    ocy = o[1] - p0[1]
    ocz = o[2] - p0[2]
    d_par = d[0] * nx + d[1] * ny + d[2] * nz
    oc_par = ocx * nx + ocy * ny + ocz * nz
    ddx = d[0] - d_par * nx
    ddy = d[1] - d_par * ny
    ddz = d[2] - d_par * nz
    oox = ocx - oc_par * nx
    ooy = ocy - oc_par * ny
    ooz = ocz - oc_par * nz
    qa = ddx * ddx + ddy * ddy + ddz * ddz
    qb = ddx * oox + ddy * ooy + ddz * ooz
    qc = oox * oox + ooy * ooy + ooz * ooz - radius * radius
    disc = qb * qb - qa * qc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / jnp.where(qa < 1e-12, 1e-12, qa)
    t0 = (-qb - sq) * inv_a
    t1 = (-qb + sq) * inv_a

    def on_seg(t):
        s = oc_par + t * d_par
        return (t > 1e-7) & (s >= 0.0) & (s <= length)

    ok0 = on_seg(t0)
    ok1 = on_seg(t1)
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, _BIG))
    ok = (disc >= 0.0) & (qa > 1e-12) & (ok0 | ok1)
    return jnp.where(ok, t, _BIG)


def _slot_tests(slab, o, d):
    """Statically unrolled masked tests over all L slots of the resident
    slab (generic: tri + sphere + cylinder per slot). Returns the
    per-lane best (t, slot, u, v) within this cluster."""
    t_c = jnp.full(o[0].shape, _BIG)
    u_c = jnp.zeros_like(t_c)
    v_c = jnp.zeros_like(t_c)
    slot_c = jnp.full(o[0].shape, -1, jnp.int32)
    for i in range(L):
        typ = slab[_F_TYPE, i]
        p0 = (slab[_F_P0, i], slab[_F_P0 + 1, i], slab[_F_P0 + 2, i])
        e1 = (slab[_F_E1, i], slab[_F_E1 + 1, i], slab[_F_E1 + 2, i])
        e2 = (slab[_F_E2, i], slab[_F_E2 + 1, i], slab[_F_E2 + 2, i])
        t_i, u_i, v_i = _tri_test(o, d, p0, e1, e2)
        t_i = jnp.where(typ == float(geo.TRI), t_i, _BIG)
        t_s = _sphere_test(o, d, p0, e1[0])
        t_y = _cyl_test(o, d, p0, e1, e2[0])
        t_i = jnp.where(typ == float(geo.SPHERE), t_s, t_i)
        t_i = jnp.where(typ == float(geo.CYLINDER), t_y, t_i)
        u_i = jnp.where(typ == float(geo.TRI), u_i, 0.0)
        v_i = jnp.where(typ == float(geo.TRI), v_i, 0.0)

        closer = t_i < t_c
        t_c = jnp.where(closer, t_i, t_c)
        u_c = jnp.where(closer, u_i, u_c)
        v_c = jnp.where(closer, v_i, v_c)
        slot_c = jnp.where(closer, i, slot_c)
    return t_c, slot_c, u_c, v_c


def _slot_tests_tri_only(slab, o, d):
    """Triangle-only unrolled slot loop (the fast path for mesh clusters)."""
    t_c = jnp.full(o[0].shape, _BIG)
    u_c = jnp.zeros_like(t_c)
    v_c = jnp.zeros_like(t_c)
    slot_c = jnp.full(o[0].shape, -1, jnp.int32)
    for i in range(L):
        typ = slab[_F_TYPE, i]
        p0 = (slab[_F_P0, i], slab[_F_P0 + 1, i], slab[_F_P0 + 2, i])
        e1 = (slab[_F_E1, i], slab[_F_E1 + 1, i], slab[_F_E1 + 2, i])
        e2 = (slab[_F_E2, i], slab[_F_E2 + 1, i], slab[_F_E2 + 2, i])
        t_i, u_i, v_i = _tri_test(o, d, p0, e1, e2)
        t_i = jnp.where(typ == float(geo.TRI), t_i, _BIG)
        closer = t_i < t_c
        t_c = jnp.where(closer, t_i, t_c)
        u_c = jnp.where(closer, u_i, u_c)
        v_c = jnp.where(closer, v_i, v_c)
        slot_c = jnp.where(closer, i, slot_c)
    return t_c, slot_c, u_c, v_c


# ---------------------------------------------------------------------------
# Closest-hit kernel
# ---------------------------------------------------------------------------

# Output rows: 0 t, 1 u, 2 v, 3..3+NFIELDS-1 winner slab fields.
OUT_ROWS = 3 + NFIELDS


def _make_dma_helpers(ablate, slabs_ref, slab, cache_ref, sem):
    """Double-buffered slab DMA with per-buffer resident/pending tracking.

    cache_ref (SMEM, 5): [resident0, resident1, pending0, pending1,
    hit-list count]. A start() into buffer b is skipped when the cluster
    is already resident there; wait(b) is a no-op when nothing is in
    flight. Callers alternate buffers (j % 2) so the next cluster's 16 KB
    slab streams while the current one's 32-slot tests run — the DMA wait
    was ~15 ms of the 85 ms 2M-lane bounce pass (PROFILE_visit_r05.json).
    """

    def start(c, b):
        if ablate & 1:  # ablate bit0: no DMA (profiling; results garbage)
            return

        @pl.when(cache_ref[b] != c)
        def _():
            pltpu.make_async_copy(
                slabs_ref.at[c], slab.at[b], sem.at[b]
            ).start()
            cache_ref[b] = c
            cache_ref[2 + b] = 1

    def wait(b):
        if ablate & 1:
            return

        @pl.when(cache_ref[2 + b] != 0)
        def _():
            pltpu.make_async_copy(
                slabs_ref.at[cache_ref[b]], slab.at[b], sem.at[b]
            ).wait()
            cache_ref[2 + b] = 0

    return start, wait


def _closest_kernel(n_super, tile_rows, cl_in_smem, ablate, ox_ref, oy_ref,
                    oz_ref, dx_ref, dy_ref, dz_ref, maxt_ref, scb_ref,
                    clb_ref, meta_ref, slabs_ref, out_ref, slab, cache_ref,
                    sem, ent_ref, hl_ref):
    sc_at = lambda c, k: scb_ref[c * 8 + k]  # SMEM tables are flat
    cl_at = (
        (lambda c, k: clb_ref[c * 8 + k]) if cl_in_smem
        else (lambda c, k: clb_ref[c, k])
    )
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    inv = tuple(
        1.0 / jnp.where(jnp.abs(c) < 1e-12, 1e-12, c) for c in d
    )
    maxt = maxt_ref[:]
    active = maxt > 0.0
    s_pad = ent_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    dma_start, dma_wait = _make_dma_helpers(
        ablate, slabs_ref, slab, cache_ref, sem
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        cache_ref[0] = -1
        cache_ref[1] = -1
        cache_ref[2] = 0
        cache_ref[3] = 0

    # init: t = min(maxt, root-box exit distance). Every primitive lies
    # inside the union of the supercluster boxes, so no ray can hit past
    # the point where it EXITS that union's bounding box — capping t_best
    # at the exit distance makes sky-escaping lanes (t_exit small, often
    # near 0 for rays leaving the scene) prune like close hits instead of
    # riding t_best = 1e30 through every box test. Without this, one sky
    # lane per 4096-lane tile pinned t_max at 1e30 and the tile-level
    # early-out below never fired on bounce wavefronts. Dead lanes t = 0.
    def _root_acc(s, bb):
        return (
            jnp.minimum(bb[0], sc_at(s, 0)),
            jnp.minimum(bb[1], sc_at(s, 1)),
            jnp.minimum(bb[2], sc_at(s, 2)),
            jnp.maximum(bb[3], sc_at(s, 3)),
            jnp.maximum(bb[4], sc_at(s, 4)),
            jnp.maximum(bb[5], sc_at(s, 5)),
        )

    root = jax.lax.fori_loop(
        0, n_super, _root_acc,
        (_BIG, _BIG, _BIG, -_BIG, -_BIG, -_BIG), unroll=False,
    )
    far = None
    for k in range(3):
        lo = (root[k] - o[k]) * inv[k]
        hi = (root[3 + k] - o[k]) * inv[k]
        fk = jnp.maximum(lo, hi)
        far = fk if far is None else jnp.minimum(far, fk)
    # exit distance with relative+absolute slack; rays missing the root
    # box entirely (far < 0) can hit nothing -> t cap 0
    t_exit = jnp.where(far > 0.0, far * 1.0001 + 1e-4, 0.0)
    out_ref[0] = jnp.where(
        active, jnp.minimum(jnp.minimum(maxt, t_exit), _BIG), 0.0
    )
    out_ref[1] = jnp.zeros_like(maxt)
    out_ref[2] = jnp.zeros_like(maxt)
    out_ref[3] = jnp.full_like(maxt, -1.0)

    # ---- pass 1: per-supercluster tile entry distances ----
    # ent[s] = min over lanes of the entry distance into supercluster s
    # (BIG when no lane's segment touches it). Stored as a VMEM row so the
    # selection loop below is pure vector math.
    ent_ref[:, :] = jnp.full((1, s_pad), _BIG)
    t_init = out_ref[0]

    def entry_pass(s, carry):
        hit, near = _box_entry(sc_at, s, o, inv, t_init)
        e = jnp.min(jnp.where(hit, near, _BIG))
        ent_ref[:, :] = jnp.where(col == s, e, ent_ref[:, :])
        return 0

    jax.lax.fori_loop(0, n_super, entry_pass, 0, unroll=False)

    # ---- pass 2: entry-ordered descent with early-out ----
    # Visit superclusters nearest-first: t_best collapses to its final
    # value within the first few visits and the per-cluster near < t_best
    # test prunes the rest. Once even the nearest unvisited entry exceeds
    # the tile's worst t_best, no lane can improve — remaining iterations
    # fall through (a handful of vector ops each). Each visited group
    # first box-tests its 16 clusters into an SMEM hit list, then walks
    # the list with double-buffered slab DMA (next slab in flight while
    # the current slots are tested).
    def visit_ordered(i, carry):
        ent = ent_ref[:, :]
        e = jnp.min(ent)
        s = jnp.min(jnp.where(ent == e, col, n_super))
        t_max = jnp.max(out_ref[0])

        @pl.when(e < t_max)
        def _():
            cache_ref[4] = 0

            def boxpass(c, _):
                hit, _n = _box_entry(cl_at, c, o, inv, out_ref[0])

                @pl.when(jnp.any(hit))
                def _():
                    k = cache_ref[4]
                    hl_ref[k] = c
                    cache_ref[4] = k + 1
                return 0

            jax.lax.fori_loop(
                s * GROUP, (s + 1) * GROUP, boxpass, 0, unroll=False
            )
            k = cache_ref[4]

            @pl.when(k > 0)
            def _():
                dma_start(hl_ref[0], 0)

                def walk(j, _):
                    b = jax.lax.rem(j, 2)

                    @pl.when(j + 1 < k)
                    def _():
                        dma_start(hl_ref[j + 1], jax.lax.rem(j + 1, 2))

                    dma_wait(b)
                    c = hl_ref[j]
                    # recheck: hits earlier in this group may have pruned
                    hit, _n = _box_entry(cl_at, c, o, inv, out_ref[0])
                    if ablate & 2:  # ablate bit1: skip the slot tests
                        out_ref[3] = jnp.where(
                            hit, out_ref[3] + 0.0, out_ref[3]
                        )
                        return 0

                    @pl.when(jnp.any(hit))
                    def _():
                        sl = slab.at[b]
                        # Tri-only clusters (the common case for mesh
                        # scenes) skip the sphere/cylinder slot math.
                        t_c, slot_c, u_c, v_c = jax.lax.cond(
                            meta_ref[c] != 0,
                            lambda: _slot_tests(sl, o, d),
                            lambda: _slot_tests_tri_only(sl, o, d),
                        )
                        improved = hit & (t_c < out_ref[0])
                        out_ref[0] = jnp.where(improved, t_c, out_ref[0])
                        out_ref[1] = jnp.where(improved, u_c, out_ref[1])
                        out_ref[2] = jnp.where(improved, v_c, out_ref[2])
                        code = (
                            c * L + jnp.clip(slot_c, 0, L - 1)
                        ).astype(jnp.float32)
                        out_ref[3] = jnp.where(improved, code, out_ref[3])
                    return 0

                jax.lax.fori_loop(0, k, walk, 0, unroll=False)
        ent_ref[:, :] = jnp.where(col == s, _BIG, ent)
        return 0

    jax.lax.fori_loop(0, n_super, visit_ordered, 0, unroll=False)

    # ---- deferred winner-field resolution ----
    # Traversal paid only a (t, u, v, code) update per improving cluster;
    # here one segment walk over the tile's few DISTINCT winner clusters
    # gathers all NFIELDS rows per lane (the merl_sorted tile-walk
    # pattern), with the NEXT winner cluster's slab prefetched while the
    # current one's 32 field rows resolve. Misses get the fill values.
    win_code = out_ref[3]
    for f in range(NFIELDS):
        fill = -1.0 if f in (_F_TYPE, _F_EMIT, _F_SHAPE, _F_PRIM) else 0.0
        out_ref[3 + f] = jnp.full_like(maxt, fill)
    # mat_id must be a valid index even on miss (dispatch masks on valid)
    out_ref[3 + _F_MAT] = jnp.zeros_like(maxt)

    def win_cond(state):
        return state[0] != SENT_CODE

    def win_body(state):
        cur, b = state
        c = jnp.floor(cur / float(L)).astype(jnp.int32)
        nxt = jnp.min(
            jnp.where(win_code >= (c + 1) * L, win_code, SENT_CODE)
        )
        nb = 1 - b

        @pl.when(nxt != SENT_CODE)
        def _():
            cn = jnp.floor(nxt / float(L)).astype(jnp.int32)
            dma_start(cn, nb)

        dma_wait(b)
        sl = slab.at[b]
        in_c = (win_code >= c * L) & (win_code < (c + 1) * L)
        idx = jnp.clip(
            (win_code - c * L).astype(jnp.int32), 0, LANE - 1
        )
        for f in range(NFIELDS):
            seg = jnp.broadcast_to(sl[f, :][None, :], (tile_rows, LANE))
            got = jnp.take_along_axis(seg, idx, axis=1)
            out_ref[3 + f] = jnp.where(in_c, got, out_ref[3 + f])
        return (nxt, nb)

    cur0 = jnp.min(jnp.where(win_code >= 0.0, win_code, SENT_CODE))
    if not (ablate & 4):  # ablate bit2: skip the winner-field walk
        @pl.when(cur0 != SENT_CODE)
        def _():
            c0 = jnp.floor(cur0 / float(L)).astype(jnp.int32)
            dma_start(c0, 0)

        jax.lax.while_loop(win_cond, win_body, (cur0, jnp.int32(0)))

    # misses: restore t = +inf semantics
    missed = win_code < 0.0
    out_ref[0] = jnp.where(missed, _BIG, out_ref[0])


def _shadow_kernel(n_super, tile_rows, cl_in_smem, ablate, ox_ref, oy_ref,
                   oz_ref, dx_ref, dy_ref, dz_ref, maxt_ref, scb_ref,
                   clb_ref, meta_ref, slabs_ref, hit_ref, slab, cache_ref,
                   sem, ent_ref, hl_ref):
    """Any-hit variant: hit_ref (TILE_ROWS, LANE) f32 1.0 = occluded.
    A lane that finds any hit drops out of further box tests; the tile
    skips whole groups once every live lane is resolved. Superclusters
    are visited nearest-entry-first (most occluders sit near the ray
    origin — surface self-shadowing), so occluded lanes die in the first
    visits and the tile's live set collapses early. Groups walk their
    box-hit clusters with double-buffered slab DMA (see _closest_kernel)."""
    sc_at = lambda c, k: scb_ref[c * 8 + k]
    cl_at = (
        (lambda c, k: clb_ref[c * 8 + k]) if cl_in_smem
        else (lambda c, k: clb_ref[c, k])
    )
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-12, 1e-12, c) for c in d)
    maxt = maxt_ref[:]
    active = maxt > 0.0
    s_pad = ent_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    dma_start, dma_wait = _make_dma_helpers(
        ablate, slabs_ref, slab, cache_ref, sem
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        cache_ref[0] = -1
        cache_ref[1] = -1
        cache_ref[2] = 0
        cache_ref[3] = 0

    hit_ref[:] = jnp.zeros_like(maxt)

    # Cap the box-test distance at the root-box exit (see _closest_kernel:
    # no occluder exists past the point where the ray leaves the union of
    # all boxes) — _SHADOW_INF rays toward distant/env emitters then prune
    # like finite ones. The occlusion compare below keeps the TRUE maxt.
    def _root_acc(s, bb):
        return (
            jnp.minimum(bb[0], sc_at(s, 0)),
            jnp.minimum(bb[1], sc_at(s, 1)),
            jnp.minimum(bb[2], sc_at(s, 2)),
            jnp.maximum(bb[3], sc_at(s, 3)),
            jnp.maximum(bb[4], sc_at(s, 4)),
            jnp.maximum(bb[5], sc_at(s, 5)),
        )

    root = jax.lax.fori_loop(
        0, n_super, _root_acc,
        (_BIG, _BIG, _BIG, -_BIG, -_BIG, -_BIG), unroll=False,
    )
    far = None
    for k in range(3):
        lo = (root[k] - o[k]) * inv[k]
        hi = (root[3 + k] - o[k]) * inv[k]
        fk = jnp.maximum(lo, hi)
        far = fk if far is None else jnp.minimum(far, fk)
    t_exit = jnp.where(far > 0.0, far * 1.0001 + 1e-4, 0.0)
    mt_cap = jnp.minimum(maxt, t_exit)

    # pass 1: per-supercluster entry distances (vs the full per-lane cap)
    ent_ref[:, :] = jnp.full((1, s_pad), _BIG)
    t_cap0 = jnp.where(active, mt_cap, 0.0)

    def entry_pass(s, carry):
        hit, near = _box_entry(sc_at, s, o, inv, t_cap0)
        e = jnp.min(jnp.where(hit, near, _BIG))
        ent_ref[:, :] = jnp.where(col == s, e, ent_ref[:, :])
        return 0

    jax.lax.fori_loop(0, n_super, entry_pass, 0, unroll=False)

    # pass 2: nearest-first visits; stop once every lane is resolved
    def visit_ordered(i, carry):
        ent = ent_ref[:, :]
        e = jnp.min(ent)
        s = jnp.min(jnp.where(ent == e, col, n_super))
        unresolved = jnp.any(active & (hit_ref[:] == 0.0))

        @pl.when((e < _BIG) & unresolved)
        def _():
            cache_ref[4] = 0

            def boxpass(c, _):
                live = active & (hit_ref[:] == 0.0)
                t_cap = jnp.where(live, mt_cap, 0.0)
                boxhit, _n = _box_entry(cl_at, c, o, inv, t_cap)

                @pl.when(jnp.any(boxhit))
                def _():
                    k = cache_ref[4]
                    hl_ref[k] = c
                    cache_ref[4] = k + 1
                return 0

            jax.lax.fori_loop(
                s * GROUP, (s + 1) * GROUP, boxpass, 0, unroll=False
            )
            k = cache_ref[4]

            @pl.when(k > 0)
            def _():
                dma_start(hl_ref[0], 0)

                def walk(j, _):
                    b = jax.lax.rem(j, 2)

                    @pl.when(j + 1 < k)
                    def _():
                        dma_start(hl_ref[j + 1], jax.lax.rem(j + 1, 2))

                    dma_wait(b)
                    c = hl_ref[j]
                    live = active & (hit_ref[:] == 0.0)
                    t_cap = jnp.where(live, mt_cap, 0.0)
                    boxhit, _n = _box_entry(cl_at, c, o, inv, t_cap)
                    if ablate & 2:
                        hit_ref[:] = jnp.where(
                            boxhit, hit_ref[:] + 0.0, hit_ref[:]
                        )
                        return 0

                    @pl.when(jnp.any(boxhit))
                    def _():
                        sl = slab.at[b]
                        t_c, _slot, _u, _v = jax.lax.cond(
                            meta_ref[c] != 0,
                            lambda: _slot_tests(sl, o, d),
                            lambda: _slot_tests_tri_only(sl, o, d),
                        )
                        occ = boxhit & (t_c < maxt)
                        hit_ref[:] = jnp.where(occ, 1.0, hit_ref[:])
                    return 0

                jax.lax.fori_loop(0, k, walk, 0, unroll=False)
        ent_ref[:, :] = jnp.where(col == s, _BIG, ent)
        return 0

    jax.lax.fori_loop(0, n_super, visit_ordered, 0, unroll=False)


# ---------------------------------------------------------------------------
# Launch wrappers
# ---------------------------------------------------------------------------


def _pad_rays(ray: Ray, tile=TILE):
    n = ray.o.shape[0]
    npad = max(tile, (n + tile - 1) // tile * tile)
    pad = npad - n
    # Pad origins far OUTSIDE any scene bounds (with d = (1,1,1) every box
    # test then fails on far > 0). Origin (0,0,0) would sit inside scenes
    # containing the origin, where near < 0 < t_best passes the box test
    # even for dead (maxt = 0) lanes and all-pad tiles would descend and
    # DMA slabs for nothing (round-4 advisor finding).
    o = jnp.pad(ray.o, ((0, pad), (0, 0)), constant_values=1e30)
    d = jnp.pad(ray.d, ((0, pad), (0, 0)), constant_values=1.0)
    maxt = jnp.pad(
        jnp.broadcast_to(ray.maxt, (n,)), (0, pad), constant_values=0.0
    )
    # inf maxt upsets the t-init; clamp to _BIG (same pruning semantics)
    maxt = jnp.minimum(maxt, _BIG)
    # Same origin-inside-box escape hatch for DEAD lanes (maxt <= 0, e.g.
    # compaction ride-alongs, which sort into contiguous tail tiles): park
    # them outside the scene so all-dead tiles never descend.
    o = jnp.where((maxt > 0.0)[:, None], o, 1e30)
    return o, d, maxt, n, npad


def _ray_vma(o):
    """Varying-mesh-axes of the ray operands (shard_map tracing): Pallas
    out_shapes must declare the same vma or check_vma rejects the call."""
    try:
        return jax.typeof(o).vma
    except AttributeError:
        return frozenset()


def _sds(shape, dtype, vma):
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _closest_impl(cs: ClusterSet, rays, interpret, tile_rows=TILE_ROWS,
                  ablate=0):
    o, d, maxt = rays
    npad = o.shape[0]
    shape2 = (npad // LANE, LANE)
    grid = (npad // (tile_rows * LANE),)
    lane_spec = pl.BlockSpec(
        (tile_rows, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (OUT_ROWS, tile_rows, LANE), lambda t: (0, t, 0),
        memory_space=pltpu.VMEM,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    cl_in_smem = cs.cl_box.shape[0] <= SMEM_BOXES_MAX
    kernel = functools.partial(
        _closest_kernel, cs.n_super, tile_rows, cl_in_smem, ablate
    )
    s_pad = max(LANE, (cs.n_super + LANE - 1) // LANE * LANE)
    out = pl.pallas_call(
        kernel,
        out_shape=_sds(
            (OUT_ROWS, npad // LANE, LANE), jnp.float32, _ray_vma(o)
        ),
        grid=grid,
        in_specs=[lane_spec] * 7 + [smem(), _box_spec(cs.cl_box.shape[0]),
                                    smem(),
                                    pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, NFIELDS, LANE), jnp.float32),
            pltpu.SMEM((5,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, s_pad), jnp.float32),
            pltpu.SMEM((GROUP,), jnp.int32),
        ],
        # VMEM-resident box tables (cl_in_smem=False) push the scoped
        # vmem footprint past the 16 MB default on big scenes; v5e has
        # 128 MB of VMEM, so raise the Mosaic limit for this kernel.
        compiler_params=(
            None if cl_in_smem
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        ),
        interpret=interpret,
    )(
        o[:, 0].reshape(shape2), o[:, 1].reshape(shape2),
        o[:, 2].reshape(shape2),
        d[:, 0].reshape(shape2), d[:, 1].reshape(shape2),
        d[:, 2].reshape(shape2),
        maxt.reshape(shape2),
        cs.sc_box.reshape(-1),
        cs.cl_box.reshape(-1) if cl_in_smem else cs.cl_box,
        cs.cl_meta, cs.slabs,
    )
    return out.reshape(OUT_ROWS, npad)


def intersect(cs: ClusterSet, ray: Ray, interpret=False,
              tile_rows=TILE_ROWS, ablate=0):
    """Closest-hit query. Returns (t, prim, u, v, g) where g is a per-lane
    Geometry row pytree (winner fields resolved in-kernel — no post-pass
    gather). t = +inf and prim = -1 on miss. `ablate` skips kernel stages
    for profiling only (see _closest_kernel bits; results are garbage)."""
    interpret = _auto_interpret(interpret)
    o, d, maxt, n, npad = _pad_rays(ray, tile_rows * LANE)
    out = _closest_impl(cs, (o, d, maxt), interpret, tile_rows, ablate)
    t = out[0, :n]
    u = out[1, :n]
    v = out[2, :n]
    fld = out[3:, :n]
    prim = fld[_F_PRIM].astype(jnp.int32)
    miss = prim < 0
    t = jnp.where(miss, jnp.inf, t)
    g = geo.Geometry(
        prim_type=fld[_F_TYPE].astype(jnp.int32),
        p0=jnp.stack([fld[_F_P0 + k] for k in range(3)], axis=-1),
        e1=jnp.stack([fld[_F_E1 + k] for k in range(3)], axis=-1),
        e2=jnp.stack([fld[_F_E2 + k] for k in range(3)], axis=-1),
        vn0=jnp.stack([fld[_F_VN0 + k] for k in range(3)], axis=-1),
        vn1=jnp.stack([fld[_F_VN1 + k] for k in range(3)], axis=-1),
        vn2=jnp.stack([fld[_F_VN2 + k] for k in range(3)], axis=-1),
        uv0=jnp.stack([fld[_F_UV0 + k] for k in range(2)], axis=-1),
        uv1=jnp.stack([fld[_F_UV1 + k] for k in range(2)], axis=-1),
        uv2=jnp.stack([fld[_F_UV2 + k] for k in range(2)], axis=-1),
        mat_id=jnp.maximum(fld[_F_MAT], 0.0).astype(jnp.int32),
        emitter_id=fld[_F_EMIT].astype(jnp.int32),
        shape_id=jnp.maximum(fld[_F_SHAPE], 0.0).astype(jnp.int32),
    )
    return t, prim, u, v, g


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _shadow_impl(cs: ClusterSet, rays, interpret, tile_rows=TILE_ROWS,
                 ablate=0):
    o, d, maxt = rays
    npad = o.shape[0]
    shape2 = (npad // LANE, LANE)
    grid = (npad // (tile_rows * LANE),)
    lane_spec = pl.BlockSpec(
        (tile_rows, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    cl_in_smem = cs.cl_box.shape[0] <= SMEM_BOXES_MAX
    kernel = functools.partial(
        _shadow_kernel, cs.n_super, tile_rows, cl_in_smem, ablate
    )
    s_pad = max(LANE, (cs.n_super + LANE - 1) // LANE * LANE)
    out = pl.pallas_call(
        kernel,
        out_shape=_sds(shape2, jnp.float32, _ray_vma(o)),
        grid=grid,
        in_specs=[lane_spec] * 7 + [smem(), _box_spec(cs.cl_box.shape[0]),
                                    smem(),
                                    pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=lane_spec,
        scratch_shapes=[
            pltpu.VMEM((2, NFIELDS, LANE), jnp.float32),
            pltpu.SMEM((5,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, s_pad), jnp.float32),
            pltpu.SMEM((GROUP,), jnp.int32),
        ],
        # VMEM-resident box tables (cl_in_smem=False) push the scoped
        # vmem footprint past the 16 MB default on big scenes; v5e has
        # 128 MB of VMEM, so raise the Mosaic limit for this kernel.
        compiler_params=(
            None if cl_in_smem
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        ),
        interpret=interpret,
    )(
        o[:, 0].reshape(shape2), o[:, 1].reshape(shape2),
        o[:, 2].reshape(shape2),
        d[:, 0].reshape(shape2), d[:, 1].reshape(shape2),
        d[:, 2].reshape(shape2),
        maxt.reshape(shape2),
        cs.sc_box.reshape(-1),
        cs.cl_box.reshape(-1) if cl_in_smem else cs.cl_box,
        cs.cl_meta, cs.slabs,
    )
    return out.reshape(npad)


def occluded(cs: ClusterSet, ray: Ray, interpret=False,
             tile_rows=TILE_ROWS, ablate=0):
    """Any-hit query (Scene::ray_test)."""
    interpret = _auto_interpret(interpret)
    o, d, maxt, n, npad = _pad_rays(ray, tile_rows * LANE)
    hit = _shadow_impl(cs, (o, d, maxt), interpret, tile_rows, ablate)
    return hit[:n] > 0.5

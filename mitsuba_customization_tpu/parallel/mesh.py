"""Device-mesh sharded rendering and gradient all-reduce.

TPU-native counterpart of the reference's distributed execution layer
(SURVEY.md §2.6 K3 Scheduler/RemoteWorker/mtssrv, §2.8): the Mitsuba 0.6
scheduler serializes 32x32 tiles over TCP to remote workers; here the image
rows shard across a `jax.sharding.Mesh` via `shard_map` (SURVEY.md §2.7
P1/P3 mapping, BASELINE.json north_star: "Rays/pixels shard across a
multi-host TPU pod slice"), the scene/BRDF tensors replicate per device
(P7), and parameter gradients `psum` over the mesh — XLA's latency-hiding
scheduler overlaps the all-reduce with the backward sweep (P6).

Topology: a single logical axis 'shards' laid over (dcn, ici) device
order — jax.make_mesh puts hosts on the outer axis, so contiguous row
slabs land host-local and the only cross-host traffic is the gradient
all-reduce and (optionally) the final image gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mitsuba_customization_tpu.render import film as film_mod
from mitsuba_customization_tpu.render import params as params_mod
from mitsuba_customization_tpu.render.integrator import render_lanes

AXIS = "shards"


def make_mesh(devices=None):
    """1-D mesh over all (local or distributed) devices.

    For a multi-host slice, jax.devices() is globally ordered host-major,
    so contiguous shards are host-local (DCN only sees the reductions).
    """
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def _check_divisible(height, n_dev):
    if height % n_dev != 0:
        raise ValueError(
            f"image height {height} must divide by the mesh size {n_dev}"
        )


def render_sharded(scene, mesh=None, spp=None, seed=0):
    """Render with image rows sharded over the mesh.

    Returns a fully-replicated (H, W, 3) image (gathered once at the end —
    the analogue of result tiles streaming back to the 0.6 master).

    Non-box reconstruction filters splat with a footprint that crosses
    row-shard boundaries (ImageBlock border handling in the reference,
    mitsuba3 src/render/imageblock.cpp): each shard splats its lanes into
    a full-size accumulator and the weighted sums psum over the mesh —
    bit-for-bit the same estimator as the single-device splat.
    """
    mesh = mesh or make_mesh()
    cfg = scene.config
    spp = spp or cfg.spp
    n_dev = mesh.devices.size
    _check_divisible(cfg.height, n_dev)
    rows_local = cfg.height // n_dev
    lanes_local = rows_local * cfg.width * spp

    if cfg.rfilter == "box":

        @partial(jax.shard_map, mesh=mesh, in_specs=(P(),), out_specs=P(AXIS))
        def body(scene_rep):
            idx = jax.lax.axis_index(AXIS)
            offset = idx.astype(jnp.uint32) * jnp.uint32(lanes_local)
            L, _, _ = render_lanes(
                scene_rep, spp, jnp.uint32(seed),
                lane_offset=offset, n_lanes=lanes_local,
            )
            return film_mod.develop_box(L, rows_local, cfg.width, spp)

        return body(scene)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(),), out_specs=P())
    def body_splat(scene_rep):
        idx = jax.lax.axis_index(AXIS)
        offset = idx.astype(jnp.uint32) * jnp.uint32(lanes_local)
        L, film_xy, _ = render_lanes(
            scene_rep, spp, jnp.uint32(seed),
            lane_offset=offset, n_lanes=lanes_local,
        )
        img, wsum = film_mod.splat(
            L, film_xy, cfg.height, cfg.width,
            film_mod.FILTER_NAMES[cfg.rfilter],
        )
        img = jax.lax.psum(img, AXIS)
        wsum = jax.lax.psum(wsum, AXIS)
        return img / jnp.maximum(wsum, 1e-12)[..., None]

    return body_splat(scene)


def render_sharded_jit(scene, mesh=None, spp=None, seed=0):
    mesh = mesh or make_mesh()
    spp = int(spp or scene.config.spp)
    return _render_sharded_jit(scene, mesh, spp, jnp.uint32(seed))


@partial(jax.jit, static_argnums=(1, 2))
def _render_sharded_jit(scene, mesh, spp, seed):
    return render_sharded(scene, mesh, spp, seed)


def loss_and_grad_sharded(scene, params, target, mesh=None, spp=None, seed=0):
    """Distributed MSE loss + parameter gradients.

    Each shard renders its rows in ad_mode (path replay), differentiates
    its local loss, and the per-parameter gradients (including the full
    BRDF-table gradient tensor) all-reduce with `psum` over the mesh —
    inserted inside the backward computation so XLA overlaps it with the
    remaining backward sweep (BASELINE north_star P6).
    """
    mesh = mesh or make_mesh()
    cfg = scene.config
    if cfg.rfilter != "box":
        raise NotImplementedError(
            "loss_and_grad_sharded develops with the box filter; set "
            "cfg.rfilter='box' (splat filters are supported in "
            "render_sharded, not yet in the sharded loss)"
        )
    spp = int(spp or cfg.spp)
    n_dev = mesh.devices.size
    _check_divisible(cfg.height, n_dev)
    rows_local = cfg.height // n_dev
    lanes_local = rows_local * cfg.width * spp
    inv_n = 1.0 / (cfg.height * cfg.width * 3)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS)),
        out_specs=(P(), P()),
    )
    def body(scene_rep, params_rep, target_shard):
        idx = jax.lax.axis_index(AXIS)
        offset = idx.astype(jnp.uint32) * jnp.uint32(lanes_local)

        def local_loss(p):
            scene_p = params_mod.update(scene_rep, p)
            L, _, _ = render_lanes(
                scene_p, spp, jnp.uint32(seed),
                lane_offset=offset, n_lanes=lanes_local, ad_mode=True,
            )
            img = film_mod.develop_box(L, rows_local, cfg.width, spp)
            return jnp.sum((img - target_shard) ** 2) * inv_n

        loss, grads = jax.value_and_grad(local_loss)(params_rep)
        loss = jax.lax.psum(loss, AXIS)
        # NOTE: no explicit psum on grads. params_rep enters shard_map
        # replicated (in_specs=P()), so the AD transpose of its broadcast
        # into the varying render IS a psum — value_and_grad already
        # returns the globally-reduced gradient (this is where XLA
        # overlaps the all-reduce with the backward sweep). An explicit
        # psum on top double-counts by the mesh size.
        return loss, grads

    return body(scene, params, target)


@partial(jax.jit, static_argnums=(3, 4))
def loss_and_grad_sharded_jit(scene, params, target, mesh, spp, seed):
    return loss_and_grad_sharded(scene, params, target, mesh, spp, seed)


def initialize_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host bring-up (jax.distributed) — replaces mtssrv's TCP
    handshake (SURVEY.md §2.8). No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

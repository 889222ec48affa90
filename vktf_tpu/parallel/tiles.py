"""Multi-chip sharded rendering: sort-first tiles x sort-last geometry.

The reference is strictly single-GPU — its "communication fabric" is queue
submission + semaphores on one device (SURVEY.md §5.8). The TPU-native
scaling story instead distributes one frame across a 2D device mesh with XLA
collectives over ICI:

  * axis ``sp`` (sample/spatial parallel — the honest "sequence parallel"
    slot of this workload, SURVEY.md §5.7): framebuffer tiles are sharded
    across devices; each device rasterizes + shades only its tiles
    (classic sort-first parallel rendering).
  * axis ``gp`` (geometry parallel — the "data parallel" slot): the triangle
    list is block-sharded; each device bins + rasterizes only its triangle
    shard for every tile it owns, and depth compositing runs as TWO
    ``lax.pmin`` collectives over ``gp`` (classic sort-last compositing):
    first on depth, then on triangle id among depth-winners — which
    reproduces the single-chip lexicographic (depth, draw-order) rule
    exactly, because block sharding keeps global triangle ids monotonic in
    (gp_rank, local_id).
  * shading splits each tile's samples over ``gp`` (all devices shade a
    disjoint sample slice of the composited visibility buffer), reassembled
    with one ``all_gather`` — so adding gp-devices speeds up both raster and
    shade, not just raster.

Everything is expressed with shard_map over a Mesh; XLA inserts the ICI
collectives (scaling-book recipe: mesh + shardings + collectives).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vktf_tpu.config import RenderConfig
from vktf_tpu.ops.binning import bin_triangles
from vktf_tpu.ops.raster_tiled import make_tile_raster
from vktf_tpu.ops.raster_xla import BACKGROUND, SAMPLE_OFFSETS
from vktf_tpu.ops.pipeline import _shade_flat, linear_to_srgb_u8, prepare_frame
from vktf_tpu.scene.flatten import RenderScene, SceneMeta


def make_render_mesh(devices=None, gp: int = 1, sp: int | None = None) -> Mesh:
    """Build a (gp, sp) render mesh from the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if sp is None:
        sp = n // gp
    if gp * sp != n:
        raise ValueError(f"mesh gp*sp = {gp}*{sp} != {n} devices")
    return Mesh(np.asarray(devices).reshape(gp, sp), ("gp", "sp"))


def _pad_axis0(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    pad_block = jnp.zeros((pad,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad_block], axis=0)


def render_frame_sharded(
    scene: RenderScene,
    view_projection,
    camera_position,
    *,
    meta: SceneMeta,
    config: RenderConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """One frame over the (gp, sp) mesh; returns planar (4, H, W) uint8."""
    gp = mesh.shape["gp"]
    sp = mesh.shape["sp"]
    th, tw = config.tile_shape
    S = len(SAMPLE_OFFSETS[config.msaa_samples])
    n_samples = S * th * tw
    if n_samples % gp != 0:
        raise ValueError(f"samples per tile {n_samples} not divisible by gp={gp}")

    # Stages 1-4 replicated (cheap relative to raster/shade).
    setup, _, lights, world, _inst_matrix = prepare_frame(
        scene, view_projection, camera_position,
        meta=meta, config=config.replace(backend="dense"),  # skip global binning
    )

    # Pad triangles to gp multiple (padded rows have valid=False).
    setup = dict(setup)
    for key in ("edge", "zw", "inv_det", "valid", "bbox"):
        setup[key] = _pad_axis0(setup[key], gp)
    t_local = setup["valid"].shape[0] // gp

    # Pad tiles to sp multiple (sentinel tiles render garbage, dropped below).
    num_tiles = config.num_tiles
    tiles_padded = num_tiles + ((-num_tiles) % sp)
    tile_ids = jnp.arange(tiles_padded, dtype=jnp.int32)

    background = jnp.asarray(config.clear_color, jnp.float32)
    offsets = np.asarray(SAMPLE_OFFSETS[config.msaa_samples], np.float32)
    ly = jax.lax.broadcasted_iota(jnp.float32, (S, th, tw), 1)
    lx = jax.lax.broadcasted_iota(jnp.float32, (S, th, tw), 2)
    lsx = (lx + offsets[:, 0][:, None, None]).reshape(n_samples)
    lsy = (ly + offsets[:, 1][:, None, None]).reshape(n_samples)

    setup_specs = {k: P("gp") for k in ("edge", "zw", "inv_det", "valid", "bbox")}

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(setup_specs, P("sp")),
        out_specs=P("sp"),
        check_vma=False,
    )
    def device_frame(setup_local, tile_ids_local):
        gp_rank = jax.lax.axis_index("gp")
        id_base = gp_rank.astype(jnp.int32) * t_local

        # local binning of this device's triangle shard over all tiles
        bins = bin_triangles(
            setup_local["bbox"],
            setup_local["valid"],
            tile_shape=config.tile_shape,
            tiles_y=config.tiles_y,
            tiles_x=config.tiles_x,
            capacity=config.bin_capacity,
            k_pairs=config.k_pairs,
            large_capacity=config.large_capacity,
        )
        tile_raster = make_tile_raster(
            setup_local,
            bins,
            tile_shape=config.tile_shape,
            tiles_x=config.tiles_x,
            bin_capacity=config.bin_capacity,
            msaa_samples=config.msaa_samples,
            chunk=config.raster_chunk,
        )

        slice_n = n_samples // gp
        slice_lo = gp_rank * slice_n

        def tile_render(tile_idx):
            local_id, depth = tile_raster(tile_idx)  # (S,th,tw) local ids
            local_id = local_id.reshape(n_samples)
            depth = depth.reshape(n_samples)
            covered = local_id != BACKGROUND
            global_id = jnp.where(covered, local_id + id_base, BACKGROUND)

            # sort-last compositing: lexicographic (depth, id) min over gp
            min_depth = jax.lax.pmin(depth, "gp")
            cand = jnp.where(depth == min_depth, global_id, jnp.int32(2**31 - 1))
            win_id = jax.lax.pmin(cand, "gp")
            win_id = jnp.where(win_id == 2**31 - 1, BACKGROUND, win_id)
            win_id = jax.lax.optimization_barrier(win_id)

            # shade a disjoint sample slice per gp rank, then all_gather
            oy = ((tile_idx // config.tiles_x) * th).astype(jnp.float32)
            ox = ((tile_idx % config.tiles_x) * tw).astype(jnp.float32)
            sl = lambda v: jax.lax.dynamic_slice(v, (slice_lo,), (slice_n,))
            rgba_slice = _shade_flat(
                sl(win_id), sl(lsx) + ox, sl(lsy) + oy,
                scene, setup, world, lights, camera_position, background,
            )  # (4, slice_n)
            rgba = jax.lax.all_gather(
                rgba_slice, "gp", axis=1, tiled=True
            )  # (4, n_samples)

            resolved = jnp.mean(rgba.reshape(4, S, th * tw), axis=1)
            out = linear_to_srgb_u8(resolved[:3])
            alpha = jnp.full((1, th * tw), 255, jnp.uint8)
            return jnp.concatenate([out, alpha], axis=0).reshape(4, th, tw)

        return jax.lax.map(
            tile_render, tile_ids_local, batch_size=config.tile_batch
        )

    tiles = device_frame(setup, tile_ids)  # (tiles_padded, 4, th, tw)
    tiles = tiles[:num_tiles]
    image = (
        tiles.reshape(config.tiles_y, config.tiles_x, 4, th, tw)
        .transpose(2, 0, 3, 1, 4)
        .reshape(4, config.padded_height, config.padded_width)
    )
    return image[:, : config.height, : config.width]


def make_sharded_frame_fn(meta: SceneMeta, config: RenderConfig, mesh: Mesh):
    """Jitted multi-chip frame function (same signature as make_frame_fn)."""

    def frame(scene, view_projection, camera_position):
        return render_frame_sharded(
            scene, view_projection, camera_position,
            meta=meta, config=config, mesh=mesh,
        )

    return jax.jit(frame)

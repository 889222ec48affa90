"""Pallas TPU visibility rasterizer.

The hot half of the reference's fixed-function raster pipeline
(graphics_pipeline.cppm:205-234: triangle list, back-face cull, depth Less,
MSAA) as one hand-written TPU kernel, replacing the XLA tile-loop path
(ops.raster_tiled) whose per-chunk gathers and loop overheads measured
~1000x off speed-of-light on a v5e.

Design (measured constraints, see git history):
  * XLA gathers cost ~9ns/index — per-sample or per-bin gathers are the
    enemy. This kernel does ZERO gathers: triangles stream through every
    tile in global draw order as contiguous chunks (HBM -> SMEM DMA), with
    a per-chunk screen-bbox prefilter (scalar-prefetched) that skips
    non-overlapping chunks, and a per-triangle bbox skip inside the chunk.
    Meshes are spatially coherent, so chunk bboxes are tight and most
    chunks skip most tiles.
  * Streaming in global order makes the depth rule exactly the single-chip
    semantic: strict less-than keeps the earliest triangle on ties
    (lexicographic (depth, draw-order) — same as ops.raster_tiled).
  * Sample layout is (S*th, tw) f32 per tile — every buffer is an exact
    multiple of the (8,128) f32 tile, no padding waste.

Outputs per framebuffer tile: winning triangle id (int32, -1 background)
and depth (f32, 1.0 clear) per MSAA sample.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vktf_tpu.ops.raster_xla import BACKGROUND, SAMPLE_OFFSETS

# tri_data row layout (component-major, (ROWS, T_pad) f32):
#   0..8  edge coefficients e_i = (a, b, c), i = 0,1,2
#   9..11 depth plane (a, b, c) premultiplied by inv_det
#  12..14 w-recip plane (a, b, c)  [sign(det) > 0 inside]
#  15     valid flag (1.0 / 0.0)
TRI_ROWS = 16


def pack_tri_data(setup):
    """Pack triangle_setup outputs into the kernel stream layouts.

    Returns (tri_data (16, T_pad) f32, chunk_bbox (4, n_chunks) f32, T_pad).
    Padding triangles have valid=0 and empty bboxes.
    """
    edge, zw, inv_det, valid, bbox = (
        setup["edge"],
        setup["zw"],
        setup["inv_det"],
        setup["valid"],
        setup["bbox"],
    )
    num_tris = edge.shape[0]
    rows = [edge[:, i, c] for i in range(3) for c in range(3)]
    rows += [zw[:, 0, c] * inv_det for c in range(3)]
    rows += [zw[:, 1, c] for c in range(3)]
    rows += [valid.astype(jnp.float32)]
    tri_data = jnp.stack(rows, axis=0)  # (16, T)
    return tri_data, bbox, num_tris


def _pad_cols(x, multiple, fill=0.0):
    n = x.shape[-1]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=fill)


def _chunk_bboxes(bbox, valid, chunk: int):
    """Per-chunk conservative bbox (4, n_chunks) f32: x0,y0,x1,y1."""
    x0 = jnp.where(valid, bbox[:, 0], 2**30).astype(jnp.float32)
    y0 = jnp.where(valid, bbox[:, 1], 2**30).astype(jnp.float32)
    x1 = jnp.where(valid, bbox[:, 2], -(2**30)).astype(jnp.float32)
    y1 = jnp.where(valid, bbox[:, 3], -(2**30)).astype(jnp.float32)
    def pad_to(v, fill):
        return _pad_cols(v[None], chunk, fill)[0]
    x0 = pad_to(x0, 2**30).reshape(-1, chunk)
    y0 = pad_to(y0, 2**30).reshape(-1, chunk)
    x1 = pad_to(x1, -(2**30)).reshape(-1, chunk)
    y1 = pad_to(y1, -(2**30)).reshape(-1, chunk)
    return jnp.stack(
        [x0.min(axis=1), y0.min(axis=1), x1.max(axis=1), y1.max(axis=1)], axis=0
    )  # (4, n_chunks)


def _raster_kernel(
    # scalar prefetch
    chunk_bbox_ref,  # (4, n_chunks) f32 in SMEM
    # inputs
    tri_data_hbm,  # (16, T_pad) f32 in ANY/HBM
    tri_bbox_hbm,  # (4, T_pad) f32 in ANY/HBM
    # outputs (blocked per tile)
    out_id_ref,  # (1, S*th, tw) i32 VMEM
    out_depth_ref,  # (1, S*th, tw) f32 VMEM
    # scratch
    data_smem,  # (16, CHUNK) f32 SMEM
    bbox_smem,  # (4, CHUNK) f32 SMEM
    data_sem,
    bbox_sem,
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_chunks: int,
    sample_offsets: tuple,
):
    tile_idx = pl.program_id(0)
    s_count = len(sample_offsets)
    rows = s_count * tile_h

    tile_x0 = (tile_idx % tiles_x * tile_w).astype(jnp.float32)
    tile_y0 = (tile_idx // tiles_x * tile_h).astype(jnp.float32)
    tile_x1 = tile_x0 + float(tile_w)
    tile_y1 = tile_y0 + float(tile_h)

    # sample coordinates (rows = s*th + y); offsets are Python floats so no
    # traced constants are captured
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, tile_w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, tile_w), 1)
    y_ids = (row_ids % tile_h).astype(jnp.float32)
    off_x = jnp.zeros((rows, tile_w), jnp.float32)
    off_y = jnp.zeros((rows, tile_w), jnp.float32)
    for s, (ox, oy) in enumerate(sample_offsets):
        in_block = (row_ids // tile_h) == s
        off_x = jnp.where(in_block, float(ox), off_x)
        off_y = jnp.where(in_block, float(oy), off_y)
    sxx = tile_x0 + col_ids.astype(jnp.float32) + off_x
    syy = tile_y0 + y_ids + off_y

    out_id_ref[0] = jnp.full((rows, tile_w), int(BACKGROUND), jnp.int32)
    out_depth_ref[0] = jnp.ones((rows, tile_w), jnp.float32)

    def process_chunk(c, _):
        overlap = (
            (chunk_bbox_ref[0, c] < tile_x1)
            & (chunk_bbox_ref[2, c] > tile_x0)
            & (chunk_bbox_ref[1, c] < tile_y1)
            & (chunk_bbox_ref[3, c] > tile_y0)
        )

        @pl.when(overlap)
        def _():
            col = c * chunk
            data_dma = pltpu.make_async_copy(
                tri_data_hbm.at[:, pl.ds(col, chunk)], data_smem, data_sem
            )
            bbox_dma = pltpu.make_async_copy(
                tri_bbox_hbm.at[:, pl.ds(col, chunk)], bbox_smem, bbox_sem
            )
            data_dma.start()
            bbox_dma.start()
            bbox_dma.wait()
            data_dma.wait()

            def per_tri(k, _):
                hit = (
                    (bbox_smem[0, k] < tile_x1)
                    & (bbox_smem[2, k] > tile_x0)
                    & (bbox_smem[1, k] < tile_y1)
                    & (bbox_smem[3, k] > tile_y0)
                    & (data_smem[15, k] != 0.0)
                )

                @pl.when(hit)
                def _():
                    # Top-left fill rule folded arithmetically (Mosaic has no
                    # select on i1 vectors): edge passes iff e > 0, or e == 0
                    # on a top/left edge. tl_i is a scalar f32 (1.0 / 0.0).
                    def edge_pass(a_row, b_row, c_row):
                        a = data_smem[a_row, k]
                        b = data_smem[b_row, k]
                        cc = data_smem[c_row, k]
                        e = a * sxx + b * syy + cc
                        a_pos = jnp.where(a > 0.0, 1.0, 0.0)
                        a_zero = jnp.where(a == 0.0, 1.0, 0.0)
                        b_pos = jnp.where(b > 0.0, 1.0, 0.0)
                        tl = a_pos + a_zero * b_pos  # scalar 1.0 if top-left
                        pos = jnp.where(e > 0.0, 1.0, 0.0)
                        zero = jnp.where(e == 0.0, 1.0, 0.0)
                        return pos + zero * tl  # (rows, tw) f32 mask

                    inside_f = (
                        edge_pass(0, 1, 2) * edge_pass(3, 4, 5) * edge_pass(6, 7, 8)
                    )
                    depth = (
                        data_smem[9, k] * sxx
                        + data_smem[10, k] * syy
                        + data_smem[11, k]
                    )
                    w_recip = (
                        data_smem[12, k] * sxx
                        + data_smem[13, k] * syy
                        + data_smem[14, k]
                    )
                    prev = out_depth_ref[0]
                    ok = (
                        (inside_f > 0.5)
                        & (w_recip > 0.0)
                        & (depth >= 0.0)
                        & (depth <= 1.0)
                        & (depth < prev)
                    )
                    tri_id = c * chunk + k
                    out_depth_ref[0] = jnp.where(ok, depth, prev)
                    out_id_ref[0] = jnp.where(ok, tri_id, out_id_ref[0])

                return 0

            jax.lax.fori_loop(0, chunk, per_tri, 0, unroll=False)

        return 0

    jax.lax.fori_loop(0, n_chunks, process_chunk, 0, unroll=False)


def rasterize_pallas(
    setup,
    height: int,
    width: int,
    *,
    tile_shape: tuple[int, int] = (32, 128),
    msaa_samples: int = 1,
    chunk: int = 256,
    interpret: bool = False,
):
    """Rasterize via the Pallas streaming kernel.

    Returns (tri_id, depth) of shape (S, H, W) — same contract as
    rasterize_dense / rasterize_tiled. height/width must be tile multiples.
    """
    th, tw = tile_shape
    assert height % th == 0 and width % tw == 0
    if chunk % 128 != 0:
        raise ValueError(f"chunk must be a multiple of 128 (DMA tiling), got {chunk}")
    tiles_y, tiles_x = height // th, width // tw
    num_tiles = tiles_y * tiles_x
    offsets = tuple(SAMPLE_OFFSETS[msaa_samples])
    S = len(offsets)
    rows = S * th

    tri_data, bbox, num_tris = pack_tri_data(setup)
    tri_data = _pad_cols(tri_data, chunk)
    t_pad = tri_data.shape[1]
    n_chunks = t_pad // chunk

    valid = setup["valid"]
    bbox_rows = jnp.stack(
        [
            jnp.where(valid, bbox[:, 0], 2**30).astype(jnp.float32),
            jnp.where(valid, bbox[:, 1], 2**30).astype(jnp.float32),
            jnp.where(valid, bbox[:, 2], -(2**30)).astype(jnp.float32),
            jnp.where(valid, bbox[:, 3], -(2**30)).astype(jnp.float32),
        ],
        axis=0,
    )  # (4, T)
    tri_bbox = jnp.concatenate(
        [
            _pad_cols(bbox_rows[:2], chunk, 2**30),
            _pad_cols(bbox_rows[2:], chunk, -(2**30)),
        ],
        axis=0,
    )
    chunk_bbox = jnp.stack(
        [
            tri_bbox[0].reshape(-1, chunk).min(axis=1),
            tri_bbox[1].reshape(-1, chunk).min(axis=1),
            tri_bbox[2].reshape(-1, chunk).max(axis=1),
            tri_bbox[3].reshape(-1, chunk).max(axis=1),
        ],
        axis=0,
    )  # (4, n_chunks)

    kernel = functools.partial(
        _raster_kernel,
        tiles_x=tiles_x,
        tile_h=th,
        tile_w=tw,
        chunk=chunk,
        n_chunks=n_chunks,
        sample_offsets=offsets,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # tri_data stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # tri_bbox stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, rows, tw), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, tw), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((TRI_ROWS, chunk), jnp.float32),
            pltpu.SMEM((4, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out_id, out_depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, rows, tw), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, rows, tw), jnp.float32),
        ],
        interpret=interpret,
    )(chunk_bbox, tri_data, tri_bbox)

    def assemble(tiles):  # (num_tiles, S*th, tw) -> (S, H, W)
        return (
            tiles.reshape(tiles_y, tiles_x, S, th, tw)
            .transpose(2, 0, 3, 1, 4)
            .reshape(S, height, width)
        )

    return assemble(out_id), assemble(out_depth)

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
#  15     original triangle id (f32-exact for T < 2^24), -1 for invalid
TRI_ROWS = 16


def pack_tri_data(setup, perm=None):
    """Pack triangle_setup outputs into the kernel stream layouts.

    perm optionally reorders the stream (screen-space Morton order); row 15
    carries the ORIGINAL draw-order id so depth ties stay exact.
    """
    edge, zw, inv_det, valid = (
        setup["edge"],
        setup["zw"],
        setup["inv_det"],
        setup["valid"],
    )
    num_tris = edge.shape[0]
    tri_ids = jnp.arange(num_tris, dtype=jnp.float32)
    rows = [edge[:, i, c] for i in range(3) for c in range(3)]
    rows += [zw[:, 0, c] * inv_det for c in range(3)]
    rows += [zw[:, 1, c] for c in range(3)]
    rows += [jnp.where(valid, tri_ids, -1.0)]
    tri_data = jnp.stack(rows, axis=0)  # (16, T)
    if perm is not None:
        tri_data = tri_data[:, perm]
    return tri_data


def _part1by1(x):
    """Spread the low 16 bits of x to even bit positions."""
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton_order(setup, granularity: int = 32):
    """Screen-space Morton permutation of the triangles.

    Sorting the stream by the Morton code of each triangle's screen bbox
    center makes consecutive stream chunks screen-local, so the kernel's
    per-chunk bbox prefilter skips nearly everything per tile. Invalid
    triangles sort to the end.
    """
    bbox = setup["bbox"]
    cx = jnp.clip((bbox[:, 0] + bbox[:, 2]) // (2 * granularity), 0, 1023)
    cy = jnp.clip((bbox[:, 1] + bbox[:, 3]) // (2 * granularity), 0, 1023)
    key = _part1by1(cx) | (_part1by1(cy) << 1)
    key = jnp.where(setup["valid"], key, jnp.int32(2**31 - 1))
    return jnp.argsort(key)


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
    hit_counts_ref,  # (num_tiles,) i32 in SMEM
    # inputs
    hit_list_ref,  # (8, n_chunks_pad) i32 in SMEM — 8 tiles' hit chunks
    tri_data_hbm,  # (16, T_pad) f32 in ANY/HBM
    tri_bbox_hbm,  # (4, T_pad) f32 in ANY/HBM
    # outputs (blocked per tile)
    out_id_ref,  # (1, S*th, tw) i32 VMEM
    out_depth_ref,  # (1, S*th, tw) f32 VMEM
    # scratch (double-buffered chunk streams)
    data_smem,  # (2, 16, CHUNK) f32 SMEM
    bbox_smem,  # (2, 8, CHUNK) f32 SMEM (rows 4-7 = group bboxes)
    data_sem,  # DMA (2,)
    bbox_sem,  # DMA (2,)
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

    count = hit_counts_ref[tile_idx]
    list_row = tile_idx % 8

    def make_dmas(i, slot):
        col = hit_list_ref[list_row, i] * chunk
        data_dma = pltpu.make_async_copy(
            tri_data_hbm.at[:, pl.ds(col, chunk)], data_smem.at[slot],
            data_sem.at[slot],
        )
        bbox_dma = pltpu.make_async_copy(
            tri_bbox_hbm.at[:, pl.ds(col, chunk)], bbox_smem.at[slot],
            bbox_sem.at[slot],
        )
        return data_dma, bbox_dma

    @pl.when(count > 0)
    def _():
        for dma in make_dmas(0, 0):
            dma.start()

    def visit(i, _):
        slot = i % 2

        @pl.when(i + 1 < count)  # prefetch the next hit chunk
        def _():
            for dma in make_dmas(i + 1, (i + 1) % 2):
                dma.start()

        for dma in make_dmas(i, slot):
            dma.wait()

        def per_group(g, _):
            # rows 4..7 carry the 16-triangle group bbox (precomputed)
            k0 = g * 16
            group_hit = (
                (bbox_smem[slot, 4, k0] < tile_x1)
                & (bbox_smem[slot, 6, k0] > tile_x0)
                & (bbox_smem[slot, 5, k0] < tile_y1)
                & (bbox_smem[slot, 7, k0] > tile_y0)
            )

            @pl.when(group_hit)
            def _():
                jax.lax.fori_loop(k0, k0 + 16, per_tri, 0, unroll=False)

            return 0

        def per_tri(k, _):
            hit = (
                (bbox_smem[slot, 0, k] < tile_x1)
                & (bbox_smem[slot, 2, k] > tile_x0)
                & (bbox_smem[slot, 1, k] < tile_y1)
                & (bbox_smem[slot, 3, k] > tile_y0)
                & (data_smem[slot, 15, k] >= 0.0)
            )

            @pl.when(hit)
            def _():
                # Top-left fill rule folded arithmetically (Mosaic has no
                # select on i1 vectors): edge passes iff e > 0, or e == 0
                # on a top/left edge. tl_i is a scalar f32 (1.0 / 0.0).
                def edge_pass(a_row, b_row, c_row):
                    a = data_smem[slot, a_row, k]
                    b = data_smem[slot, b_row, k]
                    cc = data_smem[slot, c_row, k]
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
                    data_smem[slot, 9, k] * sxx
                    + data_smem[slot, 10, k] * syy
                    + data_smem[slot, 11, k]
                )
                w_recip = (
                    data_smem[slot, 12, k] * sxx
                    + data_smem[slot, 13, k] * syy
                    + data_smem[slot, 14, k]
                )
                prev = out_depth_ref[0]
                prev_id = out_id_ref[0]
                tri_id = data_smem[slot, 15, k].astype(jnp.int32)
                # lexicographic (depth, draw-order id): the stream may be
                # Morton-reordered, so strict-less alone would change who
                # wins exact-depth ties
                ok = (
                    (inside_f > 0.5)
                    & (w_recip > 0.0)
                    & (depth >= 0.0)
                    & (depth <= 1.0)
                    & ((depth < prev) | ((depth == prev) & (tri_id < prev_id)))
                )
                out_depth_ref[0] = jnp.where(ok, depth, prev)
                out_id_ref[0] = jnp.where(ok, tri_id, prev_id)

            return 0

        jax.lax.fori_loop(0, chunk // 16, per_group, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, count, visit, 0, unroll=False)


def rasterize_pallas(
    setup,
    height: int,
    width: int,
    *,
    tile_shape: tuple[int, int] = (32, 128),
    msaa_samples: int = 1,
    chunk: int = 256,
    interpret: bool = False,
    sort: str = "morton",
):
    """Rasterize via the Pallas streaming kernel.

    Returns (tri_id, depth) of shape (S, H, W) — same contract as
    rasterize_dense / rasterize_tiled. height/width must be tile multiples.
    sort="morton" streams triangles in screen-space Morton order (tight chunk
    bboxes -> effective prefilter); sort="none" keeps draw order. Results are
    identical either way (lexicographic depth ties).
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

    perm = morton_order(setup) if sort == "morton" else None
    tri_data = pack_tri_data(setup, perm)
    tri_data = _pad_cols(tri_data, chunk)
    t_pad = tri_data.shape[1]
    n_chunks = t_pad // chunk

    valid = setup["valid"]
    bbox = setup["bbox"]
    bbox_rows = jnp.stack(
        [
            jnp.where(valid, bbox[:, 0], 2**30).astype(jnp.float32),
            jnp.where(valid, bbox[:, 1], 2**30).astype(jnp.float32),
            jnp.where(valid, bbox[:, 2], -(2**30)).astype(jnp.float32),
            jnp.where(valid, bbox[:, 3], -(2**30)).astype(jnp.float32),
        ],
        axis=0,
    )  # (4, T)
    if perm is not None:
        bbox_rows = bbox_rows[:, perm]

    def _group_rows(rows16):  # (4, Tp) -> (4, Tp) per-16-group bbox, repeated
        tp = rows16.shape[1]
        g = rows16.reshape(4, tp // 16, 16)
        lo = jnp.repeat(g[:2].min(axis=2), 16, axis=1)
        hi = jnp.repeat(g[2:].max(axis=2), 16, axis=1)
        return jnp.concatenate([lo, hi], axis=0)
    tri_bbox = jnp.concatenate(
        [
            _pad_cols(bbox_rows[:2], chunk, 2**30),
            _pad_cols(bbox_rows[2:], chunk, -(2**30)),
        ],
        axis=0,
    )
    # rows 4..7: per-16-triangle group bboxes (kernel's mid-level skip)
    tri_bbox = jnp.concatenate([tri_bbox, _group_rows(tri_bbox)], axis=0)
    chunk_bbox = jnp.stack(
        [
            tri_bbox[0].reshape(-1, chunk).min(axis=1),
            tri_bbox[1].reshape(-1, chunk).min(axis=1),
            tri_bbox[2].reshape(-1, chunk).max(axis=1),
            tri_bbox[3].reshape(-1, chunk).max(axis=1),
        ],
        axis=0,
    )  # (4, n_chunks)

    # Per-tile hit-chunk lists (chunk-level binning, done in XLA — the
    # (num_tiles x n_chunks) overlap matrix is tiny next to the triangle
    # stream): each tile's kernel loop then touches ONLY its hit chunks, with
    # the next chunk's DMA prefetched while the current one rasterizes.
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_x0 = ((tile_ids % tiles_x) * tw).astype(jnp.float32)[:, None]
    t_y0 = ((tile_ids // tiles_x) * th).astype(jnp.float32)[:, None]
    overlap = (
        (chunk_bbox[0][None, :] < t_x0 + tw)
        & (chunk_bbox[2][None, :] > t_x0)
        & (chunk_bbox[1][None, :] < t_y0 + th)
        & (chunk_bbox[3][None, :] > t_y0)
    )  # (num_tiles, n_chunks)
    hit_list = jnp.argsort(~overlap, axis=1, stable=True).astype(jnp.int32)
    hit_counts = jnp.sum(overlap, axis=1).astype(jnp.int32)
    # SMEM block constraints: pad the list to (8-row, 128-col) block multiples
    hit_list = _pad_cols(hit_list, 128)
    rows_pad = (-num_tiles) % 8
    if rows_pad:
        hit_list = jnp.concatenate(
            [hit_list, jnp.zeros((rows_pad, hit_list.shape[1]), jnp.int32)]
        )

    hit_cols = hit_list.shape[1]

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
            pl.BlockSpec(  # 8-tile group of hit-chunk lists, scalar-readable
                (8, hit_cols), lambda i, *_: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # tri_data stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # tri_bbox stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, rows, tw), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, tw), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, TRI_ROWS, chunk), jnp.float32),
            pltpu.SMEM((2, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
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
    )(hit_counts, hit_list, tri_data, tri_bbox)

    def assemble(tiles):  # (num_tiles, S*th, tw) -> (S, H, W)
        return (
            tiles.reshape(tiles_y, tiles_x, S, th, tw)
            .transpose(2, 0, 3, 1, 4)
            .reshape(S, height, width)
        )

    return assemble(out_id), assemble(out_depth)

#!/usr/bin/env python
"""Split the production raster stage: XLA prologue vs the Pallas kernel.

The stage profiler times raster(setup, perm) as one jit; this separates
  pack  : pack_tri_data + bbox rows + perm gathers + group/chunk bboxes
  bin   : tile-overlap matrix + hit-list argsort
  kernel: the pallas_call alone, fed pre-materialized inputs
"""
from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tbench import timeit, roundtrip_ms

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops import raster_pallas as rp

scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position
print(f"roundtrip {roundtrip_ms():.1f} ms; tris={meta.num_triangles}",
      flush=True)

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)
perm = jax.jit(lambda s: rp.stream_perm(s, chunk=256))(setup)
perm.block_until_ready()

PH, PW = 1088, 1920
TH, TW = 64, 128
CHUNK = 256
LAYERS = meta.peel_layers
S = 4
WIN = 32
GS = 8  # = RenderConfig.raster_group_size default
M = 2  # = RenderConfig.raster_interleave default


def prologue(setup, perm):
    """Everything rasterize_pallas does before pallas_call."""
    tri_data = rp.pack_tri_data(setup, None, id_base=0)
    tri_data = rp._pad_cols(tri_data, CHUNK)
    t_pad = tri_data.shape[1]
    num_tris = setup["valid"].shape[0]
    if t_pad > num_tris:
        tri_data = tri_data.at[15, num_tris:].set(-1.0)
    valid, bbox = setup["valid"], setup["bbox"]
    bbox_rows = jnp.stack([
        jnp.where(valid, bbox[:, 0], 2**30).astype(jnp.float32),
        jnp.where(valid, bbox[:, 1], 2**30).astype(jnp.float32),
        jnp.where(valid, bbox[:, 2], -(2**30)).astype(jnp.float32),
        jnp.where(valid, bbox[:, 3], -(2**30)).astype(jnp.float32),
    ], axis=0)
    bbox_rows = jnp.concatenate([
        rp._pad_cols(bbox_rows[:2], CHUNK, 2**30),
        rp._pad_cols(bbox_rows[2:], CHUNK, -(2**30)),
    ], axis=0)
    tri_data = tri_data[:, perm]
    bbox_rows = bbox_rows[:, perm]

    def _group_rows(rows4):
        tp = rows4.shape[1]
        g = rows4.reshape(4, tp // GS, GS)
        lo = jnp.repeat(g[:2].min(axis=2), GS, axis=1)
        hi = jnp.repeat(g[2:].max(axis=2), GS, axis=1)
        return jnp.concatenate([lo, hi], axis=0)

    tri_bbox = jnp.concatenate([bbox_rows, _group_rows(bbox_rows)], axis=0)
    chunk_bbox = jnp.stack([
        tri_bbox[0].reshape(-1, CHUNK).min(axis=1),
        tri_bbox[1].reshape(-1, CHUNK).min(axis=1),
        tri_bbox[2].reshape(-1, CHUNK).max(axis=1),
        tri_bbox[3].reshape(-1, CHUNK).max(axis=1),
    ], axis=0)
    return tri_data, tri_bbox, chunk_bbox


def binstage(chunk_bbox):
    tiles_y, tiles_x = PH // TH, PW // TW
    num_tiles = tiles_y * tiles_x
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_x0 = ((tile_ids % tiles_x) * TW).astype(jnp.float32)[:, None]
    t_y0 = ((tile_ids // tiles_x) * TH).astype(jnp.float32)[:, None]
    overlap = ((chunk_bbox[0][None, :] < t_x0 + TW)
               & (chunk_bbox[2][None, :] > t_x0)
               & (chunk_bbox[1][None, :] < t_y0 + TH)
               & (chunk_bbox[3][None, :] > t_y0))
    hit_list = jnp.argsort(~overlap, axis=1, stable=True).astype(jnp.int32)
    hit_counts = jnp.sum(overlap, axis=1).astype(jnp.int32)
    hit_list = rp._pad_cols(hit_list, 128)
    rows_pad = (-num_tiles) % 8
    if rows_pad:
        hit_list = jnp.concatenate(
            [hit_list, jnp.zeros((rows_pad, hit_list.shape[1]), jnp.int32)])
    return hit_counts, hit_list


def kernel_only(hit_counts, hit_list, tri_data, tri_bbox):
    tiles_y, tiles_x = PH // TH, PW // TW
    num_tiles = tiles_y * tiles_x
    n_chunks = tri_data.shape[1] // CHUNK
    offsets = tuple(rp.SAMPLE_OFFSETS[S])
    rows = S * TH
    kernel = functools.partial(
        rp._raster_kernel, tiles_x=tiles_x, tile_h=TH, tile_w=TW,
        chunk=CHUNK, n_chunks=n_chunks, sample_offsets=offsets,
        layers=LAYERS, window_rows=WIN, group_size=GS, interleave=M,
    )
    hit_cols = hit_list.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, hit_cols), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, TW), lambda i, *_: (i, 0, 0))
            for _ in range(2 * LAYERS)
        ],
        scratch_shapes=[
            pltpu.SMEM((2, rp.TRI_ROWS, CHUNK), jnp.float32),
            pltpu.SMEM((2, 8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (num_tiles, rows, TW),
                jnp.int32 if i % 2 == 0 else jnp.float32)
            for i in range(2 * LAYERS)
        ],
    )(hit_counts, jnp.zeros((1,), jnp.int32), hit_list, tri_data, tri_bbox)
    return outs


p_jit = jax.jit(prologue)
b_jit = jax.jit(binstage)
k_jit = jax.jit(kernel_only)
full = jax.jit(lambda su, pe: rp.rasterize_pallas(
    su, PH, PW, tile_shape=(TH, TW), msaa_samples=S, chunk=CHUNK,
    sort="none", perm=pe, layers=LAYERS, window_rows=WIN, group_size=GS,
    interleave=M, assemble=False))

tri_data, tri_bbox, chunk_bbox = jax.tree.map(
    jax.block_until_ready, p_jit(setup, perm))
hit_counts, hit_list = jax.tree.map(jax.block_until_ready,
                                    b_jit(chunk_bbox))
print(f"hit chunks per tile: mean={np.mean(np.asarray(hit_counts)):.1f} "
      f"max={np.max(np.asarray(hit_counts))}", flush=True)

for rep in range(2):
    timeit(lambda s, pe: p_jit(s, pe), setup, perm,
           n=6, label=f"rep{rep} prologue(pack+perm+bbox)")
    timeit(lambda cb: b_jit(cb), chunk_bbox, n=6, label=f"rep{rep} binning")
    timeit(lambda *a: k_jit(*a), hit_counts, hit_list, tri_data, tri_bbox,
           n=6, label=f"rep{rep} kernel only")
    timeit(lambda s, pe: full(s, pe), setup, perm,
           n=6, label=f"rep{rep} full raster stage")

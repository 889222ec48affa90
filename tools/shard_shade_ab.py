#!/usr/bin/env python
"""VERDICT r2 weak #7: does the sharded path's ASSEMBLED shade
(pallas_shade_resolve, one program) lose anything vs the single-chip
production TWO-PHASE tile-layout shade (pallas_shade_addr_tiled +
pallas_shade_final_tiled) at SHARD sizes?

Context: the two-phase split exists because the 67 MB shade table and the
~91 MB fused pool are both per-pixel gather operands but only one fits in
VMEM at a time — at 2.1M pixels the split pays for itself. A (4,2) shard
shades band_h/gp = 136 rows (261k px): per-program VMEM staging is a FIXED
cost (tools/README: shade_slice stays ~5 ms at 1/8 the pixels), so two
programs pay it twice. This A/B times both forms at the exact (4,2) shard
pixel count on the real chip, same scene, same table.

Note a true unification (two-phase INSIDE shard_map) would additionally
need tile-aligned row splits: band_h % (gp*th) == 0 fails at 1080p (4,2)
(544 % 128), so it would force the padded framebuffer to 1280 rows (+17.6%
raster+shade work) or per-slice transposes. The A/B below is therefore the
decision measurement: if the assembled form is equal-or-faster at shard
shapes, the structural divergence from single-chip is JUSTIFIED, not debt.

Two-phase form here runs on a tile-aligned 128-row slice (4 tile rows,
245k px) and is reported per-pixel alongside the assembled form's 136-row
slice — conservative in the two-phase's favor (fewer pixels, zero
assemble/transpose charged).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import (
    gather_world_lights,
    pallas_shade_addr_tiled,
    pallas_shade_final_tiled,
    pallas_shade_resolve,
    prepare_frame,
)
from vktf_tpu.ops.raster_pallas import rasterize_pallas
from vktf_tpu.ops.shade_table import build_shade_table_pallas
from vktf_tpu.ops.vertex import propagate_transforms
from vktf_tpu.scene.flatten import flatten_assets

GP, SP = 4, 2

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
scene, meta, aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position
th, tw = config.tile_shape
pw = config.padded_width
tiles_y = -(-config.height // th)
tiles_y += (-tiles_y) % SP
band_h = tiles_y * th // SP
rh = band_h // GP                      # assembled shard rows (136)
rh_tiled = (rh // th) * th             # tile-aligned comparison rows (128)
fused = config.resolved_fused_pool(
    mirror_wrap=meta.mirror_wrap, mixed_samplers=meta.mixed_samplers)

setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam_pos)
node_global = propagate_transforms(scene.node_local, scene.node_parent,
                                   meta.level_slices)
lights = gather_world_lights(node_global, scene.light_node,
                             scene.light_type, scene.light_color)
table = jax.jit(
    lambda su, sc: build_shade_table_pallas(su, sc, None)
)(setup, scene)

# one band's visibility at band shapes (coverage statistics of the shard)
tri_id, depth = jax.jit(lambda su: rasterize_pallas(
    su, band_h, pw, tile_shape=config.tile_shape,
    msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
    sort="morton", window_rows=config.raster_window_rows or 32,
    group_size=config.raster_group_size,
    interleave=config.resolved_interleave(),
    columns=config.raster_columns,
))(setup)
tri_id, depth = jax.block_until_ready(tri_id), jax.block_until_ready(depth)
print(f"band {band_h}x{pw}, assembled slice rh={rh}, tiled slice {rh_tiled}",
      flush=True)

# A: assembled one-program shade (production sharded path, tiles.py:301)
def shade_assembled(ti, dp, tb):
    sl = lambda v: jax.lax.dynamic_slice(
        v, (0, 0, 0), (v.shape[0], rh, v.shape[2]))
    return pallas_shade_resolve(
        sl(ti), scene, tb, lights, cam_pos, config=config, y0=0,
        depth=sl(dp), per_slot_samplers=meta.mixed_samplers,
        fused_pool=fused)

# B: two-phase tile-layout shade (single-chip production form) on a
# tile-block slice of the band. Build tile-layout inputs: raster the band
# with assemble=False to get (num_tiles, S*th, tw) blocks, slice the first
# rh_tiled//th tile rows.
blocks_id, blocks_d = jax.jit(lambda su: rasterize_pallas(
    su, band_h, pw, tile_shape=config.tile_shape,
    msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
    sort="morton", window_rows=config.raster_window_rows or 32,
    group_size=config.raster_group_size,
    interleave=config.resolved_interleave(),
    columns=config.raster_columns, assemble=False,
))(setup)
blocks_id = jax.block_until_ready(blocks_id)
blocks_d = jax.block_until_ready(blocks_d)
tiles_x = pw // tw
n_tiles_slice = (rh_tiled // th) * tiles_x

def shade_two_phase(bi, bd, tb):
    sl = lambda v: jax.lax.dynamic_slice(
        v, (0,) * (v.ndim - 2) + (0, 0),
        v.shape[:-3] + (n_tiles_slice,) + v.shape[-2:])
    sub = config.replace(width=pw, height=rh_tiled)
    addr = pallas_shade_addr_tiled(sl(bi), sl(bd), tb, config=sub,
                                   fused_pool=fused)
    return pallas_shade_final_tiled(addr, scene.quad_pool, lights,
                                    cam_pos, config=sub, fused_pool=fused)

fn_a = jax.jit(shade_assembled).lower(tri_id, depth, table).compile()
fn_b = jax.jit(shade_two_phase).lower(blocks_id, blocks_d, table).compile()

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

N = 10
px_a = rh * pw
px_b = rh_tiled * pw
for rep in range(3):
    for name, fn, args, px in (("assembled", fn_a, (tri_id, depth, table), px_a),
                               ("two-phase", fn_b, (blocks_id, blocks_d, table), px_b)):
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            out = fn(*args)
            acc = acc + jnp.sum(out.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        print(f"rep{rep} {name:10s} {dt:7.2f} ms  ({dt / px * 1e6:.1f} ns/px)",
              flush=True)

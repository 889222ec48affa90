#!/usr/bin/env python
"""Size the x-banding idea: would splitting the framebuffer into VERTICAL
strips (sp over x) balance the sharded raster better than horizontal
bands?

Clean-window (4,2) cells show band-1 rastering ~2x band-0 (4.59 vs 2.74
max) — Sponza's content is vertically imbalanced, and the frame waits for
the slowest cell. X-strips would cut across that imbalance. This probe
measures raster cells for 2 x-strips of 1024 px (1920 pads to 2*1024 —
+6.7% raster area, the cost of tile-width-aligned equal SPMD shapes)
against the production 2 y-bands, same gp=4 triangle shards, by SHIFTING
the setup's screen-space planes/bboxes (all plane constants are anchored
at bbox corners, so translating anchors+bboxes translates the triangle
exactly — no kernel change needed).

If max-cell(x) + pad tax < max-cell(y), x-banding is worth implementing
in parallel/tiles.py; else it closes as a sized negative.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np
import jax
import jax.numpy as jnp

from stage_probe import device_time

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops.raster_pallas import rasterize_pallas
from vktf_tpu.scene.flatten import flatten_assets
from bench import CAMERAS

GP, SP = 4, 2
STRIP_W = 1024  # 2 strips x 1024 >= 1920, tile-width aligned

config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position
th, tw = config.tile_shape
pw = config.padded_width
tiles_y = -(-config.height // th)
tiles_y += (-tiles_y) % SP
ph = tiles_y * th
band_h = ph // SP
ph_full = tiles_y * th

setup, _b, _l, _w, _i = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)
)(scene, vp, cam_pos)

t = meta.num_triangles
t_pad = -(-t // (GP * SP)) * (GP * SP)
t_local = t_pad // GP
keys = ("edge", "edge_raster", "zw", "anchor", "inv_det", "valid", "bbox")
pad_rows = t_pad - t


def pad_tri(x):
    if not pad_rows:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad_rows,) + x.shape[1:], x.dtype)], axis=0)


sp_full = {k: pad_tri(setup[k]) for k in keys}
sp_full["valid"] = sp_full["valid"] & (jnp.arange(t_pad) < t)
shards = [{k: sp_full[k][r * t_local:(r + 1) * t_local] for k in keys}
          for r in range(GP)]


def xshift(su, x0):
    """Translate screen space by -x0 (anchors + bboxes; plane constants are
    anchored so they move with the anchor)."""
    out = dict(su)
    out["bbox"] = su["bbox"] - jnp.asarray([x0, 0, x0, 0], su["bbox"].dtype)
    out["anchor"] = su["anchor"] - jnp.asarray([x0, 0], su["anchor"].dtype)
    return out


def raster(su, h, w, y0):
    return rasterize_pallas(
        su, h, w, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", y_offset=y0, id_base=0, layers=meta.peel_layers,
        window_rows=config.raster_window_rows,
        group_size=config.raster_group_size,
        interleave=config.resolved_interleave(),
        columns=config.raster_columns, assemble=False)


yband_jit = jax.jit(lambda su, y0: raster(su, band_h, pw, y0))
xband_jit = jax.jit(lambda su: raster(su, ph_full, STRIP_W, 0))

# warm compiles
yband_jit(shards[0], jnp.int32(0))
xband_jit(shards[0])
print("compiled", flush=True)

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpcs = []
for _ in range(8):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

N = 12
cells = {}
for rep in range(3):
    for r in range(GP):
        for b in range(SP):
            dt = device_time(yband_jit, shards[r], jnp.int32(b * band_h),
                             n=N, rpc_s=rpc_s) * 1e3
            k = ("y", r, b)
            cells[k] = min(cells.get(k, 1e9), dt)
        for b in range(SP):
            # strips TILE the screen: [0,1024) and [1024,2048) (columns
            # past 1920 are empty padding — the tile-width-alignment tax)
            su = xshift(shards[r], b * STRIP_W)
            dt = device_time(xband_jit, su, n=N, rpc_s=rpc_s) * 1e3
            k = ("x", r, b)
            cells[k] = min(cells.get(k, 1e9), dt)
    print(f"rep{rep} done", flush=True)

for axis in ("y", "x"):
    cc = {k[1:]: v for k, v in cells.items() if k[0] == axis}
    print(f"{axis}-bands: max cell {max(cc.values()):.2f} ms; "
          f"{ {k: round(v, 2) for k, v in sorted(cc.items())} }", flush=True)

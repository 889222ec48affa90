#!/usr/bin/env python
"""Forensics for the WR=16/32/64 output divergence (tools/raster_gw_sweep).

Distinguishes:
  (a) deterministic bbox under-coverage — a triangle passes edge/depth/w
      tests at samples OUTSIDE its computed bbox, which only get evaluated
      when window slop (align-down + group-span windows) reaches them; or
  (b) a resurgent accumulator race (nondeterminism across identical runs).

Prints: determinism of WR=16 (two runs), diff counts, and for sample diffs
the winning ids' bboxes vs the sample position.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops import raster_pallas as rp

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position
ph, pw = config.padded_height, config.padded_width

setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)
print(f"tris={meta.num_triangles}", flush=True)

def run(wr, gs=8):
    f = jax.jit(lambda su: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", window_rows=wr, group_size=gs))
    tri_id, depth = f(setup)
    return np.asarray(tri_id), np.asarray(depth)

id16a, d16a = run(16)
id16b, d16b = run(16)
id32, d32 = run(32)
id64, d64 = run(64)
print(f"WR=16 deterministic: id={np.array_equal(id16a, id16b)} "
      f"d={np.array_equal(d16a, d16b)}", flush=True)

bbox = np.asarray(setup["bbox"])  # (T, 4) x0 y0 x1 y1
valid = np.asarray(setup["valid"])

for name, ida, idb in (("16vs32", id16a, id32), ("32vs64", id32, id64)):
    diff = ida != idb
    n = int(diff.sum())
    print(f"{name}: {n} sample diffs", flush=True)
    if n == 0:
        continue
    ss, yy, xx = np.nonzero(diff)
    for k in range(min(n, 8)):
        s, y, x = int(ss[k]), int(yy[k]), int(xx[k])
        wa, wb = int(ida[s, y, x]), int(idb[s, y, x])
        msg = f"  s={s} y={y} x={x}: {wa} vs {wb}"
        for w in (wa, wb):
            if w >= 0:
                b = bbox[w]
                inx = b[0] <= x < b[2]
                iny = b[1] <= y < b[3]
                msg += f" | tri {w} bbox={b.tolist()} in_x={inx} in_y={iny}"
        print(msg, flush=True)

# count how many winners sit outside their own bbox in each image
def outside_own_bbox(ids):
    w = ids.reshape(-1)
    cov = w >= 0
    wi = np.where(cov, w, 0)
    b = bbox[wi]
    S, H, W = ids.shape
    ys = np.broadcast_to(np.arange(H)[None, :, None], ids.shape).reshape(-1)
    xs = np.broadcast_to(np.arange(W)[None, None, :], ids.shape).reshape(-1)
    out = cov & ((xs < b[:, 0]) | (xs >= b[:, 2]) | (ys < b[:, 1]) | (ys >= b[:, 3]))
    return int(out.sum())

print(f"winners outside own bbox: WR16={outside_own_bbox(id16a)} "
      f"WR32={outside_own_bbox(id32)} WR64={outside_own_bbox(id64)}", flush=True)

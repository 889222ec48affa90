#!/usr/bin/env python
"""Simulate the repacked-window raster scheme vs the current one.

Current kernel: a window visit covers (WIN=32 sample rows x 128 lanes) =
8 px rows x 128 px cols at 4xMSAA = FOUR (8,128) f32 vregs; every triangle
of the group pays 4 vregs of edge/depth math per window it is visited in.

Proposed repack: tile buffer lanes = (sample_row%8)*16 + (x%16), rows =
(x//16)*(S*th/8) + sample_row//8, so ONE (8,128) vreg covers 64 sample
rows x 16 px cols = 16x16 px. A window visit is one vreg; windows tile in
2D (y stride 16 px, x stride 16 px).

This script counts, from the same frame inputs (sponza 1080p 4xMSAA):
  * group-visit counts (the per-visit scalar skeleton cost driver), and
  * per-triangle vreg evaluations (the vector cost driver)
for both schemes, using the same Morton stream / chunking / group bboxes.
Pure numpy, no kernel changes.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from vktf_tpu.config import RenderConfig  # noqa: E402
from vktf_tpu.mathx import Camera, ViewFrustumParams  # noqa: E402
from vktf_tpu.models.scenes import build_preset  # noqa: E402
from vktf_tpu.scene.flatten import flatten_assets  # noqa: E402
from vktf_tpu.ops.pipeline import prepare_frame  # noqa: E402
from vktf_tpu.ops import raster_pallas as rp  # noqa: E402

scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
perm = np.asarray(jax.jit(lambda s: rp.stream_perm(s, chunk=256))(setup))

PH, PW, TH, TW, CHUNK, S, WIN = 1088, 1920, 64, 128, 256, 4, 32
GS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LOG2S = 2
PX, PY = 16, 16  # patch footprint in pixels (x cols, y rows)
valid = np.asarray(setup["valid"])
bbox = np.asarray(setup["bbox"]).astype(np.float64)
T = valid.shape[0]
t_pad = -(-T // CHUNK) * CHUNK
bb = np.zeros((4, t_pad))
bb[0, :] = 2**30
bb[1, :] = 2**30
bb[2, :] = -(2**30)
bb[3, :] = -(2**30)
bb[0, :T] = np.where(valid, bbox[:, 0], 2**30)
bb[1, :T] = np.where(valid, bbox[:, 1], 2**30)
bb[2, :T] = np.where(valid, bbox[:, 2], -(2**30))
bb[3, :T] = np.where(valid, bbox[:, 3], -(2**30))
bb = bb[:, perm]
vld = np.zeros(t_pad, bool)
vld[:T] = valid
vld = vld[perm]

ng = t_pad // GS
g = bb.reshape(4, ng, GS)
gb = np.stack([g[0].min(1), g[1].min(1), g[2].max(1), g[3].max(1)])
nc = t_pad // CHUNK
c = bb.reshape(4, nc, CHUNK)
cb = np.stack([c[0].min(1), c[1].min(1), c[2].max(1), c[3].max(1)])

tiles_y, tiles_x = PH // TH, PW // TW
num_tiles = tiles_y * tiles_x
ty0 = (np.arange(num_tiles) // tiles_x * TH)[:, None].astype(np.float64)
tx0 = (np.arange(num_tiles) % tiles_x * TW)[:, None].astype(np.float64)
c_hit = ((cb[0][None] < tx0 + TW) & (cb[2][None] > tx0)
         & (cb[1][None] < ty0 + TH) & (cb[3][None] > ty0))
g_tile = ((gb[0][None] < tx0 + TW) & (gb[2][None] > tx0)
          & (gb[1][None] < ty0 + TH) & (gb[3][None] > ty0))
g_chunk = np.repeat(c_hit, CHUNK // GS, axis=1)
g_hit = g_tile & g_chunk
ti, gi = np.nonzero(g_hit)
print(f"group hits: {g_hit.sum()}")

# ---- current scheme: 1-D y windows of 32 sample rows x full 128-px tile ----
gy0 = np.maximum(gb[1, gi], ty0[ti, 0]).astype(np.int64) - ty0[ti, 0].astype(np.int64)
gy1 = np.minimum(np.minimum(gb[3, gi], ty0[ti, 0] + TH).astype(np.int64)
                 - ty0[ti, 0].astype(np.int64), TH - 1)
r0 = (gy0 << LOG2S) & ~(WIN - 1)
r_end = (gy1 + 1) << LOG2S
nw_cur = np.maximum((r_end - r0 + WIN - 1) // WIN, 1)
vregs_per_win = WIN // 8
print(f"[current] group-window visits={nw_cur.sum()}  "
      f"tri-vreg evals={GS * nw_cur.sum() * vregs_per_win}")

# ---- patch scheme: 2-D windows of PY x PX pixels, one vreg each ------------
gx0 = np.maximum(gb[0, gi], tx0[ti, 0]).astype(np.int64) - tx0[ti, 0].astype(np.int64)
gx1 = np.minimum(np.minimum(gb[2, gi], tx0[ti, 0] + TW).astype(np.int64)
                 - tx0[ti, 0].astype(np.int64), TW - 1)
py0 = gy0 // PY
py1 = gy1 // PY
px0 = np.clip(gx0, 0, TW - 1) // PX
px1 = np.clip(gx1, 0, TW - 1) // PX
nwy = py1 - py0 + 1
nwx = px1 - px0 + 1
nw_new = nwy * nwx
print(f"[patch {PY}x{PX}] group-patch visits={nw_new.sum()}  "
      f"tri-vreg evals={GS * nw_new.sum()}")
print(f"visit ratio new/cur = {nw_new.sum() / nw_cur.sum():.2f}  "
      f"vreg ratio new/cur = {nw_new.sum() / (nw_cur.sum() * vregs_per_win):.2f}")

# bbox size distribution of valid triangles
w = np.maximum(bb[2] - bb[0], 0)[vld]
h = np.maximum(bb[3] - bb[1], 0)[vld]
print(f"bbox width px: mean={w.mean():.1f} median={np.median(w):.1f} "
      f"p90={np.percentile(w, 90):.1f}")
print(f"bbox height px: mean={h.mean():.1f} median={np.median(h):.1f} "
      f"p90={np.percentile(h, 90):.1f}")
# group bbox sizes (the unit that actually visits windows)
gw = np.maximum(gb[2] - gb[0], 0)[np.unique(gi)]
gh = np.maximum(gb[3] - gb[1], 0)[np.unique(gi)]
print(f"group bbox: width mean={gw.mean():.1f} median={np.median(gw):.1f}; "
      f"height mean={gh.mean():.1f} median={np.median(gh):.1f}")

# ---- full (m, window-vregs) grid: lane = (sample_row % m)*(128/m) + x % (128/m)
# one vreg covers 8*m sample rows x 128/m px cols; a window is WV vregs
# stacked in y (footprint 2*m*WV px rows x 128/m px cols at 4xMSAA).
print("\n(m, wv): footprint px -> visits, vreg-evals, est ms "
      "(A=visit scalar, A1=per-vreg acc r/w, B=per-tri-vreg math)")
ti_ty0 = ty0[ti, 0]
ti_tx0 = tx0[ti, 0]
gy0c = np.maximum(gb[1, gi], ti_ty0) - ti_ty0
gy1c = np.minimum(np.minimum(gb[3, gi], ti_ty0 + TH), ti_ty0 + TH) - ti_ty0
gy1c = np.minimum(gy1c, TH - 1)
gx0c = np.clip(np.maximum(gb[0, gi], ti_tx0) - ti_tx0, 0, TW - 1)
gx1c = np.clip(np.minimum(gb[2, gi], ti_tx0 + TW) - ti_tx0, 0, TW - 1)
# calibrate: current scheme (m=1, wv=4) measured ~8.9 ms skeleton + ~19 ms vec
V_CUR, E_CUR = 58275.0, 1864800.0
B = 19e6 / E_CUR  # ns per tri-vreg eval
# skeleton split guess: accumulator r/w ~ 2 arrays * wv vregs * 2 (r+w) ops,
# scalar constant ~ the rest; calibrated so m=1,wv=4 reproduces 8.9 ms with
# A1 = 8 ns per vreg r/w pair (2 arrays), A0 the remainder.
A1 = 8.0  # ns per (vreg, array-pair) r/w in a visit
A0 = (8.9e6 - V_CUR * A1 * 4) / V_CUR  # ns per visit scalar skeleton
for m in (1, 2, 4, 8, 16):
    cols = 128 // m
    for wv in (1, 2, 4):
        rows_px = 2 * m * wv  # pixel rows per window (S=4)
        if rows_px > TH:
            continue
        nwy = (gy1c // rows_px) - (gy0c // rows_px) + 1
        nwx = (gx1c // cols) - (gx0c // cols) + 1
        V = float((nwy * nwx).sum())
        E = float(GS * V * wv)
        est = (V * (A0 + A1 * wv) + E * B) / 1e6
        print(f"  m={m:2d} wv={wv}  {rows_px:3d}x{cols:3d}px  "
              f"V={V:9.0f}  E={E:9.0f}  est={est:6.1f} ms")

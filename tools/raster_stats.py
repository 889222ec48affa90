#!/usr/bin/env python
"""Static work statistics of the raster kernel at sponza 1080p 4xMSAA.

Counts, from the same inputs the kernel sees, exactly how many chunk
visits / group tests / group hits / (triangle,window) evaluations happen,
and how much of that work is wasted (triangle misses the window in y/x).
Pure numpy on the CPU — no kernel changes, no tunnel noise.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

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
GS = int(sys.argv[1]) if len(sys.argv) > 1 else 8  # RenderConfig.raster_group_size default
LOG2S = 2
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
         & (cb[1][None] < ty0 + TH) & (cb[3][None] > ty0))  # (nt, nc)
print(f"tiles={num_tiles} chunks={nc} chunk_visits={c_hit.sum()} "
      f"(mean {c_hit.sum()/num_tiles:.1f}/tile)")

# group tests: for every chunk visit, CHUNK//GS group tests
group_tests = c_hit.sum() * (CHUNK // 16)
# group hits: group bbox vs tile
g_tile = ((gb[0][None] < tx0 + TW) & (gb[2][None] > tx0)
          & (gb[1][None] < ty0 + TH) & (gb[3][None] > ty0))  # (nt, ng)
# but only counted within visited chunks
g_chunk = np.repeat(c_hit, CHUNK // GS, axis=1)  # (nt, ng)
g_hit = g_tile & g_chunk
print(f"group tests={group_tests} hits={g_hit.sum()} "
      f"({100*g_hit.sum()/group_tests:.1f}%)")

# per group hit: window count from group's y span
ti, gi = np.nonzero(g_hit)
gy0 = np.maximum(gb[1, gi], ty0[ti, 0]).astype(np.int64) - ty0[ti, 0].astype(np.int64)
gy1 = np.minimum(np.minimum(gb[3, gi], ty0[ti, 0] + TH).astype(np.int64)
                 - ty0[ti, 0].astype(np.int64), TH - 1)
r0 = (gy0 << LOG2S) & ~(WIN - 1)
r_end = (gy1 + 1) << LOG2S
nw = np.maximum((r_end - r0 + WIN - 1) // WIN, 1)
print(f"group-window visits={nw.sum()} (mean {nw.mean():.2f} win/group-hit)")
print(f"tri-window evals={GS*nw.sum()}  (x {WIN}x{TW} lanes each)")

# how many of those (tri, window) pairs actually overlap the window+tile?
total_tw = 0
useful_tw = 0
covered_samples = 0
for k in range(GS):
    idx = gi * GS + k
    v = vld[idx]
    x_hit = (bb[0, idx] < tx0[ti, 0] + TW) & (bb[2, idx] > tx0[ti, 0]) & v
    # y overlap per window: approximate by counting windows the TRIANGLE
    # spans within [r0, r_end)
    y0t = np.maximum(bb[1, idx], ty0[ti, 0]) - ty0[ti, 0]
    y1t = np.minimum(bb[3, idx], ty0[ti, 0] + TH) - ty0[ti, 0]
    y_any = y1t > y0t
    w0 = np.clip(((y0t.astype(np.int64) << LOG2S) - r0) // WIN, 0, None)
    w1 = np.clip((((np.ceil(y1t).astype(np.int64)) << LOG2S) - r0 + WIN - 1)
                 // WIN, None, nw)
    n_use = np.where(x_hit & y_any, np.maximum(w1 - w0, 0), 0)
    total_tw += nw.sum()
    useful_tw += n_use.sum()
print(f"useful tri-window fraction: {100*useful_tw/total_tw:.1f}% "
      f"({useful_tw} of {total_tw})")

# lane utilization: avg triangle bbox area vs window area
a = np.where(vld,
             np.maximum(bb[2] - bb[0], 0) * np.maximum(bb[3] - bb[1], 0), 0)
print(f"valid tris={vld.sum()}; mean bbox area={a[vld].mean():.1f}px "
      f"median={np.median(a[vld]):.1f}px  win lanes={WIN*TW} "
      f"(={WIN>>LOG2S}x{TW}px)")

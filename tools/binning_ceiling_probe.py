#!/usr/bin/env python
"""Static ceiling of 'smarter binning' (VERDICT r2 #3b): how much raster
time could a per-column EXACT coverage prefilter (vs the production
chunk-bbox + group-bbox skip) possibly remove?

Method: replay the production binning exactly on the host — morton-g16
stream order, chunk=256, group=8, column-supertile bins (bands=tiles_y at
1080p) — and count (a) chunk visits under chunk-bbox overlap vs exact
any-member-triangle overlap, (b) group iterations, group-bbox hits, and
false-positive hits (group bbox overlaps but no member triangle does).

Result (sponza @1080p 4xMSAA, bench camera, 2026-08-20):
  tile 32x128, bins = full columns (bands=34): 1027 chunks, 858 chunk
  visits (exact: 828, -3.5%); 27,456 group iterations, 14,237 bbox hits
  (51.9%), of which 99.6% contain a genuinely overlapping triangle.
  Skippable miss iterations ~8 scalar ops each = 0.11 ms; false-positive
  hit groups = 59 = 0.02 ms. TOTAL CEILING ~0.15 ms of a ~21 ms stage.

Conclusion: the three-level bbox skip is already within noise of exact —
binning is NOT where the raster's time is. Together with
forward_vmem_probe.py (forward shading VMEM plan infeasible) and
raster_body_micro.py (scalar-free sublane body 22x slower on hardware),
this closes the round-2 floor attack: the ~20 ms raster / ~41 ms frame
single-chip floor stands, now with primitive-level evidence.
"""

import sys
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops import raster_pallas as rp

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
scene, meta, aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
setup = jax.jit(lambda s, v, c: prepare_frame(s, v, c, meta=meta,
                                              config=config)[0])(
    scene, camera.view_projection_transform, camera.position)
bbox = np.asarray(setup["bbox"]); valid = np.asarray(setup["valid"])
th, tw = config.tile_shape
ph, pw = config.padded_height, config.padded_width
S = 4; rows = S * th; chunk = config.pallas_chunk
gs = config.raster_group_size
tiles_y, tiles_x = ph // th, pw // tw
bands = 1
for d in range(2, tiles_y + 1):
    if tiles_y % d == 0 and d * rows * tw * 8 <= rp._ACC_VMEM_BUDGET:
        bands = d
print(f"tile {th}x{tw} tiles {tiles_y}x{tiles_x} bands={bands}")
T = valid.shape[0]; t_pad = -(-T // chunk) * chunk
bb = np.zeros((4, t_pad), np.float32)
bb[0, :T] = np.where(valid, bbox[:, 0], 2**30)
bb[1, :T] = np.where(valid, bbox[:, 1], 2**30)
bb[2, :T] = np.where(valid, bbox[:, 2], -(2**30))
bb[3, :T] = np.where(valid, bbox[:, 3], -(2**30))
bb[0, T:] = 2**30; bb[1, T:] = 2**30
bb[2, T:] = -(2**30); bb[3, T:] = -(2**30)

def part1by1(x):
    x = x & 0xFFFF; x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F; x = (x | (x << 2)) & 0x33333333
    return (x | (x << 1)) & 0x55555555

g = 16
cx = np.clip((bb[0] + bb[2]).astype(np.int64) // (2 * g), 0, 1023)
cy = np.clip((bb[1] + bb[3]).astype(np.int64) // (2 * g), 0, 1023)
key = part1by1(cx) | (part1by1(cy) << 1)
vld_pad = np.zeros(t_pad, bool); vld_pad[:T] = valid
key = np.where(vld_pad, key, 2**31 - 1)
perm = np.argsort(key, kind="stable")
bb = bb[:, perm]; vld = vld_pad[perm]
n_chunks = t_pad // chunk
cb = np.stack([bb[0].reshape(-1, chunk).min(1),
               bb[1].reshape(-1, chunk).min(1),
               bb[2].reshape(-1, chunk).max(1),
               bb[3].reshape(-1, chunk).max(1)])
gb = np.stack([bb[0].reshape(-1, gs).min(1), bb[1].reshape(-1, gs).min(1),
               bb[2].reshape(-1, gs).max(1), bb[3].reshape(-1, gs).max(1)])
bin_h = bands * th
chunk_visits = group_iters = group_hits = exact_chunk_visits = 0
tri_group_hits = 0
for by in range(tiles_y // bands):
    for bx in range(tiles_x):
        x0, x1 = bx * tw, (bx + 1) * tw
        y0, y1 = by * bin_h, (by + 1) * bin_h
        hit_c = (cb[0] < x1) & (cb[2] > x0) & (cb[1] < y1) & (cb[3] > y0)
        chunk_visits += hit_c.sum()
        tri_hit = ((bb[0] < x1) & (bb[2] > x0) & (bb[1] < y1)
                   & (bb[3] > y0) & vld)
        exact_chunk_visits += tri_hit.reshape(-1, chunk).any(1).sum()
        gh = (gb[0] < x1) & (gb[2] > x0) & (gb[1] < y1) & (gb[3] > y0)
        ghc = gh.reshape(-1, chunk // gs)
        group_iters += int(hit_c.sum()) * (chunk // gs)
        group_hits += int(ghc[hit_c].sum())
        tri_group_hits += int(tri_hit.reshape(-1, gs).any(1)
                              .reshape(-1, chunk // gs)[hit_c].sum())
print(f"chunks={n_chunks} chunk_visits={chunk_visits} "
      f"(exact {exact_chunk_visits}, "
      f"-{100 * (1 - exact_chunk_visits / chunk_visits):.1f}%)")
print(f"group iterations={group_iters}, bbox hits={group_hits} "
      f"({100 * group_hits / group_iters:.1f}%), exact-hit groups="
      f"{tri_group_hits} ({100 * tri_group_hits / max(group_hits, 1):.1f}%)")
miss = group_iters - group_hits
fp = group_hits - tri_group_hits
print(f"ceiling: misses {miss} x ~8 ops = {miss * 8 / 0.94e9 * 1e3:.2f} ms; "
      f"false-positive hits {fp} x ~240 ops = "
      f"{fp * 240 / 0.94e9 * 1e3:.2f} ms")

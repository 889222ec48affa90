#!/usr/bin/env python
"""Forward-shading VMEM feasibility: can the fused-mip texel pool be made
column-resident so the raster kernel could shade in place?

docs/NEXT.md (round 2) named forward shading "re-attempt only with a
concrete VMEM plan for the texel pool (per-column-segment pool residency
for the materials its tiles touch)". This probe COSTS that plan on Sponza
at the bench camera, three ways:

  1. per-COLUMN (128 px) residency: full fused-mip chains of every material
     whose visible triangle bbox overlaps the column;
  2. per-COLUMN-SEGMENT (the production raster's 32-row x 128-px program
     footprint granularity... approximated as 128x128 px tiles) — the
     finest residency the column-supertile kernel could re-stage between
     programs;
  3. a best-case MIP-SUBSET bound: drop every chain level coarser OR finer
     than the [min, max] mip level any covered pixel of that column could
     request at this camera (approximated by the per-triangle bbox->uv
     footprint), i.e. the fewest bytes any staging scheme could get away
     with while staying exact.

Result (2026-08-20, sponza @1080p, bench camera): per-column residency is
32-80 MB (min over columns 32 MB) vs 16 MB of VMEM TOTAL (before the
raster kernel's own accumulators/stream buffers, ~2-4 MB). Single material
chains run 2-8 MB, so even 128x128 tiles (10-15 reachable materials in the
nave) cannot fit; the mip-subset bound still exceeds VMEM for every
central column. Forward shading's VMEM plan is INFEASIBLE on this scene
class independent of the (also-blocking, separately measured) absence of
efficient in-kernel gathers in Mosaic — the deferred two-gather design
stands. See tools/README.md (round 3).
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops.texture_pack import _chain_block_rows, blocks_per_level, block_level_offset
from vktf_tpu.scene.flatten import flatten_assets

ROW_BYTES = 256  # fused-mip block row = 128 u16 lanes
VMEM_MB = 16.0

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
scene, meta, aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, camera.view_projection_transform, camera.position)
bbox = np.asarray(setup["bbox"])
valid = np.asarray(setup["valid"])
sc = np.asarray(scene.tri_static_cols)
base_row = sc[7].astype(np.int64)
w0 = sc[8].astype(np.int64)
chain_rows = np.array([_chain_block_rows(int(w)) for w in w0])

# crude per-triangle mip estimate: uv span (from corner attrs) x texture
# width / screen bbox span — the level a pixel inside the triangle samples
tc = np.asarray(scene.tri_corner)  # (36, T): rows 0..5 = u,v corners
u = tc[0:3]; v = tc[3:6]
uv_span = np.maximum(u.max(0) - u.min(0), v.max(0) - v.min(0))
px_span = np.maximum(
    np.maximum(bbox[:, 2] - bbox[:, 0], bbox[:, 3] - bbox[:, 1]), 1.0
)
texels_per_px = uv_span * w0 / px_span
mip = np.clip(np.log2(np.maximum(texels_per_px, 1e-6)), 0, 20).astype(int)


def chain_bytes(width, lo=0, hi=99):
    levels = int(np.log2(max(int(width), 1))) + 1
    lo = min(lo, levels - 1)
    hi = min(hi, levels - 1)
    rows = sum(blocks_per_level(int(width), l) ** 2 for l in range(lo, hi + 1))
    return rows * ROW_BYTES


def residency(mask, mip_subset=False):
    bases = np.unique(base_row[mask])
    total = 0
    for b in bases:
        sel = mask & (base_row == b)
        width = int(w0[base_row == b][0])
        if mip_subset:
            lo = int(mip[sel].min())
            hi = int(mip[sel].max()) + 1  # trilinear needs level+1
            total += chain_bytes(width, lo, hi)
        else:
            total += chain_bytes(width)
    return len(bases), total / 2**20


print(f"pool total ~{int(max(base_row + chain_rows)) * ROW_BYTES / 2**20:.1f} MB; "
      f"VMEM = {VMEM_MB} MB (minus raster accumulators/stream ~2-4 MB)")
print(f"{'col':>4} {'mats':>5} {'full-chain MB':>14} {'mip-subset MB':>14} "
      f"{'worst 128x128 tile MB':>22}")
for c in range(1920 // 128):
    x0, x1 = c * 128, (c + 1) * 128
    m = valid & (bbox[:, 0] < x1) & (bbox[:, 2] > x0)
    nm, full = residency(m)
    _, mips = residency(m, mip_subset=True)
    worst_tile = 0.0
    for r in range(1080 // 128 + 1):
        y0, y1 = r * 128, (r + 1) * 128
        tm = m & (bbox[:, 1] < y1) & (bbox[:, 3] > y0)
        if tm.any():
            worst_tile = max(worst_tile, residency(tm, mip_subset=True)[1])
    verdict = "FITS" if mips < VMEM_MB - 4 else "does not fit"
    print(f"{c:>4} {nm:>5} {full:>14.1f} {mips:>14.1f} {worst_tile:>22.1f}"
          f"  {verdict}")

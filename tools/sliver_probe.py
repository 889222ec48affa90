#!/usr/bin/env python
"""Probe why a sliver triangle passes edge tests far outside its bbox.

From tools/wr_diff_probe: tri 230457 (bbox [1110,727,1115,729]) won sample
(s=0, y=721, x=1093) at WR=32 — 6 px above / 17 px left of its bbox.
Evaluate its packed planes exactly as the kernel does.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops.raster_pallas import pack_tri_data
from vktf_tpu.ops.raster_xla import SAMPLE_OFFSETS

config = RenderConfig(width=1920, height=1080, msaa_samples=4, backend="tiled")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position

setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
tri_data = np.asarray(pack_tri_data(setup))

CASES = [
    (230457, 1093, 721, 0),   # spurious win (outside bbox)
    (230457, 1112, 728, 0),   # inside own bbox (sanity)
    (229216, 1093, 721, 0),   # the WR=16 winner at the same sample
]
offs = SAMPLE_OFFSETS[4]
bbox = np.asarray(setup["bbox"])
for tid, x, y, s in CASES:
    d = tri_data[:, tid]
    ax, ay = bbox[tid, 0], bbox[tid, 1]  # anchor = bbox corner
    sx = np.float32(x + offs[s][0])
    sy = np.float32(y + offs[s][1])
    dxx = np.float32(sx - np.float32(ax))
    dyy = np.float32(sy - np.float32(ay))
    es = []
    for e in range(3):
        a, b, c = d[3 * e], d[3 * e + 1], d[3 * e + 2]
        ev = np.float32(np.float32(a * dxx) + np.float32(b * dyy) + c)
        thr = int(d[16 + e])
        ei = ev.view(np.int32)
        es.append((float(a), float(b), float(c), float(ev), int(ei), thr,
                   bool(ei > thr)))
    depth = np.float32(np.float32(d[9] * dxx) + np.float32(d[10] * dyy) + d[11])
    wrec = np.float32(np.float32(d[12] * dxx) + np.float32(d[13] * dyy) + d[14])
    print(f"tri {tid} at ({x},{y}) s{s}: bbox={bbox[tid].tolist()}")
    for e, t in enumerate(es):
        print(f"  edge{e}: a={t[0]:.6g} b={t[1]:.6g} c={t[2]:.6g} "
              f"eval={t[3]:.6g} pass={t[6]}")
    print(f"  depth={float(depth):.9g} w_recip={float(wrec):.6g} "
          f"inside={all(t[6] for t in es)} depth_ok={0 <= depth <= 1} "
          f"w_ok={wrec > 0}")

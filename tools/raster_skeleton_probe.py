#!/usr/bin/env python
"""Decompose the 8.15 ms raster SKELETON into hardware-attributable parts
(VERDICT r4 #2 — the empty-body number's own composition was unmeasured).

Ladder (each mode adds one mechanism; deltas attribute the cost):
  init_only   accumulator init + output copy-out, no visit loop
  dma_tiny    + the visit/DMA issue+wait chain at 1-row copies (~7% bytes)
  dma_only    + the full 28 KB/visit transfer bytes
  groups_only + per-group scalar bbox/safe tests (window loops never run)
  empty       + window-loop machinery incl. per-triangle scalar hoists
  one_edge    + one plane eval/select per (triangle, window)
  full        production kernel

    python tools/raster_skeleton_probe.py > /tmp/raster_skel.log 2>&1
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops import raster_pallas as rp
from vktf_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()
config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position
ph, pw = config.padded_height, config.padded_width

setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)
print(f"tris={meta.num_triangles} interleave={config.resolved_interleave()} "
      f"win={config.raster_window_rows or 32} gs={config.raster_group_size}",
      flush=True)

MODES = ("init_only", "dma_tiny", "dma_only", "groups_only", "empty",
         "one_edge", "full")
fns = {}
for mode in MODES:
    rp._PROBE_BODY = mode
    t0 = time.time()
    fns[mode] = jax.jit(lambda su: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", window_rows=config.raster_window_rows or 32,
        group_size=config.raster_group_size,
        interleave=config.resolved_interleave(),
        columns=config.raster_columns,
    )).lower(setup).compile()
    print(f"compiled {mode} in {time.time() - t0:.1f} s", flush=True)
rp._PROBE_BODY = "full"

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

N = 10
results = {m: [] for m in fns}
for rep in range(3):
    for m, f in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            tri_id, _d = f(setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[m].append(dt)
        print(f"rep{rep} {m:12s} {dt:7.2f} ms", flush=True)
best = {m: round(min(v), 2) for m, v in results.items()}
print(json.dumps(best), flush=True)
keys = list(MODES)
for a, b in zip(keys, keys[1:]):
    print(f"delta {b:12s} - {a:12s} = {best[b] - best[a]:7.2f} ms",
          flush=True)

#!/usr/bin/env python
"""Same-process A/B of raster kernel group sizes (run on TPU).

Static work stats (tools/group_stats variant) at sponza 1080p 4xMSAA:
  GS=16: 662k (tri,window) vector evals, 32% useful
  GS= 8: 465k evals, 46% useful (2x group tests, +40% window visits)
  GS= 4: 352k evals, 60% useful (4x group tests, +112% window visits)
One-sync device timing per variant + bit-identity vs GS=16.
"""
from __future__ import annotations

import sys
import time

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

SIZES = [int(a) for a in (sys.argv[1:] or ["16", "8", "4"])]
fns = {}
for gs in SIZES:
    fns[gs] = jax.jit(lambda su, g=gs: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", window_rows=config.raster_window_rows, group_size=g))

refs = {gs: fns[gs](setup) for gs in SIZES}
base = SIZES[0]
for gs in SIZES[1:]:
    same_id = bool(jnp.all(refs[base][0] == refs[gs][0]))
    same_d = bool(jnp.all(refs[base][1] == refs[gs][1]))
    print(f"GS={gs} vs {base}: id_equal={same_id} depth_equal={same_d}",
          flush=True)

# no-op RPC
for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

N = 10
results = {gs: [] for gs in SIZES}
for rep in range(3):
    for gs in SIZES:
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            tri_id, _depth = fns[gs](setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[gs].append(dt)
        print(f"rep{rep} GS={gs:2d} {dt:7.2f} ms", flush=True)
print({gs: round(min(v), 2) for gs, v in results.items()})

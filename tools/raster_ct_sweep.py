#!/usr/bin/env python
"""Same-process sweep of raster (tile_shape, chunk) at GS=8.

tile (128,128) was ~2 ms faster raster than (64,128) in round 1 but +6%
padded pixels to shade — a wash at 50 ms shade, possibly a win at ~22 ms.
chunk 256 was the GS=16 sweet spot; GS=8 changes the group/window balance.
Output equality is checked after ASSEMBLY (tile layouts differ per config).
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

setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)
print(f"tris={meta.num_triangles}", flush=True)

# (tile_h, tile_w, chunk)
VARIANTS = [(64, 128, 256), (64, 128, 128), (64, 128, 512), (128, 128, 256),
            (32, 128, 256)]
fns = {}
for th, tw, ck in VARIANTS:
    ph = -(-1080 // th) * th
    pw = -(-1920 // tw) * tw
    fns[(th, tw, ck)] = jax.jit(
        lambda su, t=(th, tw), c=ck, H=ph, W=pw: rp.rasterize_pallas(
            su, H, W, tile_shape=t, msaa_samples=4, chunk=c,
            sort="morton", window_rows=32, group_size=8, assemble=True))

refs = {}
for v in VARIANTS:
    tri_id, depth = fns[v](setup)
    refs[v] = (tri_id[:, :1080, :1920], depth[:, :1080, :1920])
base = VARIANTS[0]
for v in VARIANTS[1:]:
    same_id = bool(jnp.all(refs[base][0] == refs[v][0]))
    same_d = bool(jnp.all(refs[base][1] == refs[v][1]))
    print(f"{v} vs {base}: id_equal={same_id} depth_equal={same_d}", flush=True)

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

N = 10
results = {v: [] for v in VARIANTS}
for rep in range(3):
    for v in VARIANTS:
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            tri_id, _depth = fns[v](setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[v].append(dt)
        print(f"rep{rep} tile=({v[0]},{v[1]}) chunk={v[2]} {dt:7.2f} ms",
              flush=True)
print({f"{v}": round(min(t), 2) for v, t in results.items()})

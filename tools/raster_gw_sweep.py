#!/usr/bin/env python
"""Same-process sweep of (group_size, window_rows) raster kernel variants.

GS=8 beat 16 (27.6 vs 32.5 ms, tools/raster_group_ab.py); smaller groups
shift the window/group balance, so re-sweep window_rows jointly. One-sync
device timing per variant + bit-identity vs the first variant.
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

VARIANTS = [(8, 32), (8, 16), (8, 64), (4, 16), (4, 32), (16, 32)]
fns = {}
for gs, wr in VARIANTS:
    fns[(gs, wr)] = jax.jit(lambda su, g=gs, w=wr: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", window_rows=w, group_size=g))

refs = {v: fns[v](setup) for v in VARIANTS}
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
        print(f"rep{rep} GS={v[0]:2d} WR={v[1]:2d} {dt:7.2f} ms", flush=True)
print({f"{v}": round(min(t), 2) for v, t in results.items()})

#!/usr/bin/env python
"""Decompose shade phase A (addr): table gather+transpose vs addressing math.

addr measured ~8.4 ms (tools/shade_bf16_ab.py, u16 row). Pieces:
  gatherT   — gather_rows + .T only (the phase-boundary tensor)
  addr_full — production shade_addr_chunk (gatherT + pool_row_indices)
One-sync interleaved timing on the production tile-layout inputs.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import PallasFrameProgram
from vktf_tpu.ops.shade_kernel import shade_addr_chunk
from vktf_tpu.ops.shade_table import gather_rows
from vktf_tpu.runtime.cache import enable_persistent_cache
from vktf_tpu.scene.flatten import flatten_assets
from bench import CAMERAS

enable_persistent_cache()
config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position
prog = PallasFrameProgram(meta, config)
prog.warmup(scene, vp, cam_pos)
setup, lights = prog._prepare(scene, vp, cam_pos)
perm = prog._perm_fn(setup)
tri_id, depth = prog._raster(setup, perm)
table = prog._table(setup, scene)
table = jax.block_until_ready(table)
print(f"table {table.shape} {table.dtype}", flush=True)

# reconstruct the flat per-pixel inputs the tiled addr path uses
from vktf_tpu.ops.pipeline import (
    _tiled_pixel_coords, _flat_pad_chunks, _shade_chunks,
)
from vktf_tpu.ops import pipeline as pl_mod

ids = tri_id if tri_id.ndim == 4 else tri_id[None]
deps = depth if depth.ndim == 4 else depth[None]
id_px, _frac = jax.jit(
    lambda i, d: pl_mod._tiled_winner(i, d, config=config)
)(ids, deps)
t_flat = id_px[0].reshape(-1)
sx, sy = _tiled_pixel_coords(config, config.num_tiles)
sx, sy = sx.reshape(-1), sy.reshape(-1)
print(f"pixels {t_flat.shape[0]}", flush=True)

aniso = config.max_anisotropy
gatherT = jax.jit(lambda tb, t: gather_rows(tb, jnp.maximum(t, 0)).T)
addr_full = jax.jit(lambda t, x, y, tb: shade_addr_chunk(t, x, y, tb, aniso))
winner = jax.jit(lambda i, d: pl_mod._tiled_winner(i, d, config=config))
fns = {
    "winner": (winner, (ids, deps)),
    "gatherT": (gatherT, (table, t_flat)),
    "addr_full": (addr_full, (t_flat, sx, sy, table)),
}
for k, (f, a) in fns.items():
    jax.block_until_ready(f(*a))

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

N = 12
res = {}
for rep in range(3):
    for k, (f, a) in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            out = f(*a)
            leaf = out[0] if isinstance(out, tuple) else out
            acc = acc + jnp.sum(leaf.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        res.setdefault(k, []).append(dt)
        print(f"rep{rep} {k:10s} {dt:7.2f} ms", flush=True)
print({k: round(min(v), 2) for k, v in res.items()})

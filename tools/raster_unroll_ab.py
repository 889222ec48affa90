#!/usr/bin/env python
"""A/B the group-loop unroll factor in the production raster kernel.

raster_bound_probe2 (round 3) put the empty skeleton at 8.15 ms — ~300 ns
per group-loop iteration of pure loop control at 1080p Sponza. fori_loop
unrolling is a knob none of the round-1/2 sweeps touched. Output equality
is asserted per variant.

    python tools/raster_unroll_ab.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops import raster_pallas as rp
from vktf_tpu.scene.flatten import flatten_assets

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

UNROLLS = (1, 2, 4, 8)
fns = {}
for u in UNROLLS:
    rp._GROUP_UNROLL = u
    fns[u] = jax.jit(lambda su: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", window_rows=config.raster_window_rows or 32,
        group_size=config.raster_group_size,
        interleave=config.resolved_interleave(),
        columns=config.raster_columns,
    )).lower(setup).compile()
    print(f"unroll={u} compiled", flush=True)
rp._GROUP_UNROLL = 1

# bit-equality gate
ref_id, ref_d = (np.asarray(x) for x in fns[1](setup))
for u in UNROLLS[1:]:
    ti, dp = (np.asarray(x) for x in fns[u](setup))
    assert (ti == ref_id).all() and (dp == ref_d).all(), f"unroll={u} differs"
print("all variants bit-identical", flush=True)

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

N = 10
results = {u: [] for u in UNROLLS}
for rep in range(3):
    for u, f in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            tri_id, _d = f(setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[u].append(dt)
        print(f"rep{rep} unroll={u} {dt:7.2f} ms", flush=True)
print({u: round(min(v), 2) for u, v in results.items()})

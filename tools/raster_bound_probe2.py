#!/usr/bin/env python
"""Round-3 re-run of raster_bound_probe under the PRODUCTION raster config
(column supertiles + slim body + m=2 lane interleave + cached static perm):
what bounds today's ~20 ms — the loop/DMA/scalar skeleton or the vector
window body? Decides whether a scalar-free kernel topology (triangle-on-
sublane transposed evaluation) has headroom.

Modes: full = production; one_edge = one plane eval + select per triangle;
empty = window loop runs, accumulators untouched (skeleton only — but NOTE
the skeleton still includes the per-group hoisted SMEM scalar reads and
the window fori_loop machinery). Outputs are wrong for gutted modes.
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
print(f"tris={meta.num_triangles} interleave={config.resolved_interleave()} "
      f"win={config.raster_window_rows or 32} gs={config.raster_group_size}",
      flush=True)

fns = {}
for mode in ("full", "one_edge", "empty"):
    rp._PROBE_BODY = mode
    fns[mode] = jax.jit(lambda su: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", window_rows=config.raster_window_rows or 32,
        group_size=config.raster_group_size,
        interleave=config.resolved_interleave(),
        columns=config.raster_columns,
    )).lower(setup).compile()
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
        print(f"rep{rep} {m:8s} {dt:7.2f} ms", flush=True)
print({m: round(min(v), 2) for m, v in results.items()})

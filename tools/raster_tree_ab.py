#!/usr/bin/env python
"""Same-process A/B: tree lexmin vs sequential insertion (layers==1).

RESULT (v5e, 1080p Sponza 4xMSAA, 2026-08-18): tree 28.9 ms vs seq
28.2 ms, id/depth bit-identical — NO improvement. The sequential
per-triangle insertion chains ~7 dependent vector ops through the
accumulator per triangle, but Mosaic evidently pipelines across the chain
already, so the 3-level pairwise lexicographic-min tree bought nothing and
the simpler sequential form stays (see the comment in
ops/raster_pallas.py's kernel). This tool requires the since-removed
`_TREE_REDUCE` trace-time flag; it is kept as the record of the negative
result.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vktf_tpu.ops import raster_pallas as _rp

if not hasattr(_rp, "_TREE_REDUCE"):
    sys.exit("tree path removed after the negative result above; "
             "re-add _TREE_REDUCE to raster_pallas to re-run")

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

fns = {}
for mode in ("tree", "seq"):
    rp._TREE_REDUCE = mode == "tree"
    fns[mode] = jax.jit(lambda su, m=mode: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", window_rows=32, group_size=8))
    # force the trace NOW, while the flag is set for this mode
    fns[mode] = fns[mode].lower(setup).compile()
rp._TREE_REDUCE = True

refs = {m: fns[m](setup) for m in fns}
same_id = bool(jnp.all(refs["tree"][0] == refs["seq"][0]))
same_d = bool(jnp.all(refs["tree"][1] == refs["seq"][1]))
print(f"tree vs seq: id_equal={same_id} depth_equal={same_d}", flush=True)

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

N = 10
results = {m: [] for m in fns}
for rep in range(3):
    for m, f in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            tri_id, _depth = f(setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[m].append(dt)
        print(f"rep{rep} {m:4s} {dt:7.2f} ms", flush=True)
print({m: round(min(v), 2) for m, v in results.items()})

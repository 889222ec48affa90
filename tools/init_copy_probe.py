#!/usr/bin/env python
"""Skeleton init/copy-out floor mechanism (round-5 follow-up): is the
5.6 ms fixed cost the COLUMN-mode 4-D output blocks (17 non-contiguous
band sub-blocks per program copy), or per-program overhead itself?

  init_cols   column mode (production): 15 programs, (bands,1,rows,tw)
              blocks = 17 strided sub-copies each
  init_flat   columns=False: 510 programs, (1,rows,tw) CONTIGUOUS blocks

    python tools/init_copy_probe.py > /tmp/init_copy_probe.log 2>&1
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

rp._PROBE_BODY = "init_only"
fns = {}
for name, cols in (("init_cols", True), ("init_flat", False)):
    t0 = time.time()
    fns[name] = jax.jit(lambda su, c=cols: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", interleave=config.resolved_interleave(),
        columns=c,
    )).lower(setup).compile()
    print(f"compiled {name} in {time.time() - t0:.1f} s", flush=True)
# also the FULL kernel both ways for the frame-relevant contrast
rp._PROBE_BODY = "full"
for name, cols in (("full_cols", True), ("full_flat", False)):
    t0 = time.time()
    fns[name] = jax.jit(lambda su, c=cols: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="morton", interleave=config.resolved_interleave(),
        columns=c,
    )).lower(setup).compile()
    print(f"compiled {name} in {time.time() - t0:.1f} s", flush=True)

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

results = {m: [] for m in fns}
for rep in range(3):
    for m, f in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(10):
            tri_id, _d = f(setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / 10 * 1e3
        results[m].append(dt)
        print(f"rep{rep} {m:10s} {dt:7.2f} ms", flush=True)
print(json.dumps({m: round(min(v), 2) for m, v in results.items()}),
      flush=True)

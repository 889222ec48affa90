#!/usr/bin/env python
"""Same-process A/B: per-window all-miss skip vs unconditional body.

15.6% of (group, window) visits at 1080p Sponza have NO member triangle
passing the scalar window hit test (counter in this file's lineage);
_SKIP_EMPTY_WINDOWS wraps the whole vector body (accumulator read/write
included) in pl.when(any_hit). Round 1 measured per-TRIANGLE conds as a
loss — this checks whether the coarser per-window cond pays or also
breaks Mosaic's window-loop pipelining. Bit-identity asserted.
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

fns = {}
for mode in (True, False):
    rp._SKIP_EMPTY_WINDOWS = mode
    fns["skip" if mode else "plain"] = jax.jit(
        lambda su: rp.rasterize_pallas(
            su, ph, pw, tile_shape=config.tile_shape,
            msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
            sort="morton", window_rows=32, group_size=8,
        )
    ).lower(setup).compile()
rp._SKIP_EMPTY_WINDOWS = True

refs = {m: fns[m](setup) for m in fns}
print(f"skip vs plain: id_equal={bool(jnp.all(refs['skip'][0] == refs['plain'][0]))} "
      f"depth_equal={bool(jnp.all(refs['skip'][1] == refs['plain'][1]))}",
      flush=True)

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
            tri_id, _d = f(setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[m].append(dt)
        print(f"rep{rep} {m:5s} {dt:7.2f} ms", flush=True)
print({m: round(min(v), 2) for m, v in results.items()})

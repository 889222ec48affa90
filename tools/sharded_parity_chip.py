#!/usr/bin/env python
"""On-chip parity: gp=sp=1 sharded frame vs the plain pipeline (real TPU).

README claims the sharded path IS the production pipeline (verified on the
real chip each round); this re-checks bit-exactness + relative speed after
the round's raster/setup changes.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import PallasFrameProgram
from vktf_tpu.parallel.tiles import make_sharded_frame_fn
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

mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("gp", "sp"))
sharded = make_sharded_frame_fn(meta, config, mesh)
prog = PallasFrameProgram(meta, config)
prog.warmup(scene, vp, cam_pos)

t0 = time.time()
f_plain = np.asarray(prog(scene, vp, cam_pos))
print(f"plain first frame {time.time()-t0:.1f} s", flush=True)
t0 = time.time()
f_shard = np.asarray(sharded(scene, vp, cam_pos))
print(f"sharded first frame (incl compile) {time.time()-t0:.1f} s", flush=True)
print(f"bit-equal: {np.array_equal(f_plain, f_shard)}", flush=True)

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
N = 10
for rep in range(2):
    for name, f in (("plain", lambda: prog(scene, vp, cam_pos)),
                    ("shard", lambda: sharded(scene, vp, cam_pos))):
        acc = jnp.zeros((), jnp.int32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            acc = acc + jnp.sum(f().ravel()[-64:].astype(jnp.int32))
        np.asarray(acc)
        print(f"rep{rep} {name} {(time.time()-t0-rpc_s)/N*1e3:7.2f} ms",
              flush=True)

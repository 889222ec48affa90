#!/usr/bin/env python
"""A/B the packed-prepare row-stack form: 1-D concat+reshape vs jnp.stack.

The stacked form's fusions emit rank-2 (1, T) pieces (8x sublane tile
padding on every materialized row — tools/prepare_anatomy2.py); the concat
form keeps every fusion output a dense (T,) vector. Times the prepare
program and the chained frame under both, same process, interleaved.

    python tools/prepare_pack_ab.py > /tmp/prepare_pack_ab.log 2>&1
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from stage_probe import device_time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vktf_tpu.config import RenderConfig  # noqa: E402
from vktf_tpu.mathx import Camera, ViewFrustumParams  # noqa: E402
from vktf_tpu.models.scenes import build_preset  # noqa: E402
from vktf_tpu.ops import raster_pallas as rp  # noqa: E402
from vktf_tpu.ops.pipeline import PallasFrameProgram  # noqa: E402
from vktf_tpu.runtime.cache import enable_persistent_cache  # noqa: E402
from vktf_tpu.scene.flatten import flatten_assets  # noqa: E402
from bench import CAMERAS  # noqa: E402

enable_persistent_cache()
config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position

progs = {}
for form in ("concat", "stack"):
    rp._ROW_STACK_FORM = form
    prog = PallasFrameProgram(meta, config)
    t0 = time.time()
    prog.warmup(scene, vp, cam_pos)
    print(f"warmup {form} {time.time() - t0:.1f} s", flush=True)
    progs[form] = prog
rp._ROW_STACK_FORM = "concat"

frames = {f: np.asarray(progs[f](scene, vp, cam_pos)) for f in progs}
print(f"bit_equal={np.array_equal(frames['concat'], frames['stack'])}",
      flush=True)

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

stages = []
for form, prog in progs.items():
    mrows, mrowsT, lights, aabbs = prog._maybe_scene_update(scene)
    stages += [
        (f"{form}_prepare", prog._prepare_cam, (scene, mrows, mrowsT, aabbs, vp)),
        (f"{form}_frame", (lambda p: lambda s, v, c: p(s, v, c))(prog),
         (scene, vp, cam_pos)),
    ]
for name, fn, a in stages:
    device_time(fn, *a, n=1, rpc_s=rpc_s)
results = {}
for rep in range(3):
    for name, fn, a in stages:
        dt = device_time(fn, *a, n=25, rpc_s=rpc_s) * 1e3
        results.setdefault(name, []).append(dt)
        print(f"rep{rep} {name:16s} {dt:7.3f} ms", flush=True)
print(json.dumps({k: round(min(v), 3) for k, v in results.items()}),
      flush=True)

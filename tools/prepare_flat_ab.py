#!/usr/bin/env python
"""A/B: PACKED flat-component prepare (round 5) vs the legacy dict prepare.

Interleaved same-process device timings of prepare / raster / table and the
chained whole frame, plus a bit-compare of the presented frames (the packed
pipeline must be bit-identical — same expressions, stacking is exact).

    python tools/prepare_flat_ab.py > /tmp/prepare_flat_ab.log 2>&1
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
from vktf_tpu.ops.pipeline import PallasFrameProgram  # noqa: E402
from vktf_tpu.runtime.cache import enable_persistent_cache  # noqa: E402
from vktf_tpu.scene.flatten import flatten_assets  # noqa: E402
from bench import CAMERAS  # noqa: E402

enable_persistent_cache()
scene, meta, _aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position

progs = {}
for packed in (True, False):
    config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                          backend="pallas", prepare_packed=packed)
    prog = PallasFrameProgram(meta, config)
    t0 = time.time()
    prog.warmup(scene, vp, cam_pos)
    print(f"warmup packed={packed} {time.time() - t0:.1f} s", flush=True)
    progs[packed] = prog

# bit-compare the presented frames
frames = {p: np.asarray(progs[p](scene, vp, cam_pos)) for p in progs}
eq = np.array_equal(frames[True], frames[False])
maxdiff = int(np.abs(frames[True].astype(np.int32)
                     - frames[False].astype(np.int32)).max())
print(f"bit_equal={eq} maxdiff={maxdiff}", flush=True)

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

stages = []
for packed, prog in progs.items():
    tag = "packed" if packed else "legacy"
    mrows, mrowsT, lights, aabbs = prog._maybe_scene_update(scene)
    setup = prog._prepare_cam(scene, mrows, mrowsT, aabbs, vp)
    perm = prog._perm_fn(setup)
    stages += [
        (f"{tag}_prepare", prog._prepare_cam, (scene, mrows, mrowsT, aabbs, vp)),
        (f"{tag}_raster", prog._raster, (setup, perm)),
        (f"{tag}_table", prog._table, (setup, scene)),
        (f"{tag}_frame", (lambda p: lambda s, v, c: p(s, v, c))(prog),
         (scene, vp, cam_pos)),
    ]

for name, fn, a in stages:
    device_time(fn, *a, n=1, rpc_s=rpc_s)

results = {}
for rep in range(3):
    for name, fn, a in stages:
        dt = device_time(fn, *a, n=20, rpc_s=rpc_s) * 1e3
        results.setdefault(name, []).append(dt)
        print(f"rep{rep} {name:16s} {dt:7.3f} ms", flush=True)
print(json.dumps({k: round(min(v), 3) for k, v in results.items()}),
      flush=True)

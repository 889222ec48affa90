#!/usr/bin/env python
"""A/B: Mosaic setup kernel (prepare_impl="kernel") vs the flat XLA packed
prepare, on-chip, same process, interleaved. Also bit-compares whole
frames (Mosaic FMA contraction may perturb plane constants by ULPs — the
comparison REPORTS maxdiff rather than asserting).

Tail extra: raster init_only at 4x vs 1x MSAA — if the 5.6 ms skeleton
floor scales with the accumulator/output size it is a bandwidth
inefficiency (lever: in-kernel winner reduction shrinking copy-out 4x);
if flat, it is launch/grid overhead.

    python tools/prepare_kernel_ab.py > /tmp/prepare_kernel_ab.log 2>&1
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
from vktf_tpu.ops.pipeline import PallasFrameProgram, prepare_frame  # noqa: E402
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
for impl in ("kernel", "xla"):
    config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                          backend="pallas", prepare_impl=impl)
    prog = PallasFrameProgram(meta, config)
    t0 = time.time()
    prog.warmup(scene, vp, cam_pos)
    print(f"warmup {impl} {time.time() - t0:.1f} s", flush=True)
    progs[impl] = prog

frames = {i: np.asarray(progs[i](scene, vp, cam_pos)) for i in progs}
diff = np.abs(frames["kernel"].astype(np.int32)
              - frames["xla"].astype(np.int32))
print(f"frame maxdiff={int(diff.max())} ndiff={int((diff > 0).sum())} "
      f"of {diff.size}", flush=True)

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

stages = []
for impl, prog in progs.items():
    mrows, mrowsT, lights, aabbs = prog._maybe_scene_update(scene)
    stages += [
        (f"{impl}_prepare", prog._prepare_cam, (scene, mrows, mrowsT, aabbs, vp)),
        (f"{impl}_frame", (lambda p: lambda s, v, c: p(s, v, c))(prog),
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

# ---- init_only MSAA scaling (skeleton-floor mechanism) -------------------
from vktf_tpu.ops import raster_pallas as rp  # noqa: E402

config4 = RenderConfig(width=1920, height=1080, msaa_samples=4,
                       backend="pallas")
setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config4)[0]
)(scene, vp, cam_pos)
setup = jax.tree.map(jax.block_until_ready, setup)
rp._PROBE_BODY = "init_only"
fns = {}
for msaa in (4, 1):
    fns[msaa] = jax.jit(lambda su, m=msaa: rp.rasterize_pallas(
        su, config4.padded_height, config4.padded_width,
        tile_shape=config4.tile_shape, msaa_samples=m,
        chunk=config4.pallas_chunk, sort="morton",
        interleave=1, columns=config4.raster_columns,
    )).lower(setup).compile()
rp._PROBE_BODY = "full"
for rep in range(3):
    for msaa, f in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(10):
            tri_id, _d = f(setup)
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / 10 * 1e3
        print(f"rep{rep} init_only msaa={msaa} "
              f"{dt:7.2f} ms", flush=True)

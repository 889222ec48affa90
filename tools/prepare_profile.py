#!/usr/bin/env python
"""Profile the packed prepare program: per-op device times from a
jax.profiler trace, plus sub-stage decomposition (math-only / vis-gather /
pack-from-resident). Decides whether the remaining ~2.8 ms is fusion
launches, inter-fusion HBM traffic, or a few hot fusions (-> whether a
Mosaic setup kernel can win it back).

    python tools/prepare_profile.py > /tmp/prepare_profile.log 2>&1
"""
from __future__ import annotations

import glob
import gzip
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
from vktf_tpu.mathx.frustum import (  # noqa: E402
    aabbs_intersect_frustum, frustum_planes,
)
from vktf_tpu.models.scenes import build_preset  # noqa: E402
from vktf_tpu.ops.pipeline import PallasFrameProgram  # noqa: E402
from vktf_tpu.ops.raster_pallas import pack_tri_rows  # noqa: E402
from vktf_tpu.ops.vertex import triangle_setup_cm  # noqa: E402
from vktf_tpu.runtime.cache import enable_persistent_cache  # noqa: E402
from vktf_tpu.scene.flatten import flatten_assets  # noqa: E402
from bench import CAMERAS  # noqa: E402

enable_persistent_cache()
config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas", prepare_impl="kernel")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position

prog = PallasFrameProgram(meta, config)
mrows, mrowsT, lights, aabbs = prog._maybe_scene_update(scene)
_setup = jax.block_until_ready(prog._prepare_cam(scene, mrows, mrowsT, aabbs, vp))


def math_only(scene, mrows, view_projection):
    flat = triangle_setup_cm(scene.tri_corner, mrows, view_projection,
                             config.width, config.height, flat_out=True)
    acc = jnp.zeros((), jnp.float32)
    for k in ("valid", "inv_det", "safe", "anchor_x", "anchor_y"):
        acc = acc + jnp.sum(flat[k].astype(jnp.float32))
    for key in ("edges", "edges_raster"):
        for e in flat[key]:
            for c in e:
                acc = acc + jnp.sum(c)
    for key in ("zplane", "wplane"):
        for c in flat[key]:
            acc = acc + jnp.sum(c)
    for c in flat["bbox_cols"]:
        acc = acc + jnp.sum(c.astype(jnp.float32))
    return acc


def vis_only(scene, aabbs, view_projection):
    planes = frustum_planes(view_projection)
    visible = aabbs_intersect_frustum(aabbs, planes)
    return jnp.sum(visible[scene.tri_instance].astype(jnp.float32))


def kernel_alone(tc, mrt, visf, view_projection):
    from vktf_tpu.ops.setup_kernel import setup_pack_kernel

    return setup_pack_kernel(tc, mrt, visf, view_projection,
                             config.width, config.height)


import jax.numpy as _jnp  # noqa: E402

_visf = jax.jit(lambda s, a, v: (
    aabbs_intersect_frustum(a, frustum_planes(v))[s.tri_instance]
    .astype(_jnp.float32)[None]))(scene, aabbs, vp)
kernel_jit = jax.jit(kernel_alone)
math_jit = jax.jit(math_only)
vis_jit = jax.jit(vis_only)
_ = jax.block_until_ready(kernel_jit(scene.tri_corner, mrowsT, _visf, vp))
_ = jax.block_until_ready(math_jit(scene, mrows, vp))
_ = jax.block_until_ready(vis_jit(scene, aabbs, vp))

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

stages = [
    ("packed_prepare", prog._prepare_cam, (scene, mrows, mrowsT, aabbs, vp)),
    ("kernel_alone", kernel_jit, (scene.tri_corner, mrowsT, _visf, vp)),
    ("math_only", math_jit, (scene, mrows, vp)),
    ("vis_gather_only", vis_jit, (scene, aabbs, vp)),
]
for name, fn, a in stages:
    device_time(fn, *a, n=1, rpc_s=rpc_s)
for rep in range(3):
    for name, fn, a in stages:
        dt = device_time(fn, *a, n=30, rpc_s=rpc_s) * 1e3
        print(f"rep{rep} {name:16s} {dt:7.3f} ms", flush=True)

# --- device trace ---------------------------------------------------------
outdir = "/tmp/vktf_prepare_trace"
try:
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = prog._prepare_cam(scene, mrows, mrowsT, aabbs, vp)
        jax.block_until_ready(out)
    time.sleep(2)
    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    print(f"trace files: {files}", flush=True)
    agg = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "?")
            agg.setdefault(name, [0, 0.0])
            agg[name][0] += 1
            agg[name][1] += ev["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    for name, (n, dur) in rows[:40]:
        print(f"{dur / 1e3:9.3f} ms total  x{n:4d}  {name[:110]}")
except Exception as exc:  # profiling may be unsupported through the tunnel
    print(f"profiler failed: {type(exc).__name__}: {exc}", flush=True)

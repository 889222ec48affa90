#!/usr/bin/env python
"""Round-5 follow-up: census the NEW packed prepare program (flat setup ->
pack_tri_rows) — where do its remaining ~2.8 ms live? Prints per-fusion
instruction counts + operand/output shapes for the biggest fusions, and
times a math-only core (no consumers) to bound the elementwise floor.

    python tools/prepare_anatomy2.py > /tmp/prepare_anatomy2.log 2>&1
"""
from __future__ import annotations

import re
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
config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position

prog = PallasFrameProgram(meta, config)
mrows, mrowsT, lights, aabbs = prog._maybe_scene_update(scene)
setup = prog._prepare_cam(scene, mrows, mrowsT, aabbs, vp)

txt = prog._prepare_cam.lower(scene, mrows, mrowsT, aabbs, vp).compile().as_text()
with open("/tmp/prepare_packed2_hlo.txt", "w") as f:
    f.write(txt)

comps = re.split(r"\n(?=%?\S+ \([^)]*\) -> )", txt)
rows = []
for c in comps:
    header = c.split("\n", 1)[0]
    n = len(re.findall(r"=\s+\S+\s+[a-z][a-z0-9-]*\(", c))
    if "fused_computation" in header:
        m = re.search(r"-> (.{0,120})", header)
        rows.append((n, m.group(1) if m else "?"))
rows.sort(reverse=True)
print(f"fusions: {len(rows)}, entry instrs: "
      f"{len(re.findall(chr(10) + r'  [^ ]+ = ', txt.split('ENTRY')[-1]))}")
for n, out in rows[:20]:
    print(f"  {n:4d} instrs -> {out}")
padded = len(re.findall(r"f32\[\d+,1\]", txt)) + len(
    re.findall(r"f32\[\d+,1,3\]", txt))
print(f"padded-shape mentions (f32[T,1]/f32[T,1,3]): {padded}", flush=True)

# elementwise floor: the flat math with ONE tiny consumer (sum of every
# output row) — if this is ~as slow as the full program, the math itself
# (not layout) is the cost
from vktf_tpu.mathx.frustum import (  # noqa: E402
    aabbs_intersect_frustum, frustum_planes,
)
from vktf_tpu.ops.raster_pallas import pack_tri_rows  # noqa: E402
from vktf_tpu.ops.vertex import triangle_setup_cm  # noqa: E402


def core_sum(scene, mrows, aabbs, view_projection):
    flat = triangle_setup_cm(scene.tri_corner, mrows, view_projection,
                             config.width, config.height, flat_out=True)
    planes = frustum_planes(view_projection)
    visible = aabbs_intersect_frustum(aabbs, planes)
    packed = pack_tri_rows(flat, extra_valid=visible[scene.tri_instance])
    return (jnp.sum(packed["tri_data"]) + jnp.sum(packed["bbox_rows"])
            + jnp.sum(packed["edge9"]) + jnp.sum(packed["anchor2"]))


core_jit = jax.jit(core_sum)
_ = jax.block_until_ready(core_jit(scene, mrows, aabbs, vp))

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

stages = [
    ("packed_prepare", prog._prepare_cam, (scene, mrows, mrowsT, aabbs, vp)),
    ("core_sum_only", core_jit, (scene, mrows, aabbs, vp)),
]
for name, fn, a in stages:
    device_time(fn, *a, n=1, rpc_s=rpc_s)
for rep in range(3):
    for name, fn, a in stages:
        dt = device_time(fn, *a, n=30, rpc_s=rpc_s) * 1e3
        print(f"rep{rep} {name:16s} {dt:7.3f} ms", flush=True)

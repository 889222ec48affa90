#!/usr/bin/env python
"""Same-process A/B: bf16-bitcast-view gathers vs plain u16 in the
two-phase shade programs.

The microbench (tools/gather_dtype_ab.py) gathered from a PRE-BITCAST bf16
array; production bitcasts INSIDE the program (u16 table -> bf16 view ->
gather), which may defeat XLA's VMEM staging of the gather operand — the
very thing the two-program split exists for. This measures phase A and
phase B with both gather forms, one-sync interleaved.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops import shade_kernel, shade_table
from vktf_tpu.ops.pipeline import PallasFrameProgram
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
print(f"tris={meta.num_triangles} layers={meta.peel_layers}", flush=True)

orig = shade_table.gather_rows
# After the bf16 revert, production call sites no longer pass
# bf16_view=True — force each arm explicitly so this tool keeps measuring
# what it claims to (bf16-bitcast views vs plain u16 gathers).
bf16 = lambda t, i, bf16_view=False: orig(t, i, bf16_view=True)
plain = lambda t, i, bf16_view=False: t[i]

progs = {}
for mode in ("bf16", "u16"):
    shade_kernel.gather_rows = bf16 if mode == "bf16" else plain
    progs[mode] = PallasFrameProgram(meta, config)
    progs[mode].warmup(scene, vp, cam_pos)
    print(f"[{mode}] warm", flush=True)
shade_kernel.gather_rows = orig

stages = {}
for mode, prog in progs.items():
    setup, lights = prog._prepare(scene, vp, cam_pos)
    perm = prog._perm_fn(setup)
    tri_id, depth = prog._raster(setup, perm)
    table = prog._table(setup, scene)
    addr = prog._shade_addr(tri_id, depth, table)
    stages[f"addr/{mode}"] = (prog._shade_addr, (tri_id, depth, table))
    stages[f"final/{mode}"] = (prog._shade_final,
                               (addr, scene, lights, cam_pos))

# equality of the full frame between modes
f_b = np.asarray(progs["bf16"](scene, vp, cam_pos))
f_u = np.asarray(progs["u16"](scene, vp, cam_pos))
print(f"frames equal: {np.array_equal(f_b, f_u)}", flush=True)

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)


def probe_leaf(x, acc):
    v = jax.tree.leaves(x)[0]
    return acc + jnp.sum(v.ravel()[-64:].astype(jnp.float32))


N = 12
results = {k: [] for k in stages}
for rep in range(3):
    for k, (fn, args) in stages.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            acc = probe_leaf(fn(*args), acc)
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[k].append(dt)
        print(f"rep{rep} {k:12s} {dt:7.2f} ms", flush=True)
print({k: round(min(v), 2) for k, v in results.items()})

#!/usr/bin/env python
"""The per-triangle visibility expansion (visible[tri_instance], I~201 ->
T=262k) measured ~1.5-1.9 ms — the dominant cost of the packed prepare
(tools/prepare_profile.py trace). Probe cheaper forms:

  bool_gather    visible[tri_instance]                  (baseline)
  f32_gather     visible.astype(f32)[tri_instance]      (word-sized elems)
  i32_gather     visible.astype(i32)[tri_instance]

    python tools/vis_gather_probe.py > /tmp/vis_gather_probe.log 2>&1
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

from vktf_tpu.models.scenes import build_preset  # noqa: E402
from vktf_tpu.runtime.cache import enable_persistent_cache  # noqa: E402
from vktf_tpu.scene.flatten import flatten_assets  # noqa: E402

enable_persistent_cache()
scene, meta, _aux = flatten_assets(build_preset("sponza"))
tin = scene.tri_instance
t = int(tin.shape[0])
n_inst = meta.num_instances
# NOTE: tri_instance is NOT instance-sorted (flatten emits a world-Morton
# static stream), so the segment-broadcast variant is impossible; the
# production fix was to drop the expansion entirely (per-triangle screen
# cull, raster_pallas._packed_valid).
vis = jnp.asarray(np.random.default_rng(0).random(n_inst) < 0.5)


def bool_gather(v, tin):
    return v[tin]


def f32_gather(v, tin):
    return v.astype(jnp.float32)[tin]


def i32_gather(v, tin):
    return v.astype(jnp.int32)[tin]


fns = {
    "bool_gather": (jax.jit(bool_gather), (vis, tin)),
    "f32_gather": (jax.jit(f32_gather), (vis, tin)),
    "i32_gather": (jax.jit(i32_gather), (vis, tin)),
}
for name, (f, a) in fns.items():
    out = jax.block_until_ready(f(*a))
# correctness: all forms expand the same mask
ref = np.asarray(fns["bool_gather"][0](vis, tin))
assert np.array_equal(np.asarray(fns["f32_gather"][0](vis, tin)) > 0.5, ref)

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms  T={t} I={n_inst}", flush=True)

results = {}
for rep in range(3):
    for name, (f, a) in fns.items():
        dt = device_time(f, *a, n=40, rpc_s=rpc_s) * 1e3
        results.setdefault(name, []).append(dt)
        print(f"rep{rep} {name:12s} {dt:7.3f} ms", flush=True)
print(json.dumps({k: round(min(v), 3) for k, v in results.items()}),
      flush=True)

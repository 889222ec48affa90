#!/usr/bin/env python
"""Phase-A transpose lever (docs/NEXT.md round-5 floors): the production
shade-table gather fuses a transpose into the gather (trowT = table[idx].T,
~1.9 ms of the 7.8 ms phase A at 2.1M rows). Would a ROW-MAJOR gather
(no transpose; phase B transposes per block in VMEM like pool_rowmajor)
claw it back, despite the (N, 64) u16 output lane-padding to 128 (2x
write bytes)?

  gather_T    table[idx].T        (production)
  gather_rm   table[idx]          (row-major, 2x padded write)

    python tools/table_rowmajor_probe.py > /tmp/table_rowmajor.log 2>&1
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

from vktf_tpu.runtime.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
T, W, N = 262688, 64, 1 << 21
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 1 << 16, (T, W)).astype(np.uint16))
idx = jnp.asarray(rng.integers(0, T, (N,)).astype(np.int32))


def gather_T(table, idx):
    return table[idx].T


def gather_rm(table, idx):
    return table[idx]


fns = {"gather_T": jax.jit(gather_T), "gather_rm": jax.jit(gather_rm)}
for f in fns.values():
    jax.block_until_ready(f(table, idx))

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms  table=({T},{W})u16 N={N}", flush=True)

results = {}
for rep in range(3):
    for name, f in fns.items():
        dt = device_time(f, table, idx, n=15, rpc_s=rpc_s) * 1e3
        results.setdefault(name, []).append(dt)
        print(f"rep{rep} {name:10s} {dt:7.3f} ms", flush=True)
print(json.dumps({k: round(min(v), 3) for k, v in results.items()}),
      flush=True)

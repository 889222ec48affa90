#!/usr/bin/env python
"""Bisect the VMEM-staging gather cliff inside (458752, 475136] rows.

Round-2 established (gather_scale_ab.py + /tmp cliff probes): row gathers
from a (rows, 128)-u16 table run at a flat ~2 ns/idx while the 128-lane-
padded staged form fits XLA's VMEM staging (117 MB at 458,752 rows was
fast; 122 MB at 475,136 slow), and `texture_pack.FAST_GATHER_ROWS` clamps
pool chains at the last PROVEN-fast point. This probe walks the open
window in 4096-row (1 MB) steps with the round-2 method (full-reduction
consumer so XLA cannot fuse a slice into the gather), placing the cliff
to 1 MB so a production pool landing in the window is no longer a silent
risk.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

N_IDX = 1 << 21  # 2.1M indices (1080p pixel rate)
ROWS = [458752 + 4096 * k for k in range(0, 5)]  # 458752..475136
ROWS += [475136]
ROWS = sorted(set(ROWS))

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, 458752, N_IDX, dtype=np.int32))


def make(rows):
    table = jnp.asarray(
        rng.integers(0, 65535, (rows, 128), dtype=np.uint16))

    def f(t, i):
        g = t[i]  # (N_IDX, 128) u16 row gather
        return jnp.sum(g.astype(jnp.int32))

    return jax.jit(f).lower(table, idx).compile(), table


fns = {}
for r in ROWS:
    fns[r] = make(r)
    print(f"rows={r} ({r * 256 / 2**20:.1f} MB staged) compiled", flush=True)

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

N = 20
best = {}
for rep in range(3):
    for r, (f, table) in fns.items():
        acc = jnp.zeros((), jnp.int32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            acc = acc + f(table, idx)
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N
        best[r] = min(best.get(r, 1e9), dt)
        print(f"rep{rep} rows={r} {dt * 1e3:7.2f} ms "
              f"({dt / N_IDX * 1e9:5.2f} ns/idx)", flush=True)
print({r: round(v / N_IDX * 1e9, 2) for r, v in sorted(best.items())})

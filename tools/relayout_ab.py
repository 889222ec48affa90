#!/usr/bin/env python
"""Measure the REAL cost of the shade phase-boundary relayout copies.

The compiled two-phase shade (tools/dump_shade2_hlo.py) shows the
gather -> lane-major transposes materialized as big relayout copies
(u16[2M,128]{1,0} -> {0,1}: ~6.87M estimated cycles EACH, three of them
per frame plus phase A's table-row transpose). The shade docstrings
assumed XLA fuses the transpose into the gather (microbench15 measured
gather 9.5 vs gather+transpose 11.1 ms — but that was HBM-resident and
round 1's operand sizes). This tool times, same-process interleaved on
the live chip, at production sizes (pool 371k x 128 u16, 2.09M indices):

  A: gather(pool, idx)                      materialized (N,128)
  B: gather(pool, idx).T.reshape(128,nb,128) materialized  (the production
     form feeding the lane-major shade kernel BlockSpecs)

B - A = what the relayout copy actually costs per gathered tensor.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def device_time(fn, args, n=8, rpc_s=0.0):
    """One-sync device probe (stage_probe method): block_until_ready
    under-reports through the axon tunnel, so fold a tiny reduction of each
    output into an accumulator and materialize ONCE to host."""
    acc = jnp.zeros((), jnp.float32)
    np.asarray(fn(*args).ravel()[-8:])  # warm
    np.asarray(acc)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        acc = acc + jnp.sum(out.ravel()[-64:].astype(jnp.float32))
    np.asarray(acc)
    return (time.time() - t0 - rpc_s) / n


def measure_rpc():
    acc = jnp.zeros((), jnp.float32)
    ts = []
    for _ in range(5):
        np.asarray(acc)
        t0 = time.time()
        np.asarray(acc + 1.0)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    rng = np.random.default_rng(0)
    pool_rows = 371382
    n = 2088960
    pool = jnp.asarray(
        rng.integers(0, 65536, size=(pool_rows, 128), dtype=np.uint16)
    )
    # spatially-coherent-ish indices: sorted runs of 64 like tile-local ids
    idx_raw = rng.integers(0, pool_rows, size=(n // 64,), dtype=np.int32)
    idx = jnp.asarray(np.repeat(idx_raw, 64) % pool_rows)

    nb = n // 128

    @jax.jit
    def ga(pool, idx):
        return pool[idx]

    @jax.jit
    def gb(pool, idx):
        return pool[idx].T.reshape(128, nb, 128)

    # interleaved reps
    rpc = measure_rpc()
    print(f"rpc {rpc*1e3:.1f} ms")
    ta, tb = [], []
    for _ in range(6):
        ta.append(device_time(ga, (pool, idx), rpc_s=rpc))
        tb.append(device_time(gb, (pool, idx), rpc_s=rpc))
    ta_med = sorted(ta)[len(ta) // 2] * 1e3
    tb_med = sorted(tb)[len(tb) // 2] * 1e3
    print(f"gather only        : {ta_med:7.2f} ms  {[f'{t*1e3:.2f}' for t in ta]}")
    print(f"gather + relayout  : {tb_med:7.2f} ms  {[f'{t*1e3:.2f}' for t in tb]}")
    print(f"relayout copy cost : {tb_med - ta_med:7.2f} ms per tensor")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Can the shade kernel eat ROW-MAJOR gathered pool rows and transpose them
in VMEM — cheaper than XLA's HBM relayout copy (measured 1.76 ms/tensor at
production sizes, tools/relayout_ab.py)?

Three candidates per gathered tensor, all producing the lane-major
(128, nb, 128) view the shade accessors want:

  A (production): gather -> .T.reshape(128, nb, 128) in XLA (relayout copy),
     kernel reads (128, 8, 128) blocks and sums a few lanes.
  B: gather stays (N, 128); kernel reads (1024, 128) u16 blocks and
     transposes IN KERNEL (jnp .T), then same lane sums.
  C: like B but transposing via u32 bitcast pairs (if 16-bit transpose is
     unsupported/slow in Mosaic).

The consumer is a stand-in (sum of the ~22 lanes the real taps touch) —
what matters is layout handling, not the fragment math. Checks bit-equality
of the lane sums and times each end-to-end (gather + kernel).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = [0, 1, 2, 3, 8, 9, 10, 11, 32, 33, 34, 35, 40, 41, 42, 43,
         64, 65, 66, 67, 72, 73]  # ~the taps the real quad accessors read
BLOCK = 1024
BB = BLOCK // 128


def _consume(lane):
    acc = None
    for k in LANES:
        v = lane(k).astype(jnp.int32)
        acc = v if acc is None else acc + v * (k + 1)
    return acc


def kernel_a(q_ref, out_ref):
    out_ref[...] = _consume(lambda k: q_ref[k])


def kernel_b(q_ref, out_ref):
    q = q_ref[...]  # (1024, 128) u16
    qt = q.T.reshape(128, BB, 128)
    out_ref[...] = _consume(lambda k: qt[k])


def kernel_c(q_ref, out_ref):
    q32 = q_ref[...]  # (1024, 64) u32 (host bitcast view of the u16 rows)
    qt = q32.T.reshape(64, BB, 128)  # (64, 8, 128)

    def lane(k):
        w = qt[k // 2].astype(jnp.int32)
        return (w >> (16 * (k & 1))) & 0xFFFF

    out_ref[...] = _consume(lane)


def run(form, pool, idx, n):
    nb = n // 128
    grid = (n // BLOCK,)
    out_spec = pl.BlockSpec((BB, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, 128), jnp.int32)

    if form == "a":
        def fn(pool, idx):
            q = pool[idx].T.reshape(128, nb, 128)
            return pl.pallas_call(
                kernel_a, grid=grid,
                in_specs=[pl.BlockSpec((128, BB, 128), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=out_spec, out_shape=out_shape)(q)
    elif form == "b":
        def fn(pool, idx):
            q = pool[idx]
            return pl.pallas_call(
                kernel_b, grid=grid,
                in_specs=[pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=out_spec, out_shape=out_shape)(q)
    else:
        def fn(pool, idx):
            q = pool[idx]
            q32 = jax.lax.bitcast_convert_type(
                q.reshape(n, 64, 2), jnp.uint32)
            return pl.pallas_call(
                kernel_c, grid=grid,
                in_specs=[pl.BlockSpec((BLOCK, 64), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=out_spec, out_shape=out_shape)(q32)
    return jax.jit(fn)


def device_time(fn, args, n=8, rpc_s=0.0):
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
        rng.integers(0, 65536, size=(pool_rows, 128), dtype=np.uint16))
    idx_raw = rng.integers(0, pool_rows, size=(n // 64,), dtype=np.int32)
    idx = jnp.asarray(np.repeat(idx_raw, 64) % pool_rows)

    fns = {}
    for form in ("a", "b", "c"):
        try:
            fn = run(form, pool, idx, n)
            ref = np.asarray(fn(pool, idx))
            fns[form] = (fn, ref)
            print(f"form {form}: compiles/runs")
        except Exception as e:  # noqa: BLE001
            print(f"form {form}: FAILED {type(e).__name__}: {str(e)[:300]}")
    if "a" in fns:
        ra = fns["a"][1]
        for form, (_, r) in fns.items():
            if form != "a":
                print(f"bit-equal a vs {form}: {bool((ra == r).all())}")

    rpc = measure_rpc()
    print(f"rpc {rpc*1e3:.1f} ms")
    times = {f: [] for f in fns}
    for _ in range(6):
        for form, (fn, _) in fns.items():
            times[form].append(device_time(fn, (pool, idx), rpc_s=rpc))
    for form, ts in times.items():
        med = sorted(ts)[len(ts) // 2] * 1e3
        print(f"form {form}: {med:7.2f} ms  {[f'{t*1e3:.2f}' for t in ts]}")


if __name__ == "__main__":
    main()

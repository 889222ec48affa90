#!/usr/bin/env python
"""Does TPU row-gather cost depend on (a) operand row count, (b) index
coherence? Decides whether the shade stage's three structural per-pixel
gathers (~15.5 ms/frame at 1080p: one 67 MB shade-table row + two 95 MB
pool block rows) have any headroom left via:

  * column-local compact tables (gather from a ~8 MB slice instead of the
    full table — pays only if per-index cost shrinks with operand bytes),
  * run dedup + monotonic expansion (gather unique rows, then expand by a
    second SORTED-index gather — pays only if sorted gathers are cheaper
    per index than coherent-random ones).

Method: same single-sync device loop as tools/stage_probe.py; every
variant gathers the SAME output volume (n_idx rows x 128 u16 lanes) so
numbers are directly comparable. Interleaved reps; reports per-variant
medians and ns/index.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def device_time(fn, *args, n: int, rpc_s: float) -> float:
    # Consume the FULL output (fold every lane into the accumulator):
    # slicing the result (e.g. out[-64:]) lets XLA fuse the slice into the
    # gather and skip most rows entirely — the first run of this script
    # reported 0.1-0.5 ns/idx fantasy numbers that way.
    acc = jnp.zeros((), jnp.int32)
    np.asarray(acc)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        acc = acc + out
    np.asarray(acc)
    return (time.time() - t0 - rpc_s) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-idx", type=int, default=2_097_152)
    p.add_argument("--rows", type=int, default=262_144)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from vktf_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    rng = np.random.default_rng(0)
    n = args.n_idx
    w = args.width

    # no-op RPC round trip to subtract (stage_probe method). Warm the no-op
    # FIRST: its own compile + first dispatch over the tunnel is tens of
    # seconds, which a cold measurement folds into rpc_s and drives every
    # reported time negative (the first committed run of this script).
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

    # the reduction rides inside the jit so the gather cannot be sliced away
    gather = jax.jit(
        lambda t, i: jnp.sum(t[i].astype(jnp.int32), dtype=jnp.int32))

    variants = {}

    def add(name, rows, idx):
        table = jnp.asarray(
            rng.integers(0, 65536, size=(rows, w), dtype=np.uint16))
        variants[name] = (table, jnp.asarray(idx.astype(np.int32)))

    # (a) operand row-count scaling, random indices
    for rows in (8_192, 32_768, 131_072, 262_144, 1_048_576):
        add(f"rand_r{rows // 1024}k", rows,
            rng.integers(0, rows, size=n))

    # (b) coherence at the production row count
    rows = args.rows
    runs4 = np.repeat(rng.integers(0, rows, size=n // 4), 4)  # tile-ish runs
    add("runs4", rows, runs4)
    add("sorted", rows, np.sort(rng.integers(0, rows, size=n)))
    # monotonic expansion shape: ~600k unique rows expanded to n (the dedup
    # second-stage gather: indices are sorted WITH runs)
    uniq = 600_000
    exp_idx = np.sort(rng.integers(0, uniq, size=n))
    add("expand_600k", uniq, exp_idx)
    add("iota", rows, np.arange(n) % rows)  # pure sequential

    # warm up all compiled forms once
    for name, (table, idx) in variants.items():
        np.asarray(gather(table, idx))

    meds = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, (table, idx) in variants.items():
            dt = device_time(gather, table, idx, n=args.frames, rpc_s=rpc_s)
            meds[name].append(dt * 1e3)
    print(f"n_idx={n} width={w} u16  ({args.reps} interleaved reps, "
          f"{args.frames} frames each; ms and ns/index)")
    for name, ts in meds.items():
        m = float(np.median(ts))
        print(f"  {name:>14}: {m:7.2f} ms  {m * 1e6 / n:6.2f} ns/idx   "
              f"all={['%.2f' % t for t in ts]}")


if __name__ == "__main__":
    main()

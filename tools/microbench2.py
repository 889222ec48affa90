#!/usr/bin/env python
"""Gather width/dtype curve + component-major table build (run on TPU)."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=3, label=""):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:46s} {dt*1e3:9.2f} ms")
    return dt


T = 262_688
N = 2_088_960
key = jax.random.PRNGKey(0)

print("== gather width/dtype curve (N=2M rows) ==")
for width in (8, 16, 32, 64, 128):
    for dt_ in (jnp.float32, jnp.bfloat16):
        tab = jax.random.normal(key, (T, width), dt_)
        idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
        timeit(lambda t, i: t[i], tab, idx,
               label=f"(N,{width}) {dt_.__name__} gather")

print("== gather N scaling (width 64 f32) ==")
tab = jax.random.normal(key, (T, 64), jnp.float32)
for n_idx in (256_000, 1_000_000, 2_000_000, 4_000_000):
    idx = jax.random.randint(key, (n_idx,), 0, T, jnp.int32)
    timeit(lambda t, i: t[i], tab, idx, label=f"N={n_idx} x64 f32")

print("== gather from small table ==")
small = jax.random.normal(key, (2048, 64), jnp.float32)
idx = jax.random.randint(key, (N,), 0, 2048, jnp.int32)
timeit(lambda t, i: t[i], small, idx, label="(N,64) f32 from 2048-row table")

print("== table build: component-major ==")
edge9 = jax.random.normal(key, (9, T), jnp.float32)
corner = jax.random.normal(key, (36, T), jnp.float32)  # 3 corners x 12 attrs
static = jax.random.normal(key, (25, T), jnp.float32)


def build_cm(edge9, corner, static):
    # 36 plane coefficients, each a (T,) elementwise expression
    planes = []
    for k in range(3):           # coefficient index
        for c in range(12):      # attribute channel
            acc = edge9[0 * 3 + k] * corner[0 * 12 + c]
            acc += edge9[1 * 3 + k] * corner[1 * 12 + c]
            acc += edge9[2 * 3 + k] * corner[2 * 12 + c]
            planes.append(acc)
    allcols = jnp.stack(planes + [static[i] for i in range(25)]
                        + [jnp.zeros((T,), jnp.float32)] * 3, axis=0)  # (64,T)
    return allcols.T  # (T,64)


timeit(build_cm, edge9, corner, static, label="component-major stack + T")


def build_cm_notr(edge9, corner, static):
    planes = []
    for k in range(3):
        for c in range(12):
            acc = edge9[0 * 3 + k] * corner[0 * 12 + c]
            acc += edge9[1 * 3 + k] * corner[1 * 12 + c]
            acc += edge9[2 * 3 + k] * corner[2 * 12 + c]
            planes.append(acc)
    return jnp.stack(planes, axis=0)  # (36,T) no transpose


timeit(build_cm_notr, edge9, corner, static, label="component-major stack only")

x = jax.random.normal(key, (64, T), jnp.float32)
timeit(lambda x: x.T, x, label="(64,T) -> (T,64) transpose")
timeit(lambda x: jnp.stack([x[i] for i in range(64)], axis=1),
       x, label="stack axis=1 direct")

print("== unpack/interleave alternative: u8 pool as 4x width ==")
# pre-linearized pool stored bf16: one gather, no unpack, no pow
pool_bf = jax.random.normal(key, (1_000_000, 64), jnp.bfloat16)
idxP = jax.random.randint(key, (N,), 0, 1_000_000, jnp.int32)
timeit(lambda t, i: t[i], pool_bf, idxP, label="(N,64) bf16 pool gather")

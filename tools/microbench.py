#!/usr/bin/env python
"""Microbenchmarks for the frame hot spots (run on TPU)."""
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
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return dt


T = 262_688
V = 180_000
N = 2_088_960  # 1920x1088 pixels
P = 1_000_000  # pool rows

key = jax.random.PRNGKey(0)
edge = jax.random.normal(key, (T, 3, 3), jnp.float32)
vals2 = jax.random.normal(key, (T, 3, 2), jnp.float32)
vals12 = jax.random.normal(key, (T, 3, 12), jnp.float32)
attr2 = jax.random.normal(key, (V, 2), jnp.float32)
indices = jax.random.randint(key, (T, 3), 0, V, jnp.int32)
mat = jax.random.randint(key, (T,), 0, 16, jnp.int32)
mat_table = jax.random.normal(key, (16, 8), jnp.float32)

print("== table build pieces ==")
timeit(lambda e, v: jnp.einsum("tic,tik->tkc", e, v), edge, vals2,
       label="einsum plane C=2")
timeit(lambda e, v: jnp.einsum("tic,tik->tkc", e, v), edge, vals12,
       label="einsum plane C=12 (all attrs)")


def plane_elementwise(e, v):
    # out[t,k,c] = sum_i e[t,i,c_coef=k?]... replicate semantics:
    # einsum("tic,tik->tkc"): out[t,k,c] = sum_i e[t,i,c] * v[t,i,k]
    return sum(e[:, i, :, None] * v[:, i, None, :] for i in range(3))


timeit(plane_elementwise, edge, vals12, label="elementwise plane C=12")
timeit(lambda a, i: a[i], attr2, indices, label="attr[indices] gather (T,3,2)")
timeit(lambda m, t: m[t], mat_table, mat, label="mat_table[mat] gather (T,8)")


def table_setcols(e, v):
    t = e.shape[0]
    cols = jnp.zeros((t, 64), jnp.float32)
    p = jnp.einsum("tic,tik->tkc", e, v).reshape(t, 36)
    cols = cols.at[:, 0:36].set(p)
    cols = cols.at[:, 36:44].set(mat_table[mat])
    return cols


def table_concat(e, v):
    t = e.shape[0]
    p = plane_elementwise(e, v).reshape(t, 36)
    static = mat_table[mat]
    pad = jnp.zeros((t, 64 - 36 - 8), jnp.float32)
    return jnp.concatenate([p, static, pad], axis=1)


timeit(table_setcols, edge, vals12, label="table via .at[].set + einsum")
timeit(table_concat, edge, vals12, label="table via concat + elementwise")

print("== gathers ==")
table64 = jax.random.normal(key, (T, 64), jnp.float32)
idxN = jax.random.randint(key, (N,), 0, T, jnp.int32)
timeit(lambda t, i: t[i], table64, idxN, label=f"(N={N})x64 f32 row gather")
pool12 = jax.random.randint(key, (P, 12), 0, 2**31 - 1, jnp.uint32)
pool48 = jax.random.normal(key, (P, 48), jnp.float32)
idxP = jax.random.randint(key, (N,), 0, P, jnp.int32)
timeit(lambda t, i: t[i], pool12, idxP, label="(N)x12 u32 row gather")
timeit(lambda t, i: t[i], pool48, idxP, label="(N)x48 f32 row gather")
pool48b = pool48.astype(jnp.bfloat16)
timeit(lambda t, i: t[i], pool48b, idxP, label="(N)x48 bf16 row gather")
# locality: sorted indices
idx_sorted = jnp.sort(idxP)
timeit(lambda t, i: t[i], pool48, idx_sorted, label="(N)x48 f32 gather sorted idx")

print("== srgb decode cost ==")
u = jax.random.randint(key, (N,), 0, 2**31 - 1, jnp.uint32)


def decode24(u):
    acc = jnp.zeros((), jnp.float32)
    total = 0.0
    outs = []
    for k in range(24):
        c = ((u >> (k % 4) * 8) & 0xFF).astype(jnp.float32) / 255.0
        outs.append(jnp.where(c <= 0.04045, c / 12.92,
                              jnp.power((c + 0.055) / 1.055, 2.4)))
    return sum(outs)


timeit(decode24, u, label="24x srgb pow decode per elem (N)")


def unpack36(u):
    outs = []
    for k in range(36):
        outs.append(((u >> (k % 4) * 8) & 0xFF).astype(jnp.float32) / 255.0)
    return sum(outs)


timeit(unpack36, u, label="36x u8 unpack per elem (N)")

print("== pow vs polynomial ==")
x = jax.random.uniform(key, (N,), jnp.float32)
timeit(lambda x: sum(jnp.power(x + k * 0.01, 2.4) for k in range(8)),
       x, label="8x pow(x,2.4) (N)")
timeit(lambda x: sum(jnp.exp2(2.4 * jnp.log2(x + k * 0.01)) for k in range(8)),
       x, label="8x exp2/log2 (N)")

#!/usr/bin/env python
"""Re-run key microbenches with trustworthy host-sync timing."""
from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from tbench import timeit, roundtrip_ms

T = 262_688
N = 2_088_960
key = jax.random.PRNGKey(0)

print(f"roundtrip {roundtrip_ms():.2f} ms", flush=True)

print("== sanity: known-cost ops ==")
big = jax.random.normal(key, (1024, 256, 1024), jnp.float32)  # 1GB
timeit(lambda x: x * 2.0, big, label="1GB f32 elementwise x2 (expect ~2.5ms)")
a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
timeit(lambda a: a @ a, a, label="4096^3 bf16 matmul (expect ~0.7ms)")

print("== gather curve ==")
for width in (8, 16, 32, 64, 128):
    for dt_ in (jnp.float32, jnp.bfloat16):
        tab = jax.random.normal(key, (T, width), dt_)
        idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
        timeit(lambda t, i: t[i], tab, idx,
               label=f"(2M,{width}) {dt_.__name__} gather")

tab = jax.random.normal(key, (2048, 64), jnp.float32)
idx = jax.random.randint(key, (N,), 0, 2048, jnp.int32)
timeit(lambda t, i: t[i], tab, idx, label="(2M,64) f32 small-table gather")

pool12 = jax.random.randint(key, (1_000_000, 12), 0, 2**31 - 1, jnp.uint32)
idxP = jax.random.randint(key, (N,), 0, 1_000_000, jnp.int32)
timeit(lambda t, i: t[i], pool12, idxP, label="(2M,12) u32 pool gather")
pool48b = jax.random.normal(key, (1_000_000, 48), jnp.bfloat16)
timeit(lambda t, i: t[i], pool48b, idxP, label="(2M,48) bf16 pool gather")

print("== table build ==")
edge9 = jax.random.normal(key, (9, T), jnp.float32)
corner = jax.random.normal(key, (36, T), jnp.float32)
static = jax.random.normal(key, (25, T), jnp.float32)


def build_cm(edge9, corner, static):
    planes = []
    for k in range(3):
        for c in range(12):
            acc = edge9[0 * 3 + k] * corner[0 * 12 + c]
            acc += edge9[1 * 3 + k] * corner[1 * 12 + c]
            acc += edge9[2 * 3 + k] * corner[2 * 12 + c]
            planes.append(acc)
    allcols = jnp.stack(planes + [static[i] for i in range(25)]
                        + [jnp.zeros((T,), jnp.float32)] * 3, axis=0)
    return allcols.T


timeit(build_cm, edge9, corner, static, label="component-major build (T,64)")

print("== srgb ==")
u = jax.random.uniform(key, (N,), jnp.float32)
timeit(lambda x: sum(jnp.power(x + k * 0.01, 2.4) for k in range(24)),
       u, label="24x pow(x,2.4) (2M)")
uu = jax.random.randint(key, (N,), 0, 2**31 - 1, jnp.uint32)
timeit(lambda u: sum((((u >> ((k % 4) * 8)) & 0xFF).astype(jnp.float32)
                      for k in range(36)), jnp.zeros((), jnp.float32)),
       uu, label="36x u8 unpack (2M)")

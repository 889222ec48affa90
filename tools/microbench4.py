#!/usr/bin/env python
"""Gather-layout candidates for the quad-pool repack + sRGB arithmetic cost.

Decides the ops/texture_pack storage format: current (P,12) u32 rows vs
pre-linearized u16 candidates at pow2 widths, plus the cost of the pow()
chains the repack would delete from ops/shade_table.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from tbench import timeit, roundtrip_ms

N = 2_088_960  # 1080p pixel count (padded)
P = 4_000_000  # pool rows
key = jax.random.PRNGKey(0)

print(f"roundtrip {roundtrip_ms():.2f} ms", flush=True)

idx = jax.random.randint(key, (N,), 0, P, jnp.int32)

pool12 = jax.random.randint(key, (P, 12), 0, 2**31 - 1, jnp.uint32)
timeit(lambda t, i: t[i], pool12, idx, label="(2M,12) u32 pool gather (current, x2/frame)")

pool16 = jax.random.randint(key, (P, 16), 0, 2**31 - 1, jnp.uint32)
timeit(lambda t, i: t[i], pool16, idx, label="(2M,16) u32 pool gather")

for w in (32, 48, 64):
    pu16 = jax.random.randint(key, (P, w), 0, 2**16 - 1, jnp.uint16)
    timeit(lambda t, i: t[i], pu16, idx, label=f"(2M,{w}) u16 pool gather")

pbf = jax.random.normal(key, (P, 64), jnp.bfloat16)
timeit(lambda t, i: t[i], pbf, idx, label="(2M,64) bf16 pool gather")

# the arithmetic the repack deletes: 24 pow() per pixel (sRGB decode of the
# base quad, 3 chans x 4 taps x 2 mips)
c = jax.random.uniform(key, (24, N), jnp.float32)


def srgb24(c):
    return sum(
        jnp.where(c[i] <= 0.04045, c[i] / 12.92,
                  jnp.power((c[i] + 0.055) / 1.055, 2.4))
        for i in range(24)
    )


timeit(srgb24, c, label="24x sRGB pow decode @2M px (deleted by repack)")

# u8->f32 unpack arithmetic per quad row (shifts+masks+scales), 36 channels
q = jax.random.randint(key, (12, N), 0, 2**31 - 1, jnp.uint32)


def unpack36(q):
    acc = jnp.zeros((N,), jnp.float32)
    for i in range(12):
        for shift in (0, 8, 16):
            acc += ((q[i] >> shift) & 0xFF).astype(jnp.float32) / 255.0
    return acc


timeit(unpack36, q, label="36-chan u8 unpack @2M px (current)")

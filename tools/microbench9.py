#!/usr/bin/env python
"""Split the fold_window cost (rolls vs selects) and try cheaper layouts.

microbench8 V2 showed the post-gather window fold (2 lane-rolls + 2 row
selects per mip row on (N,128) u16) costs ~14 ms of the ~74 ms shade stage
at 2^21 samples. Variants here isolate roll vs select and test a u32
bitcast view. Run on the chip.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
from tbench import timeit, roundtrip_ms

print(f"roundtrip {roundtrip_ms():.1f} ms", flush=True)
g = jnp.zeros((4096, 4096), jnp.bfloat16)
timeit(lambda a: a @ a, g, label="gauge: 4096^3 bf16 matmul (~0.7ms clean)")

N = 1 << 21
ROWS = 384 * 1024
key = jax.random.PRNGKey(0)
pool = jax.random.randint(key, (ROWS, 128), 0, 1 << 16, jnp.int32).astype(jnp.uint16)
idx = jax.random.randint(key, (N,), 0, ROWS, jnp.int32)
cx = jax.random.randint(key, (N,), 0, 2, jnp.int32)
cy = jax.random.randint(key, (N,), 0, 2, jnp.int32)

CHUNK = 1 << 19


def chunked(fn):
    def run(idx, cx, cy):
        def one(args):
            i, x, y = args
            q = pool[i]  # (CHUNK, 128) u16 gather
            out = fn(q, x, y)
            # consume a few lanes so nothing is DCE'd whole
            return sum(out[:, k].astype(jnp.float32) for k in (0, 2, 8, 10, 33, 41))
        return jax.lax.map(
            one, (idx.reshape(-1, CHUNK), cx.reshape(-1, CHUNK),
                  cy.reshape(-1, CHUNK)))
    return run


def fold_full(q, x, y):
    qx = jnp.where((x == 1)[:, None], jnp.roll(q, -2, axis=1), q)
    return jnp.where((y == 1)[:, None], jnp.roll(qx, -8, axis=1), qx)


def fold_none(q, x, y):
    return q


def fold_rolls_only(q, x, y):
    # rolls materialize, selects replaced by cheap add (forces both arms)
    return jnp.roll(q, -2, axis=1) + jnp.roll(q, -8, axis=1)


def fold_select_only(q, x, y):
    # selects without rolls (second arm = q shifted via static slice+pad)
    qx = jnp.where((x == 1)[:, None], q, q)
    return jnp.where((y == 1)[:, None], qx, qx)


def fold_u32(q, x, y):
    q32 = jax.lax.bitcast_convert_type(
        q.reshape(q.shape[0], 64, 2), jnp.uint32
    )  # (CHUNK, 64)
    qx = jnp.where((x == 1)[:, None], jnp.roll(q32, -1, axis=1), q32)
    qy = jnp.where((y == 1)[:, None], jnp.roll(qx, -4, axis=1), qx)
    # unpack halves back: lane k half h = (qy[:, k] >> (16*h)) & 0xffff —
    # consumers read halves, so return a u16-lane view accessor shim
    lo = (qy & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    hi = (qy >> jnp.uint32(16)).astype(jnp.uint16)
    return jnp.stack([lo, hi], axis=-1).reshape(q.shape[0], 128)


def fold_u32_lanes(q, x, y):
    # u32 fold but WITHOUT re-expanding to u16 lanes (consumers would read
    # u32 lanes and unpack per tap) — measures the fold cost alone
    q32 = jax.lax.bitcast_convert_type(
        q.reshape(q.shape[0], 64, 2), jnp.uint32
    )
    qx = jnp.where((x == 1)[:, None], jnp.roll(q32, -1, axis=1), q32)
    qy = jnp.where((y == 1)[:, None], jnp.roll(qx, -4, axis=1), qx)
    return qy


for name, fn in [
    ("gather only (no fold)", fold_none),
    ("full fold (2 rolls + 2 selects, u16x128)", fold_full),
    ("rolls only (u16x128)", fold_rolls_only),
    ("selects only (u16x128)", fold_select_only),
    ("u32 bitcast fold + u16 re-expand", fold_u32),
    ("u32 bitcast fold, u32 lanes out", fold_u32_lanes),
]:
    timeit(chunked(fn), idx, cx, cy, n=6, label=name)

timeit(lambda a: a @ a, g, label="gauge again")

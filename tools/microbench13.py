#!/usr/bin/env python
"""Gather DTYPE tricks at the deferred-shade shapes.

The shade stage's residual is ~36 ms of row gathers (1 table + 2 pool rows
per pixel). microbench5/6 established row-count and width effects; commit
985d87e measured u16 gathers 6x faster than u32 for the SAME bytes. This
bench asks: does reinterpreting the same bits as bf16 / f16 / i8 / u8 change
the gather speed at the exact production shapes, and is the round-trip
bit-exact (it must be: the u16 halves are f32 bit patterns, so any NaN
canonicalization poisons the table)?

Shapes: table (262k, 128) u16; pool (393k, 128) u16; 2.07M random indices.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from tbench import timeit, roundtrip_ms

N_IDX = 2076672 // 1024 * 1024  # 1088*1920 padded 1080p pixel count


def main():
    print(f"platform={jax.devices()[0].platform} roundtrip={roundtrip_ms():.1f} ms",
          flush=True)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)

    for rows, name in ((262144, "table"), (393216, "pool")):
        base = jax.random.randint(k1, (rows, 64), 0, 2**31 - 1,
                                  jnp.int32).astype(jnp.uint32)
        u16 = jax.lax.bitcast_convert_type(base, jnp.uint16).reshape(rows, 128)
        idx = jax.random.randint(k2, (N_IDX,), 0, rows, jnp.int32)

        def g(t, i):
            return t[i]

        @jax.jit
        def check(t, i):
            # on-device bit-exactness vs the u16 gather (no 500 MB transfers)
            got = t[i]
            nbytes = got.dtype.itemsize
            if nbytes == 2:
                g2 = got.reshape(N_IDX, 128, 1)
            elif nbytes == 1:
                g2 = got.reshape(N_IDX, 128, 2)
            else:  # 4-byte
                g2 = got.reshape(N_IDX, 64, 1)
            gotu = jax.lax.bitcast_convert_type(g2, jnp.uint16)
            return jnp.all(gotu.reshape(N_IDX, 128) == u16[i])

        variants = {
            "u16 (r,128)": u16,
            "bf16 (r,128)": jax.lax.bitcast_convert_type(
                u16.reshape(rows, 128, 1), jnp.bfloat16).reshape(rows, 128),
            "f16 (r,128)": jax.lax.bitcast_convert_type(
                u16.reshape(rows, 128, 1), jnp.float16).reshape(rows, 128),
            "i8 (r,256)": jax.lax.bitcast_convert_type(
                u16.reshape(rows, 128, 1), jnp.int8).reshape(rows, 256),
            "u8 (r,256)": jax.lax.bitcast_convert_type(
                u16.reshape(rows, 128, 1), jnp.uint8).reshape(rows, 256),
            "u32 (r,64)": base,
            "f32 (r,64)": jax.lax.bitcast_convert_type(
                base.reshape(rows, 64, 1), jnp.float32).reshape(rows, 64),
        }
        for label, tab in variants.items():
            tab = jax.device_put(tab)
            ok = bool(np.asarray(check(tab, idx)))
            ms = timeit(g, tab, idx, n=10, warmup=2) * 1e3
            print(f"{name} {label:14s} {ms:8.2f} ms  bitexact={ok}", flush=True)

    # do independent gathers in one program overlap?
    rows_t, rows_p = 262144, 393216
    tab = jax.random.randint(k1, (rows_t, 128), 0, 2**16 - 1,
                             jnp.int32).astype(jnp.uint16)
    pool = jax.random.randint(k1, (rows_p, 128), 0, 2**16 - 1,
                              jnp.int32).astype(jnp.uint16)
    it = jax.random.randint(k2, (N_IDX,), 0, rows_t, jnp.int32)
    ip0 = jax.random.randint(k2, (N_IDX,), 0, rows_p, jnp.int32)
    ip1 = jax.random.randint(jax.random.PRNGKey(9), (N_IDX,), 0, rows_p,
                             jnp.int32)

    timeit(lambda t, i: t[i], tab, it, n=10, warmup=2, label="table alone")
    timeit(lambda p, i: p[i], pool, ip0, n=10, warmup=2, label="pool alone")
    timeit(lambda t, p, i0, i1, i2: (t[i0], p[i1], p[i2]),
           tab, pool, it, ip0, ip1, n=10, warmup=2,
           label="all three in one jit")


if __name__ == "__main__":
    main()

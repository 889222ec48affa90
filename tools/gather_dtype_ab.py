#!/usr/bin/env python
"""Row-gather dtype A/B at the shade stages' shapes (run on TPU).

shade_addr gathers (2.1M idx) x (262k, 128) u16 table rows; shade_final
gathers 2x (2.1M idx) x (393k, 128) u16 pool rows. The round-1 memory notes
claim bf16 gathers measured ~2x faster than u16 at pow2 widths — same
bytes, so suspicious; if true, viewing the tables as bf16 (bit reinterpret)
is a free ~8 ms/frame. Interleaved one-sync timing.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N = 1 << 21


def bench(rows, width, reps=3, n=8):
    key = jax.random.PRNGKey(0)
    data_u16 = jax.random.randint(key, (rows, width), 0, 1 << 16,
                                  jnp.int32).astype(jnp.uint16)
    data_bf16 = jax.lax.bitcast_convert_type(data_u16, jnp.bfloat16)
    data_i8 = jax.random.randint(key, (rows, 2 * width), 0, 127,
                                 jnp.int32).astype(jnp.int8)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, rows, jnp.int32)

    fns = {
        "u16": jax.jit(lambda d, i: d[i].sum(dtype=jnp.int32)),
        "bf16": jax.jit(lambda d, i: d[i].astype(jnp.float32).sum()),
        "u16T": jax.jit(lambda d, i: d[i].T.sum(dtype=jnp.int32)),
        "bf16T": jax.jit(lambda d, i: d[i].T.astype(jnp.float32).sum()),
        "i8x2": jax.jit(lambda d, i: d[i].sum(dtype=jnp.int32)),
    }
    datas = {"u16": data_u16, "bf16": data_bf16, "u16T": data_u16,
             "bf16T": data_bf16, "i8x2": data_i8}
    for k, f in fns.items():
        np.asarray(f(datas[k], idx))  # compile

    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4

    out = {}
    for rep in range(reps):
        for k, f in fns.items():
            acc = jnp.zeros((), jnp.float32)
            np.asarray(acc)
            t0 = time.time()
            for _ in range(n):
                acc = acc + f(datas[k], idx).astype(jnp.float32)
            np.asarray(acc)
            dt = (time.time() - t0 - rpc_s) / n * 1e3
            out.setdefault(k, []).append(dt)
            print(f"rows={rows} rep{rep} {k:6s} {dt:7.2f} ms", flush=True)
    print({k: round(min(v), 2) for k, v in out.items()}, flush=True)


for rows in (262144, 393216):
    bench(rows, 128)

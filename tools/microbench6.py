#!/usr/bin/env python
"""Map the gather row-count cliff found by microbench5.

(262k,128)u16 gathers at 3.4 ms / 2M idx; (1M,128)u16 at 24.6 ms; the quad
pool (1.5M,12)u32 at 13 ms. Cost tracks ROW COUNT, not table bytes. This
locates the cliff and tests index-coherence / sortedness / chunking effects
at pool shape, which decides how to restructure the pool (or its access) to
get the deferred shade under the gather floor.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from tbench import timeit, roundtrip_ms

N_IDX = 2 * 1024 * 1024


def g_ms(label, table, idx, sorted_hint=False):
    if sorted_hint:
        def f(t, i):
            g = jnp.take(t, i, axis=0, indices_are_sorted=True)
            return jnp.sum(g[:, :1].astype(jnp.float32))
    else:
        def f(t, i):
            return jnp.sum(t[i][:, :1].astype(jnp.float32))
    return timeit(f, table, idx, n=10, warmup=2, label=label) * 1e3


def main():
    print(f"platform={jax.devices()[0].platform} roundtrip={roundtrip_ms():.1f} ms",
          flush=True)
    key = jax.random.PRNGKey(1)

    print("--- row-count sweep, u16(N,128), 2M random idx ---")
    for rows in (262144, 393216, 524288, 655360, 786432, 1048576):
        t = jax.random.randint(key, (rows, 64), 0, 2**31 - 1,
                               jnp.int32).astype(jnp.uint32)
        t = jax.lax.bitcast_convert_type(t, jnp.uint16).reshape(rows, 128)
        i = jax.random.randint(key, (N_IDX,), 0, rows, jnp.int32)
        g_ms(f"u16 ({rows//1024}k,128) rand", t, i)

    print("--- pool shape u32(N,16), random vs coherent vs sorted ---")
    for rows in (524288, 786432, 1048576, 1572864):
        t = jax.random.randint(key, (rows, 16), 0, 2**31 - 1,
                               jnp.int32).astype(jnp.uint32)
        i_rand = jax.random.randint(key, (N_IDX,), 0, rows, jnp.int32)
        # coherent: 64-pixel runs hitting a 256-row window (one triangle's
        # texture footprint), windows random
        starts = jax.random.randint(key, (N_IDX // 64,), 0, rows - 256, jnp.int32)
        jitter = jax.random.randint(key, (N_IDX,), 0, 256, jnp.int32)
        i_coh = jnp.repeat(starts, 64) + jitter
        i_sort = jnp.sort(i_rand)
        g_ms(f"u32 ({rows//1024}k,16) rand", t, i_rand)
        g_ms(f"u32 ({rows//1024}k,16) coherent", t, i_coh)
        g_ms(f"u32 ({rows//1024}k,16) sorted", t, i_sort)
        g_ms(f"u32 ({rows//1024}k,16) sorted+hint", t, i_sort, sorted_hint=True)

    print("--- chunked gather (lax.map 512k chunks), pool 1.5M u32x16 ---")
    rows = 1572864
    t = jax.random.randint(key, (rows, 16), 0, 2**31 - 1,
                           jnp.int32).astype(jnp.uint32)
    i = jax.random.randint(key, (N_IDX,), 0, rows, jnp.int32)

    def chunked(t, i):
        ic = i.reshape(4, N_IDX // 4)
        out = jax.lax.map(lambda ix: jnp.sum(t[ix][:, :1].astype(jnp.float32)), ic)
        return jnp.sum(out)

    dt = timeit(chunked, t, i, n=10, warmup=2, label="lax.map 4x512k chunks")

    print("--- two sub-pool gathers (each < cliff) vs one big ---")
    half = rows // 2
    t0, t1 = t[:half], t[half:]

    def split2(t0, t1, i):
        lo = jnp.minimum(i, half - 1)
        hi = jnp.maximum(i - half, 0)
        a = t0[lo][:, :1].astype(jnp.float32)
        b = t1[hi][:, :1].astype(jnp.float32)
        pick = (i < half)[:, None]
        return jnp.sum(jnp.where(pick, a, b))

    timeit(split2, t0, t1, i, n=10, warmup=2, label="2x 786k-row gathers + select")

    third = rows // 3 + 1

    def split3(t, i):
        parts = []
        for k in range(3):
            tk = t[k * third:(k + 1) * third]
            ik = jnp.clip(i - k * third, 0, tk.shape[0] - 1)
            parts.append((tk[ik][:, :1].astype(jnp.float32),
                          (i >= k * third) & (i < (k + 1) * third)))
        acc = jnp.zeros_like(parts[0][0])
        for v, m in parts:
            acc = jnp.where(m[:, None], v, acc)
        return jnp.sum(acc)

    timeit(split3, t, i, n=10, warmup=2, label="3x 524k-row gathers + select")


if __name__ == "__main__":
    main()

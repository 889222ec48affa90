#!/usr/bin/env python
"""Round-2 gather attack microbench: can the per-index gather cost drop?

The deferred shade pays 3 row gathers/pixel (~42 ms at 2.07M px): one
(262k, 128)u16 shade-table row + two (1.5M, 12)u32 quad-pool rows. Round-1
measured ~6-7 ns/index "nearly width-independent" for u16/u32 — but the
README's own numbers show (2M,128)u16 ~10-12 ms vs bf16 ~5 ms, i.e. the
GATHER DTYPE may matter independently of the bit layout. If a bitcast view
(same bits, different dtype) gathers 2x faster, the shade floor halves for
free. This sweeps dtype views x table sizes x index distributions on the
live chip.

Run:  python tools/microbench5.py
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from tbench import timeit, roundtrip_ms

N_IDX = 2 * 1024 * 1024  # ~1080p padded pixel count


def rows_ms(label, table, idx):
    def f(t, i):
        g = t[i]
        # fold to small output so transfer is negligible; keep dependence
        return jnp.sum(g[:, :1].astype(jnp.float32))

    dt = timeit(f, table, idx, n=10, warmup=2, label=label)
    return dt * 1e3


def main():
    print(f"platform={jax.devices()[0].platform} roundtrip={roundtrip_ms():.1f} ms",
          flush=True)
    key = jax.random.PRNGKey(0)

    # ---- shade-table shape: 262k rows x 256 bytes --------------------------
    t_rows = 262688
    base_u32 = jax.random.randint(key, (t_rows, 64), 0, 2**31 - 1, jnp.int32)
    base_u32 = base_u32.astype(jnp.uint32)
    tbl_u16 = jax.lax.bitcast_convert_type(base_u32, jnp.uint16).reshape(t_rows, 128)
    tbl_bf16 = jax.lax.bitcast_convert_type(tbl_u16, jnp.bfloat16)
    tbl_f32 = jax.lax.bitcast_convert_type(base_u32, jnp.float32)
    tbl_u8 = jax.lax.bitcast_convert_type(tbl_u16, jnp.uint8).reshape(t_rows, 256)
    tbl_i8 = tbl_u8.astype(jnp.int8)

    # screen-coherent indices (what shading actually sees): sorted-ish runs
    ki, key = jax.random.split(key)
    idx_rand = jax.random.randint(ki, (N_IDX,), 0, t_rows, jnp.int32)
    # coherent: blocks of 64 pixels hitting runs of ~8 nearby rows
    runs = jax.random.randint(ki, (N_IDX // 64,), 0, t_rows - 64, jnp.int32)
    idx_coh = (jnp.repeat(runs, 64) + jnp.tile(jnp.arange(64, dtype=jnp.int32) // 8,
                                               (N_IDX // 64,)))

    print("--- shade-table shape (262k rows x 256B), 2M random indices ---")
    rows_ms("u16 (262k,128)  [current]", tbl_u16, idx_rand)
    rows_ms("bf16 (262k,128) bitcast view", tbl_bf16, idx_rand)
    rows_ms("f32 (262k,64)", tbl_f32, idx_rand)
    rows_ms("u32 (262k,64)", base_u32, idx_rand)
    rows_ms("u8  (262k,256) bitcast view", tbl_u8, idx_rand)
    rows_ms("i8  (262k,256)", tbl_i8, idx_rand)
    print("--- same, screen-coherent indices ---")
    rows_ms("u16 coherent", tbl_u16, idx_coh)
    rows_ms("bf16 coherent", tbl_bf16, idx_coh)
    rows_ms("i8 coherent", tbl_i8, idx_coh)

    # ---- does table size change per-index cost? ----------------------------
    print("--- table-size sweep, u16(*,128), 2M random indices ---")
    for rows in (4096, 32768, 262688, 1048576):
        t = tbl_u16[:rows] if rows <= t_rows else jnp.tile(tbl_u16, (4, 1))[:rows]
        i = jax.random.randint(ki, (N_IDX,), 0, rows, jnp.int32)
        rows_ms(f"u16 ({rows},128)", t, i)

    # ---- quad-pool shape: 1.5M x 12 u32 ------------------------------------
    p_rows = 1536 * 1024
    kp, key = jax.random.split(key)
    pool_u32 = jax.random.randint(kp, (p_rows, 12), 0, 2**31 - 1,
                                  jnp.int32).astype(jnp.uint32)
    pool_u16 = jax.lax.bitcast_convert_type(pool_u32, jnp.uint16).reshape(p_rows, 24)
    pool_bf16 = jax.lax.bitcast_convert_type(pool_u16, jnp.bfloat16)
    pool_u8 = jax.lax.bitcast_convert_type(pool_u32, jnp.uint8).reshape(p_rows, 48)
    pool_i8 = pool_u8.astype(jnp.int8)
    pool_u32_16 = jnp.pad(pool_u32, ((0, 0), (0, 4)))  # (1.5M, 16) u32
    idx_pool = jax.random.randint(kp, (N_IDX,), 0, p_rows, jnp.int32)

    print("--- quad-pool shape (1.5M rows x 48B), 2M random indices ---")
    rows_ms("u32 (1.5M,12)  [current]", pool_u32, idx_pool)
    rows_ms("u32 (1.5M,16) padded", pool_u32_16, idx_pool)
    rows_ms("u16 (1.5M,24) bitcast view", pool_u16, idx_pool)
    rows_ms("bf16 (1.5M,24) bitcast view", pool_bf16, idx_pool)
    rows_ms("u8  (1.5M,48) bitcast view", pool_u8, idx_pool)
    rows_ms("i8  (1.5M,48)", pool_i8, idx_pool)

    # ---- two half-size gathers vs one (gather-unit parallelism?) -----------
    print("--- split-gather test, u16(262k,128) ---")
    h = N_IDX // 2

    def two(t, i):
        a = t[i[:h]]
        b = t[i[h:]]
        return jnp.sum(a[:, :1].astype(jnp.float32)) + jnp.sum(
            b[:, :1].astype(jnp.float32))

    dt = timeit(two, tbl_u16, idx_rand, n=10, warmup=2,
                label="2x 1M-index gathers (same total)")


if __name__ == "__main__":
    main()

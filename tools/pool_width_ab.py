#!/usr/bin/env python
"""A/B: gathered-row WIDTH vs the gather+transpose cost (dead-lane trim).

Production carries dead lanes through both phase boundaries: the texel pool
uses 96 of 128 u16 lanes (4x4 block = 48 u32; texture_pack.ROW_U32 pads to
64), and the shade table uses 112 of 128 (56 live f32 columns as hi/lo
halves). gather_dtype_ab measured the raw gather ~width-independent, but
production FUSES a transpose into the gather (lane-major kernel input), so
the transposed WRITE and the kernel's read scale with width. This measures
the full gather+transpose(+reshape) program at production shapes:

  pool:  (400k, 128) vs (400k, 96) u16, 2.07M indices -> (W, nb, 128)
  table: (263k, 128) vs (263k, 112) u16, 2.07M indices -> (W, N)

REVERSED at 4K: the 96-lane (non-128-multiple) pool operand drops off
XLA's efficient gather path at 4K gather volume — production shade_final
219 vs 64 ms (bit-equal; tools/pool_width4k_ab.py), while the 1080p
production A/B is a wash (13.5 vs 13.7 ms). The pool stores 128 lanes
again; rule: gather-operand minor dims stay multiples of 128.

    python tools/pool_width_ab.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 2_073_600  # 1920*1080
    nb = -(-n // 128)
    n_pad = nb * 128

    pool_rows, table_rows = 400_000, 263_000
    idx_pool = jnp.asarray(rng.integers(0, pool_rows, n), jnp.int32)
    idx_table = jnp.asarray(rng.integers(0, table_rows, n), jnp.int32)

    pools = {
        w: jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 16, (pool_rows, w)), jnp.uint16))
        for w in (128, 96)
    }
    tables = {
        w: jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 16, (table_rows, w)), jnp.uint16))
        for w in (128, 112)
    }

    def pool_fn(pool, idx):
        w = pool.shape[1]
        q = pool[idx]  # (n, w)
        q = jnp.pad(q, ((0, n_pad - n), (0, 0)))
        return q.T.reshape(w, nb, 128)  # production q0b layout

    def table_fn(table, idx):
        return table[idx].T  # production colsT layout

    jf_pool = jax.jit(pool_fn)
    jf_table = jax.jit(table_fn)

    def device_time(fn, *fargs, reps=12):
        acc = jnp.zeros((), jnp.float32)

        def probe(a):
            v = fn(*fargs)
            return a + jnp.sum(v.ravel()[-64:].astype(jnp.float32))

        acc = probe(acc)
        np.asarray(acc)
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = probe(acc)
        np.asarray(acc)
        return (time.perf_counter() - t0) / reps * 1000.0

    cases = [
        ("pool 128", jf_pool, pools[128], idx_pool),
        ("pool  96", jf_pool, pools[96], idx_pool),
        ("table 128", jf_table, tables[128], idx_table),
        ("table 112", jf_table, tables[112], idx_table),
    ]
    results = {name: [] for name, *_ in cases}
    for rep in range(5):
        for name, fn, arr, idx in cases:
            ms = device_time(fn, arr, idx)
            results[name].append(ms)
            print(f"rep{rep} {name:10s} {ms:6.2f} ms", flush=True)
    print("\nmedians:")
    for name in results:
        print(f"  {name:10s} {np.median(results[name]):6.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

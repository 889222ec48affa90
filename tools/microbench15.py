#!/usr/bin/env python
"""Where does shade phase B's time go: pool gathers vs host transposes.

Times on real-scale data (393k-row u16 pool, 2M sample rows):
  g      : one (2M,128)u16 row gather from the 393k-row pool
  t      : the (2M,128) -> (128, nb, 128) transpose+reshape alone
  gt     : gather + transpose (what shade_final pays per mip level)
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vktf_tpu.ops.shade_table import gather_rows

P, N = 393216, 1 << 21
NB = N // 128
rng = np.random.default_rng(0)
pool = jnp.asarray(rng.integers(0, 2**16, (P, 128), dtype=np.uint16))
idx = jnp.asarray(rng.integers(0, P, (N,), dtype=np.int32))
q = jnp.asarray(rng.integers(0, 2**16, (N, 128), dtype=np.uint16))


def g(pool, idx):
    return gather_rows(pool, idx)


def t(q):
    return q.T.reshape(128, NB, 128)


def gt(pool, idx):
    return gather_rows(pool, idx).T.reshape(128, NB, 128)


fns = {"g": (jax.jit(g), (pool, idx)),
       "t": (jax.jit(t), (q,)),
       "gt": (jax.jit(gt), (pool, idx))}


def block(x):
    np.asarray(x.ravel()[-8:])


for f, a in fns.values():
    block(f(*a))

rows = {k: [] for k in fns}
for r in range(8):
    for k, (f, a) in fns.items():
        t0 = time.perf_counter()
        for _ in range(6):
            out = f(*a)
        block(out)
        rows[k].append((time.perf_counter() - t0) / 6 * 1e3)
for k, v in rows.items():
    print(f"{k:4s} min={min(v):7.2f} med={np.median(v):7.2f} "
          f"all={[round(x, 1) for x in v]}")

#!/usr/bin/env python
"""Isolate the phase-A cost delta of the component-major shade boundary.

Times, on real-scale data (262k-row table, 2M sample indices):
  g     : the u16 row gather alone (old phase A's bulk)
  gc    : gather + f32 combine (hi<<16|lo bitcast), row-major out
  gct   : gather + combine + (N,ROW)->(ROW,N) transpose (new phase A)
  gct_b : gather + combine + transpose + reshape to (ROW, nb, 128)
Interleaved reps; report min/median.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vktf_tpu.ops.shade_table import ROW, gather_rows

T, N = 262688, 1 << 21
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 2**16, (T, 2 * ROW), dtype=np.uint16))
idx = jnp.asarray(rng.integers(0, T, (N,), dtype=np.int32))


def g(table, idx):
    return gather_rows(table, idx)


def gc(table, idx):
    trow = gather_rows(table, idx)
    hi = trow[:, :ROW].astype(jnp.uint32) << 16
    lo = trow[:, ROW:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


def gct(table, idx):
    return gc(table, idx).T


def gct_b(table, idx):
    return gc(table, idx).T.reshape(ROW, N // 128, 128)


fns = {k: jax.jit(v) for k, v in
       dict(g=g, gc=gc, gct=gct, gct_b=gct_b).items()}


def block(x):
    np.asarray(x.ravel()[-8:])


for f in fns.values():
    block(f(table, idx))

rows = {k: [] for k in fns}
for r in range(8):
    for k, f in fns.items():
        t0 = time.perf_counter()
        for _ in range(6):
            out = f(table, idx)
        block(out)
        rows[k].append((time.perf_counter() - t0) / 6 * 1e3)
for k, v in rows.items():
    print(f"{k:6s} min={min(v):7.2f} med={np.median(v):7.2f} "
          f"all={[round(x, 1) for x in v]}")

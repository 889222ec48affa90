#!/usr/bin/env python
"""Is the ~5.5 ms raster-skeleton floor a per-CONTIGUOUS-OUTPUT-PIECE cost?

Every measured cell so far (tools/init_copy_probe.py, the msaa tail of
prepare_kernel_ab.py) held the contiguous-piece count ~constant:
  - column mode: 15 programs x (bands=34,1,rows,tw) strided blocks
    = 34 pieces/program/ref -> 15*34*2 = 1020 pieces -> 5.26 ms
  - flat mode: 510 programs x (1,rows,tw) contiguous blocks
    = 510*1*2 = 1020 pieces -> 5.64 ms
  - msaa 1 vs 4 changes piece SIZE 4x, not count -> equal times
All consistent with ~5.4 us per contiguous HBM output piece, and all
UNABLE to distinguish per-piece from "intrinsic grid machinery". This
probe adds the missing cell: the SAME init work emitted as ONE contiguous
(1, bands*rows, tw) block per program (15 programs -> 30 pieces total).

Cells (identical init semantics, synthetic kernels, no visit loop):
  strided34   out (34,15,rows,tw), grid 15, block (34,1,rows,tw)
              [production column-mode copy shape: 34 strided pieces/ref]
  flat_col    out (15,34*rows,tw), grid 15, block (1,34*rows,tw)
              [ONE contiguous 4.45 MB piece per program per ref]
  flat510     out (510,rows,tw), grid 510, block (1,rows,tw)
              [validates the synthetic probe against init_flat's 5.64]
  xla_ref     jnp.full of the same 67 MB (HBM write-bandwidth anchor)

If flat_col collapses toward the bandwidth bound while strided34/flat510
stay ~5.5 ms, the floor is per-piece copy cost and the x-major contiguous
output redesign of raster_pallas is GO.

    python tools/copyout_layout_probe.py > /tmp/copyout_probe.log 2>&1
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vktf_tpu.runtime.cache import enable_persistent_cache

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
else:
    enable_persistent_cache()

TILES_Y, TILES_X = 34, 15
ROWS, TW = 128, 128  # 4x MSAA, (32,128) tiles
WIN = 32
BG = -1


def _init_body(id_ref, depth_ref, *, bands, flat):
    """Exactly init_rows from raster_pallas._raster_kernel: fori_loop of
    (WIN, TW) window stores, WIN-aligned dynamic slices."""
    def init_rows(r, _):
        bg = jnp.full((WIN, TW), BG, jnp.int32)
        one = jnp.ones((WIN, TW), jnp.float32)
        if flat:
            id_ref[0, pl.ds(r * WIN, WIN)] = bg
            depth_ref[0, pl.ds(r * WIN, WIN)] = one
        else:
            b = r // (ROWS // WIN)
            rr = r % (ROWS // WIN)
            id_ref[b, 0, pl.ds(rr * WIN, WIN)] = bg
            depth_ref[b, 0, pl.ds(rr * WIN, WIN)] = one
        return 0

    jax.lax.fori_loop(0, bands * (ROWS // WIN), init_rows, 0, unroll=False)


def k_strided(id_ref, depth_ref):
    _init_body(id_ref, depth_ref, bands=TILES_Y, flat=False)


def k_flatcol(id_ref, depth_ref):
    _init_body(id_ref, depth_ref, bands=TILES_Y, flat=True)


def k_flat510(id_ref, depth_ref):
    _init_body(id_ref, depth_ref, bands=1, flat=True)


def build(name):
    if name == "strided34":
        out_shape = [
            jax.ShapeDtypeStruct((TILES_Y, TILES_X, ROWS, TW), jnp.int32),
            jax.ShapeDtypeStruct((TILES_Y, TILES_X, ROWS, TW), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((TILES_Y, 1, ROWS, TW), lambda i: (0, i, 0, 0))
            for _ in range(2)
        ]
        grid = (TILES_X,)
        kern = k_strided
    elif name == "flat_col":
        out_shape = [
            jax.ShapeDtypeStruct((TILES_X, TILES_Y * ROWS, TW), jnp.int32),
            jax.ShapeDtypeStruct((TILES_X, TILES_Y * ROWS, TW), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, TILES_Y * ROWS, TW), lambda i: (i, 0, 0))
            for _ in range(2)
        ]
        grid = (TILES_X,)
        kern = k_flatcol
    elif name == "flat510":
        nt = TILES_Y * TILES_X
        out_shape = [
            jax.ShapeDtypeStruct((nt, ROWS, TW), jnp.int32),
            jax.ShapeDtypeStruct((nt, ROWS, TW), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, ROWS, TW), lambda i: (i, 0, 0))
            for _ in range(2)
        ]
        grid = (nt,)
        kern = k_flat510
    else:
        raise ValueError(name)

    fn = pl.pallas_call(
        kern,
        grid=grid,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=INTERPRET,
    )
    return jax.jit(lambda: fn())


def xla_ref():
    return (
        jnp.full((TILES_Y * TILES_X, ROWS, TW), BG, jnp.int32),
        jnp.ones((TILES_Y * TILES_X, ROWS, TW), jnp.float32),
    )


names = ["strided34", "flat_col", "flat510"]
fns = {}
for n in names:
    t0 = time.time()
    fns[n] = build(n)
    fns[n]()  # compile
    print(f"compiled {n} in {time.time() - t0:.1f} s", flush=True)
fns["xla_ref"] = jax.jit(xla_ref)
fns["xla_ref"]()

# correctness: every cell inits the same 67 MB to (-1, 1.0)
for n, f in fns.items():
    i, d = f()
    assert int(jnp.min(i)) == BG and int(jnp.max(i)) == BG, n
    assert float(jnp.min(d)) == 1.0 and float(jnp.max(d)) == 1.0, n
print("all cells init-correct", flush=True)

if INTERPRET:
    print(json.dumps({"interpret": "ok"}), flush=True)
    sys.exit(0)

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

N = 10
results = {m: [] for m in fns}
for rep in range(4):
    for m, f in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            tri_id, _d = f()
            acc = acc + jnp.sum(tri_id.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[m].append(dt)
        print(f"rep{rep} {m:10s} {dt:7.2f} ms", flush=True)
print(json.dumps({m: round(min(v), 2) for m, v in results.items()}),
      flush=True)

#!/usr/bin/env python
"""Micro-A/B of raster window-body COEFFICIENT ACCESS forms on the chip.

The production kernel's per-(group, visit) cost includes ~176 SMEM scalar
reads + per-triangle scalar hit tests (the 'per-visit overhead' that
docs/NEXT.md declares the raster floor). Three candidate body forms, same
math, same output:

  classic   - coefficients via SMEM scalar reads, per-triangle (win,128)
              vector eval, scalar bool hit folded into the mask
              (= production body shape)
  transposed- stream DMA'd TRIANGLE-MAJOR (chunk, 32) to VMEM; per GROUP
              the 8 triangles' coefficients load as (8,1) sublane vectors,
              planes evaluate per buffer row on (8,128) (triangle =
              sublane), winner lexmin-reduced across sublanes. ~zero
              scalar-unit work per visit.

Each variant runs an identical visit schedule (V visits x G groups per
program) over synthetic plane data, accumulating a lexmin so nothing is
dead-code-eliminated. Reports ns per (group visit).

If transposed wins by >=2x, the production kernel gets a layers==1
sublane-group body; if it ties or loses, the scalar-overhead floor claim
stands re-verified at the primitive level.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 32          # buffer rows per window
TW = 128          # lanes
GS = 8            # triangles per group
CHUNK = 256       # triangles per stream chunk
ROWS = 24         # stream rows (component-major form)
N_PROGRAMS = 120  # grid size ~ tiles
VISITS = 8        # chunk visits per program
BACKGROUND = -1


def classic_kernel(data_smem_ref, out_id_ref, out_d_ref):
    sxx = jax.lax.broadcasted_iota(jnp.int32, (WIN, TW), 1).astype(jnp.float32)
    syy = jax.lax.broadcasted_iota(jnp.int32, (WIN, TW), 0).astype(jnp.float32)

    def visit(v, _):
        def per_group(g, _):
            k0 = g * GS
            tris = []
            for k in range(GS):
                kk = k0 + k
                consts = (
                    data_smem_ref[0, kk], data_smem_ref[1, kk],
                    data_smem_ref[2, kk], data_smem_ref[3, kk],
                    data_smem_ref[15, kk] >= 0.0,
                    [data_smem_ref[r, kk] for r in range(9)],
                    [data_smem_ref[r, kk] for r in range(9, 12)],
                    data_smem_ref[15, kk].astype(jnp.int32),
                    [data_smem_ref[r, kk].astype(jnp.int32)
                     for r in range(16, 19)],
                )
                tris.append(consts)
            hits = [
                (t[0] < 128.0) & (t[1] > 0.0) & t[4] for t in tris
            ]
            acc_d = out_d_ref[0]
            acc_i = out_id_ref[0]
            for (tx0, _tx1, ty0, _ty1, _v, ed, zw, tid, thr), hit in zip(
                    tris, hits):
                dxx = sxx - tx0
                dyy = syy - ty0

                def edge(a, b, c, th):
                    e = a * dxx + b * dyy + c
                    return jax.lax.bitcast_convert_type(e, jnp.int32) > th

                inside = (edge(ed[0], ed[1], ed[2], thr[0])
                          & edge(ed[3], ed[4], ed[5], thr[1])
                          & edge(ed[6], ed[7], ed[8], thr[2]))
                depth = zw[0] * dxx + zw[1] * dyy + zw[2]
                ok = hit & inside
                swap = ok & ((depth < acc_d)
                             | ((depth == acc_d) & (tid < acc_i)))
                acc_d = jnp.where(swap, depth, acc_d)
                acc_i = jnp.where(swap, tid, acc_i)
            out_d_ref[0] = acc_d
            out_id_ref[0] = acc_i
            return 0

        jax.lax.fori_loop(0, CHUNK // GS, per_group, 0, unroll=False)
        return 0

    out_id_ref[0] = jnp.full((WIN, TW), BACKGROUND, jnp.int32)
    out_d_ref[0] = jnp.ones((WIN, TW), jnp.float32)
    jax.lax.fori_loop(0, VISITS, visit, 0, unroll=False)


def transposed_kernel(data_vmem_ref, out_id_ref, out_d_ref):
    # data_vmem: (CHUNK, 32) triangle-major
    x_row = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1).astype(jnp.float32)
    imax = jnp.int32(2**31 - 1)

    def visit(v, _):
        def per_group(g, _):
            k0 = g * GS
            blk = data_vmem_ref[pl.ds(k0, GS), :]  # (8, 32)
            a0, b0, c0 = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
            a1, b1, c1 = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
            a2, b2, c2 = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
            da, db, dc = blk[:, 9:10], blk[:, 10:11], blk[:, 11:12]
            tx0, ty0 = blk[:, 0:1] * 0.0, blk[:, 1:2] * 0.0  # anchors (synth)
            tid = blk[:, 15:16].astype(jnp.int32)
            thr0 = blk[:, 16:17].astype(jnp.int32)
            thr1 = blk[:, 17:18].astype(jnp.int32)
            thr2 = blk[:, 18:19].astype(jnp.int32)
            valid = blk[:, 15:16] >= 0.0

            def row(r, carry):
                y = r.astype(jnp.float32)
                # e = a*x + (b*y + c) ; (8,1) small FMA + (8,128) FMA
                def edge(a, b, c, th):
                    k = b * y + c
                    e = a * x_row + k  # (8,1)x(1,128) -> (8,128)
                    return jax.lax.bitcast_convert_type(e, jnp.int32) > th

                inside = (edge(a0, b0, c0, thr0)
                          & edge(a1, b1, c1, thr1)
                          & edge(a2, b2, c2, thr2)) & valid
                depth = da * x_row + (db * y + dc)
                cand_d = jnp.where(inside, depth, 1.0)
                cand_i = jnp.where(inside, tid, BACKGROUND)
                # lexmin across sublanes (the 8 triangles)
                dmin = jnp.min(cand_d, axis=0, keepdims=True)  # (1,128)
                imin = jnp.min(
                    jnp.where(cand_d == dmin, cand_i, imax), axis=0,
                    keepdims=True)
                imin = jnp.where(imin == imax, BACKGROUND, imin)
                # merge into the accumulator row r
                accd = out_d_ref[0, pl.ds(r, 1), :]
                acci = out_id_ref[0, pl.ds(r, 1), :]
                swap = (dmin < accd) | ((dmin == accd) & (imin < acci))
                out_d_ref[0, pl.ds(r, 1), :] = jnp.where(swap, dmin, accd)
                out_id_ref[0, pl.ds(r, 1), :] = jnp.where(swap, imin, acci)
                return carry

            jax.lax.fori_loop(0, WIN, row, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, CHUNK // GS, per_group, 0, unroll=False)
        return 0

    out_id_ref[0] = jnp.full((WIN, TW), BACKGROUND, jnp.int32)
    out_d_ref[0] = jnp.ones((WIN, TW), jnp.float32)
    jax.lax.fori_loop(0, VISITS, visit, 0, unroll=False)


def build(kind: str, interpret: bool):
    if kind == "classic":
        in_specs = [pl.BlockSpec((ROWS, CHUNK), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)]
        kernel = classic_kernel
        data = np.random.default_rng(0).normal(
            size=(ROWS, CHUNK)).astype(np.float32)
    else:
        in_specs = [pl.BlockSpec((CHUNK, 32), lambda i: (0, 0))]
        kernel = transposed_kernel
        data = np.random.default_rng(0).normal(
            size=(CHUNK, 32)).astype(np.float32)
    out_specs = [
        pl.BlockSpec((1, WIN, TW), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, WIN, TW), lambda i: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N_PROGRAMS, WIN, TW), jnp.int32),
        jax.ShapeDtypeStruct((N_PROGRAMS, WIN, TW), jnp.float32),
    ]
    fn = pl.pallas_call(
        kernel,
        grid=(N_PROGRAMS,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    return fn, jnp.asarray(data)


def main():
    interpret = jax.devices()[0].platform != "tpu"
    print(f"platform={jax.devices()[0].platform} interpret={interpret}",
          flush=True)
    fns = {}
    for kind in ("classic", "transposed"):
        fn, data = build(kind, interpret)
        fns[kind] = (jax.jit(lambda d, fn=fn: fn(d)).lower(data).compile(),
                     data)
        print(f"{kind} compiled", flush=True)

    for _ in range(2):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

    n_visits = N_PROGRAMS * VISITS * (CHUNK // GS)
    N = 20
    for rep in range(3):
        for kind, (fn, data) in fns.items():
            acc = jnp.zeros((), jnp.float32)
            np.asarray(acc)
            t0 = time.time()
            for _ in range(N):
                i, d = fn(data)
                acc = acc + jnp.sum(d.ravel()[-64:])
            np.asarray(acc)
            dt = (time.time() - t0 - rpc_s) / N
            print(f"rep{rep} {kind:10s} {dt * 1e3:7.2f} ms "
                  f"({dt / n_visits * 1e9:7.1f} ns/group-visit)", flush=True)


if __name__ == "__main__":
    main()

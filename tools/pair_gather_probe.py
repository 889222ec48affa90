#!/usr/bin/env python
"""Pair-coherent shade-table gather A/B on the live chip (VERDICT r3 #1).

The deferred shade's table gather issues one row gather per pixel (2.1M at
1080p) at the measured flat ~2-2.5 ns/idx issue rate. Adjacent pixels in
block-layout order overwhelmingly share the winning triangle
(tools/pair_coherence_stats.py: odd==left 97%+ at Sponza), so the
candidate scheme gathers only the EVEN-position rows (half the indices)
and reconstructs odd positions structurally:

  odd row = left neighbor's row  (ids equal — the common case)
          | right neighbor's row (run starts at the odd pixel: shift+select)
          | capped fix-up gather (odd pixel is a 1-px run: rare)

This probe measures, same-process interleaved on the REAL sponza winner-id
stream: the full baseline, the half gather floor, the structured pair
expansion (selects + interleave), the residual-fix primitives (mask,
compacted positions via jnp.where-free top_k, small gather, column
scatter), and the complete bit-exact candidate — verified equal to the
baseline's bytes before timing.

    python tools/pair_gather_probe.py --preset sponza
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="sponza")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--msaa", type=int, default=4)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--cap", type=int, default=131072,
                    help="residual fix-up static capacity C (bench-camera "
                         "residuals measure 63k, pair_coherence_stats)")
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved repetitions (report per-rep mins)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import (
        PallasFrameProgram,
        _tiled_pixel_coords,
        _tiled_winner,
    )
    from vktf_tpu.ops.shade_table import gather_rows
    from vktf_tpu.scene.flatten import flatten_assets
    from vktf_tpu.mathx import Camera, ViewFrustumParams

    from bench import CAMERAS

    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="pallas")
    scene, meta, aux = flatten_assets(build_preset(args.preset))
    scene = jax.device_put(scene)
    position, direction = CAMERAS[args.preset]
    camera = Camera(
        position, direction,
        ViewFrustumParams(np.radians(45.0), args.width / args.height,
                          0.1, 1.0e6),
    )
    prog = PallasFrameProgram(meta, config)
    vp, cp = camera.view_projection_transform, camera.position

    setup, lights = prog._prepare(scene, vp, cp)
    perm = prog._perm_fn(setup)
    tri_id, depth = prog._raster(setup, perm)
    table = prog._table(setup, scene)
    ids4 = tri_id if tri_id.ndim == 4 else tri_id[None]
    deps4 = depth if depth.ndim == 4 else depth[None]
    id_px, frac = jax.jit(
        lambda i, d: _tiled_winner(i, d, config))(ids4, deps4)
    t = jnp.maximum(id_px[0], 0)
    n_px = int(t.shape[0])
    C = args.cap
    print(f"n_px={n_px} table_rows={table.shape[0]} cap={C}", flush=True)

    def probe_leaf(x, acc):
        v = jax.tree.leaves(x)[0]
        return acc + jnp.sum(v.ravel()[-64:].astype(jnp.float32))

    def device_time(fn, *fargs, n=args.n):
        f = jax.jit(fn)
        acc = jnp.zeros((), jnp.float32)
        acc = probe_leaf(f(*fargs), acc)
        np.asarray(acc)
        t0 = time.perf_counter()
        a2 = acc
        for _ in range(n):
            a2 = a2 + 1.0
        np.asarray(a2)
        rpc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            acc = probe_leaf(f(*fargs), acc)
        np.asarray(acc)
        return (time.perf_counter() - t0 - rpc) / n * 1000.0

    # ---- variants ----------------------------------------------------------
    def full(table, t):
        return gather_rows(table, t).T  # (128, N) u16 — production form

    def half(table, t):
        return gather_rows(table, t[0::2]).T  # floor of the pair scheme

    def pair_expand(table, t):
        """Structured expansion WITHOUT the residual fix (timing shape;
        bit-wrong at ~resid fraction of odd pixels)."""
        e, o = t[0::2], t[1::2]
        rowsT = gather_rows(table, e).T          # (128, M)
        right = jnp.concatenate([rowsT[:, 1:], rowsT[:, -1:]], axis=1)
        use_l = (o == e)[None, :]
        odd = jnp.where(use_l, rowsT, right)
        return jnp.stack([rowsT, odd], axis=2).reshape(rowsT.shape[0], -1)

    def resid_mask(t):
        e, o = t[0::2], t[1::2]
        idR = jnp.concatenate([e[1:], e[-1:]])
        return (o != e) & (o != idR)

    def topk_pos(t):
        r = resid_mask(t)
        m = r.shape[0]
        # positions of residuals, compacted to C: score = pos for residuals,
        # -1 otherwise; top_k returns the C largest (valid ones first)
        score = jnp.where(r, jnp.arange(m, dtype=jnp.int32), -1)
        vals, _ = jax.lax.top_k(score, C)
        return vals  # (C,) i32, -1 padded

    def pair_exact(table, t):
        """The complete bit-exact candidate (capped fix-up, no cond —
        correctness asserted below against `full` on the real stream)."""
        e, o = t[0::2], t[1::2]
        rowsT = gather_rows(table, e).T
        right = jnp.concatenate([rowsT[:, 1:], rowsT[:, -1:]], axis=1)
        use_l = (o == e)[None, :]
        odd = jnp.where(use_l, rowsT, right)
        # residual fix
        idR = jnp.concatenate([e[1:], e[-1:]])
        r = (o != e) & (o != idR)
        m = r.shape[0]
        score = jnp.where(r, jnp.arange(m, dtype=jnp.int32), -1)
        pos, _ = jax.lax.top_k(score, C)
        fixed = gather_rows(table, o[jnp.maximum(pos, 0)]).T  # (128, C)
        # -1 pads scatter out of bounds and are DROPPED (no aliasing with
        # real residual columns)
        tgt = jnp.where(pos >= 0, pos, m)
        odd = odd.at[:, tgt].set(fixed, mode="drop")
        out = jnp.stack([rowsT, odd], axis=2).reshape(rowsT.shape[0], -1)
        return out

    def pair_exact_cs(table, t):
        """Same, but residual positions compacted by cumsum + 1-D scatter
        instead of top_k (the two compaction primitives to race)."""
        e, o = t[0::2], t[1::2]
        rowsT = gather_rows(table, e).T
        right = jnp.concatenate([rowsT[:, 1:], rowsT[:, -1:]], axis=1)
        use_l = (o == e)[None, :]
        odd = jnp.where(use_l, rowsT, right)
        idR = jnp.concatenate([e[1:], e[-1:]])
        r = (o != e) & (o != idR)
        m = r.shape[0]
        cnt = jnp.cumsum(r.astype(jnp.int32)) - 1
        slot = jnp.where(r, cnt, C)  # OOB slots dropped
        pos = jnp.full((C,), -1, jnp.int32).at[slot].set(
            jnp.arange(m, dtype=jnp.int32), mode="drop")
        fixed = gather_rows(table, o[jnp.maximum(pos, 0)]).T
        tgt = jnp.where(pos >= 0, pos, m)
        odd = odd.at[:, tgt].set(fixed, mode="drop")
        return jnp.stack([rowsT, odd], axis=2).reshape(rowsT.shape[0], -1)

    def interleave_only(a, b):
        return jnp.stack([a, b], axis=2).reshape(a.shape[0], -1)

    # ---- correctness: pair_exact must be BIT-EQUAL to full -----------------
    ref = np.asarray(jax.jit(full)(table, t))
    got = np.asarray(jax.jit(pair_exact)(table, t))
    got_cs = np.asarray(jax.jit(pair_exact_cs)(table, t))
    n_resid = int(np.asarray(jax.jit(resid_mask)(t)).sum())
    equal = bool((ref == got).all())
    equal_cs = bool((ref == got_cs).all())
    print(f"resid_count={n_resid} (cap {C}) pair_exact bit-equal: {equal} "
          f"cumsum-variant: {equal_cs}", flush=True)

    M = n_px // 2
    a = jnp.zeros((128, M), jnp.uint16) + 3
    b = jnp.zeros((128, M), jnp.uint16) + 5

    variants = [
        ("full", lambda: device_time(full, table, t)),
        ("half", lambda: device_time(half, table, t)),
        ("pair_expand", lambda: device_time(pair_expand, table, t)),
        ("pair_exact", lambda: device_time(pair_exact, table, t)),
        ("pair_exact_cs", lambda: device_time(pair_exact_cs, table, t)),
        ("topk_pos", lambda: device_time(topk_pos, t)),
        ("interleave", lambda: device_time(interleave_only, a, b)),
    ]
    best: dict[str, float] = {}
    for rep in range(args.reps):
        line = {}
        for name, fn in variants:
            ms = fn()
            line[name] = round(ms, 2)
            best[name] = min(best.get(name, 1e9), ms)
        print(f"rep {rep}: {line}", flush=True)
    print(json.dumps({
        "best_ms": {k: round(v, 2) for k, v in best.items()},
        "n_px": n_px, "resid_count": n_resid, "cap": C,
        "bit_equal": equal, "bit_equal_cs": equal_cs,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

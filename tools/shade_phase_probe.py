#!/usr/bin/env python
"""Decompose the two-phase deferred shade on the live chip.

Times, as separate one-sync device loops (stage_probe method):
  winner   - _tiled_winner + _tiled_pixel_coords (the XLA reductions)
  tgather  - the shade-table row gather + transpose (phase A's gather)
  addr     - full phase A program (winner + gather + addressing)
  pgather  - ONE quad-pool row gather (+ transpose to lane-major)
  final    - full phase B program
  tail     - composite + frac resolve + sRGB + assemble alone

    python tools/shade_phase_probe.py --preset sponza
"""
from __future__ import annotations

import argparse
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops import pipeline as pp
    from vktf_tpu.ops.pipeline import (
        PallasFrameProgram,
        _tiled_pixel_coords,
        _tiled_winner,
    )
    from vktf_tpu.ops.shade_table import gather_rows, pool_row_indices, ROW
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

    # materialize each stage's inputs once
    setup, lights = prog._prepare(scene, vp, cp)
    perm = prog._perm_fn(setup)
    tri_id, depth = prog._raster(setup, perm)
    table = prog._table(setup, scene)
    addr = prog._shade_addr(tri_id, depth, table)
    out = prog._shade_final(addr, scene, lights, cp)
    np.asarray(out)

    def probe_leaf(x, acc):
        # fold ONE tiny reduction of the output into the accumulator so the
        # buffer can be freed immediately (keeping n outputs live serializes
        # on HBM pressure — measured 670 ms/call for a 5 ms gather)
        v = jax.tree.leaves(x)[0]
        return acc + jnp.sum(v.ravel()[-64:].astype(jnp.float32))

    def device_time(fn, *fargs, n=args.n):
        f = jax.jit(fn)
        acc = jnp.zeros((), jnp.float32)
        acc = probe_leaf(f(*fargs), acc)
        np.asarray(acc)  # compile + settle
        # no-op rpc baseline
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
        dt = time.perf_counter() - t0 - rpc
        return dt / n * 1000.0

    def winner_fn(ids, deps):
        id_px, frac = _tiled_winner(ids, deps, config)
        sx, sy = _tiled_pixel_coords(config, ids.shape[1])
        return id_px, frac, sx, sy

    ids4 = tri_id if tri_id.ndim == 4 else tri_id[None]
    deps4 = depth if depth.ndim == 4 else depth[None]

    id_px, frac, sx, sy = jax.jit(winner_fn)(ids4, deps4)
    idf = id_px[0]
    t = jnp.maximum(idf, 0)

    def tgather_fn(table, t):
        return gather_rows(table, t).T

    def addr_math_fn(colsT, sx, sy):
        def colx(c):
            hi = colsT[c].astype(jnp.uint32) << 16
            lo = colsT[ROW + c].astype(jnp.uint32)
            return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)
        return pool_row_indices(colx, sx, sy, config.max_anisotropy, slot=0)

    colsT = jax.jit(tgather_fn)(table, t)
    r0, r1 = jax.jit(addr_math_fn)(colsT, sx, sy)

    def pgather_fn(pool, r):
        return gather_rows(pool, r).T

    def tail_fn(rgb, a, frac):
        background = jnp.asarray(config.clear_color, jnp.float32)
        n_px = frac.shape[0]
        comp = rgb * a + jnp.broadcast_to(background[:3, None], rgb.shape) * (1.0 - a)
        frac_f = frac.reshape(1, n_px)
        resolved = comp * frac_f + background[:3, None] * (1.0 - frac_f)
        return pp._tiled_assemble(pp.linear_to_srgb_u8(resolved), config)

    n_px = frac.shape[0]
    rgb = jnp.zeros((3, n_px), jnp.float32) + 0.25
    a = jnp.zeros((n_px,), jnp.float32) + 0.5

    results = {}
    results["winner"] = device_time(winner_fn, ids4, deps4)
    results["tgather"] = device_time(tgather_fn, table, t)
    results["addr_math"] = device_time(addr_math_fn, colsT, sx, sy)
    results["addrA"] = device_time(
        lambda ti, de, tb: pp.pallas_shade_addr_tiled(ti, de, tb,
                                                      config=config),
        tri_id, depth, table)
    results["pgather"] = device_time(pgather_fn, scene.quad_pool, r0)
    results["finalB"] = device_time(
        lambda ad, qp, li, c: pp.pallas_shade_final_tiled(ad, qp, li, c,
                                                          config=config),
        addr, scene.quad_pool, lights, cp)
    results["tail"] = device_time(tail_fn, rgb, a, frac)
    for k, v in results.items():
        print(f"{k:10s} {v:7.2f} ms")
    import json
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

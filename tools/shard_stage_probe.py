#!/usr/bin/env python
"""MEASURED per-device stage times for the (gp, sp) sharded frame.

The round-1 verdict called the 8-chip latency model "arithmetic, not
measurement" (stage_time / 8). This probe runs each per-device stage of
vktf_tpu.parallel.render_frame_sharded ON THE REAL CHIP with exactly the
shard-shaped inputs one device of a (gp, sp) v5e-8 mesh would see:

  * prep micro-shard: triangle_setup_cm + shade-table build on T/(gp*sp)
  * raster: EVERY (band, gp-shard) cell — ph/sp rows over T/gp triangles,
    including the in-shard-map Morton argsort it pays each frame — reported
    as the MAX over cells (the frame waits for the slowest device)
  * composite: the local lexmin select ops (pmin's compute half), once
  * shade: every (band, gp-rank) row-slice at pixel rate, MAX over cells

Collectives cannot run on one chip; they are itemized by VOLUME with the
ICI effective-bandwidth assumption printed alongside (README's 75 GB/s
all-gather figure). Everything else is a device_time measurement
(tools/stage_probe.py's single-sync method).

    python tools/shard_stage_probe.py --gp 2 --sp 4
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from stage_probe import device_time  # noqa: E402


ICI_GBPS = 75.0  # effective all-gather GB/s assumption (README perf section)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--gp", type=int, default=2)
    p.add_argument("--sp", type=int, default=4)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import (
        pallas_shade_addr_tiled,
        pallas_shade_final_tiled,
        prepare_frame,
    )
    from vktf_tpu.ops.raster_pallas import rasterize_pallas
    from vktf_tpu.ops.shade_table import build_shade_table_pallas
    from vktf_tpu.ops.vertex import triangle_setup_cm
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.scene.flatten import flatten_assets
    from bench import CAMERAS

    enable_persistent_cache()
    gp, sp = args.gp, args.sp
    n_dev = gp * sp
    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="pallas")
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp, cam_pos = camera.view_projection_transform, camera.position

    th, tw = config.tile_shape
    pw = config.padded_width
    tiles_y = -(-config.height // th)
    tiles_y += (-tiles_y) % sp
    ph = tiles_y * th
    band_h = ph // sp
    rh = band_h // gp
    S = {1: 1, 2: 2, 4: 4, 8: 8}[config.msaa_samples]

    t = meta.num_triangles
    t_pad = -(-t // n_dev) * n_dev
    t_micro = t_pad // n_dev
    t_local = t_pad // gp
    print(f"mesh (gp={gp}, sp={sp})  T={t} t_micro={t_micro} "
          f"t_local={t_local} band_h={band_h} shade_rows={rh}", flush=True)

    # ---- full-scene setup once (host of truth for shard slices) -----------
    setup, _bins, lights, _world, inst_matrix = jax.jit(
        lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)
    )(scene, vp, cam_pos)

    # ---- stage 1: prep micro-shard (setup + table build on T/(gp*sp)) -----
    def pad1(x):
        n = x.shape[1]
        padn = (-n) % n_dev
        return jnp.pad(x, ((0, 0), (0, padn))) if padn else x

    def pad0(x):
        n = x.shape[0]
        padn = (-n) % n_dev
        return jnp.concatenate(
            [x, jnp.zeros((padn,) + x.shape[1:], x.dtype)]) if padn else x

    tc_micro = pad1(scene.tri_corner)[:, :t_micro]
    stat_micro = pad1(scene.tri_static_cols)[:, :t_micro]
    tin_micro = pad0(scene.tri_instance)[:t_micro]
    mat16 = inst_matrix.reshape(-1, 16)

    from types import SimpleNamespace

    def prep_micro(tc, stat, tin):
        mrows = mat16[tin]
        su = dict(triangle_setup_cm(tc, mrows, vp, config.width,
                                    config.height))
        su["mrows"] = mrows
        shard_scene = SimpleNamespace(tri_corner=tc, tri_static_cols=stat,
                                      tri_instance=tin)
        return su, build_shade_table_pallas(su, shard_scene, None)

    prep_jit = jax.jit(prep_micro)

    # ---- stage 2: raster, every (gp shard, band) cell ----------------------
    raster_keys = ("edge", "edge_raster", "zw", "anchor", "inv_det", "valid",
                   "bbox")
    # pad the full setup to t_pad so gp shards slice evenly
    pad_rows = t_pad - setup["valid"].shape[0]

    def pad_tri(x):
        if not pad_rows:
            return x
        fill = jnp.zeros((pad_rows,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, fill], axis=0)

    setup_pad = {k: pad_tri(setup[k]) for k in raster_keys}
    setup_pad["valid"] = setup_pad["valid"] & (
        jnp.arange(t_pad) < meta.num_triangles)
    shards = [
        {k: setup_pad[k][r * t_local:(r + 1) * t_local] for k in raster_keys}
        for r in range(gp)
    ]

    def raster_shard(su, y0):
        # assemble=False: the round-3 unified sharded path consumes raw
        # tile blocks (the two assemble transposes are gone from raster)
        return rasterize_pallas(
            su, band_h, pw, tile_shape=config.tile_shape,
            msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
            sort="morton", y_offset=y0, id_base=0, layers=meta.peel_layers,
            window_rows=config.raster_window_rows,
            group_size=config.raster_group_size,
            interleave=config.resolved_interleave(),
            columns=config.raster_columns,
            assemble=False,
        )

    raster_jit = jax.jit(raster_shard)
    raster_cells = [
        (r, b, shards[r], jnp.int32(b * band_h))
        for r in range(gp) for b in range(sp)
    ]
    tri_id, depth = raster_jit(shards[0], jnp.int32(0))

    # ---- stage 3: composite's local compute (pmin's select half) ----------
    imax = jnp.int32(2**31 - 1)

    def composite_local(d, i):
        # the non-collective half of lexmin_gp: one min-select pass per pmin
        gd = jnp.minimum(d, d)
        gi = jnp.minimum(jnp.where(d == gd, i, imax), imax)
        return gd, gi

    composite_jit = jax.jit(composite_local)

    # ---- stage 4: shade (rh rows at pixel rate, single-program impl) ------
    table_full = jax.jit(
        lambda su, sc: build_shade_table_pallas(su, sc, None)
    )(setup, scene)

    band_cfg = config.replace(height=band_h)
    rank_px = band_h * pw // gp
    fused = config.resolved_fused_pool(
        mirror_wrap=meta.mirror_wrap, mixed_samplers=meta.mixed_samplers)

    def shade_slice(win_id, win_depth, table, px0, y0):
        # round-3 unified form (parallel/tiles.py): the production
        # two-phase tile-layout kernels on a 1/gp flat pixel slice
        addr = pallas_shade_addr_tiled(
            win_id, win_depth, table, config=band_cfg, fused_pool=fused,
            y0=y0.astype(jnp.float32), px_slice=(px0, rank_px))
        return pallas_shade_final_tiled(
            addr, scene.quad_pool, lights, cam_pos, config=band_cfg,
            fused_pool=fused, assemble=False)

    shade_jit = jax.jit(shade_slice)
    # shade cells: per band, per gp-rank pixel slice; winner ids
    # approximated by one shard's raster of that band (same shapes/coverage
    # statistics)
    band_vis = {0: (tri_id, depth)}

    def shade_cells():
        for b in range(sp):
            if b not in band_vis:
                band_vis[b] = raster_jit(shards[0], jnp.int32(b * band_h))
            ti, dp = band_vis[b]
            for r in range(gp):
                yield (r, b, ti, dp, jnp.int32(r * rank_px),
                       jnp.int32(b * band_h))

    stages = [
        ("prep_micro", prep_jit, (tc_micro, stat_micro, tin_micro)),
        ("composite_local", composite_jit, (depth, tri_id)),
    ]

    # no-op RPC cost: MIN over several separated single-shot probes — a
    # congestion spike during one averaged burst once produced an rpc_s
    # larger than the stage loops themselves (negative stage times)
    for _ in range(2):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs = []
    for _ in range(8):
        t0 = time.time()
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
        rpcs.append(time.time() - t0)
    rpc_s = min(rpcs)
    print(f"rpc {rpc_s * 1e3:.1f} ms (spread {min(rpcs)*1e3:.1f}-"
          f"{max(rpcs)*1e3:.1f})", flush=True)

    for name, fn, a in stages:
        device_time(fn, *a, n=1, rpc_s=rpc_s)  # warm compile

    results = {}
    for rep in range(args.reps):
        for name, fn, a in stages:
            dt = device_time(fn, *a, n=args.frames, rpc_s=rpc_s) * 1e3
            results.setdefault(name, []).append(dt)
            print(f"rep{rep} {name:16s} {dt:8.2f} ms", flush=True)

    # raster/shade: best-of-reps per (shard, band) cell, then MAX over cells
    # (the sharded frame waits for the slowest device)
    cell_best = {}
    for rep in range(args.reps):
        for r, b, su, y0 in raster_cells:
            dt = device_time(raster_jit, su, y0, n=args.frames,
                             rpc_s=rpc_s) * 1e3
            key = ("raster_shard", r, b)
            cell_best[key] = min(cell_best.get(key, 1e9), dt)
        for r, b, ti, dp, rows0, y0 in shade_cells():
            dt = device_time(shade_jit, ti, dp, table_full, rows0, y0,
                             n=args.frames, rpc_s=rpc_s) * 1e3
            key = ("shade_slice", r, b)
            cell_best[key] = min(cell_best.get(key, 1e9), dt)
    for stage in ("raster_shard", "shade_slice"):
        cells = {k[1:]: v for k, v in cell_best.items() if k[0] == stage}
        worst = max(cells, key=cells.get)
        results[stage] = [max(cells.values())]
        print(f"{stage}: max cell (shard, band)={worst} "
              f"{cells[worst]:.2f} ms; cells "
              f"{ {k: round(v, 2) for k, v in sorted(cells.items())} }",
              flush=True)

    best = {k: round(min(v), 2) for k, v in results.items()}

    # ---- collectives, itemized by volume -----------------------------------
    row_b = 2 * 128  # shade-table row bytes (2*ROW u16)
    vol = {}
    # full-table all_gather over gp*sp (each device receives (t_pad - t_micro))
    vol["table_all_gather_MB"] = (t_pad - t_micro) * row_b / 1e6
    # setup sp-gather: 7 raster keys, per-tri f32s: edge 9 + edge_raster 9 +
    # zw 6 + anchor 2 + inv_det 1 + bbox 4i32 + valid (1 byte)
    per_tri = (9 + 9 + 6 + 2 + 1 + 4) * 4 + 1
    vol["setup_sp_gather_MB"] = (t_local - t_micro) * per_tri / 1e6
    # two lexmin pmins over gp on ([L,] S, band_h, pw) f32 + i32
    npx_band = S * band_h * pw * max(meta.peel_layers, 1)
    vol["pmin_x2_MB"] = 2 * npx_band * 4 * 2 * (gp - 1) / gp / 1e6
    # rgba all_gather over gp of (3, rh, pw) u8
    vol["rgba_gather_MB"] = 3 * (band_h - rh) * pw / 1e6
    coll_ms = {k: v / ICI_GBPS for k, v in vol.items()}  # MB / (GB/s) = ms
    total_coll = sum(coll_ms.values())

    # one lexmin_gp call (its TWO pmins are in the collective volume; the
    # local select half is composite_local, measured once)
    model = (best["prep_micro"] + best["raster_shard"]
             + best["composite_local"] + best["shade_slice"]
             + total_coll)
    print(json.dumps({
        "measured_ms": best,
        "collective_MB": {k: round(v, 2) for k, v in vol.items()},
        "ici_gbps_assumed": ICI_GBPS,
        "collectives_ms": round(total_coll, 2),
        "modeled_frame_ms": round(model, 2),
        "modeled_fps": round(1e3 / model, 1),
    }))


if __name__ == "__main__":
    main()

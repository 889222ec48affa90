#!/usr/bin/env python
"""Occlusion-culling CEILING probe (feasibility, not product code).

Question: of the raster kernel's (bin, chunk) and (bin, chunk, group)
visits at the bench camera, what fraction is PROVABLY occluded — i.e.
chunk/group conservative min-depth strictly greater than the frame's final
max-depth over the visited region? That is the upper bound any exact
hierarchical-z scheme (prepass or feedback) could cull; layers must be 1
(depth peeling needs occluded fragments).

Uses the IDEAL pyramid: the rendered frame's own per-pixel max-sample
depth, block-reduced at --block granularity (region Zmax is taken over
blocks OVERLAPPING the region, so it over-estimates Zmax and
under-estimates cull potential — a safe lower bound of the ceiling).

    python tools/occlusion_probe.py --preset sponza
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--block", type=int, default=16)
    args = p.parse_args()

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import PallasFrameProgram
    from vktf_tpu.ops.raster_pallas import _ACC_VMEM_BUDGET
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.scene.flatten import flatten_assets
    from bench import CAMERAS

    enable_persistent_cache()
    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="pallas")
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    assert meta.peel_layers == 1, "occlusion culling applies to layers=1 only"
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp, cam_pos = camera.view_projection_transform, camera.position
    prog = PallasFrameProgram(meta, config)
    setup, _lights = prog._prepare(scene, vp, cam_pos)
    perm = np.asarray(prog._perm_fn(setup))
    tri_id_blk, depth_blk = prog._raster(setup, prog._perm_fn(setup))
    ids = np.asarray(tri_id_blk)    # (num_tiles, S*th, tw), row = y*S + s
    dep = np.asarray(depth_blk)

    th, tw = config.tile_shape
    S = ids.shape[1] // th
    tiles_y, tiles_x = config.tiles_y, config.tiles_x
    ph, pw = config.padded_height, config.padded_width
    mi = config.resolved_interleave()

    # ---- final per-pixel max depth image (ph, pw) --------------------------
    if mi == 1:
        d = dep.reshape(tiles_y, tiles_x, th, S, tw).max(axis=3)
        dmax = d.transpose(0, 2, 1, 3).reshape(ph, pw)
        iw = ids.reshape(tiles_y, tiles_x, th, S, tw)
        covered_any = (iw >= 0).any(axis=3)
        win_ids = iw.max(axis=3)
    else:
        cols = tw // mi
        d = dep.reshape(tiles_y, tiles_x, mi, th * S // mi, mi, cols)
        d = d.reshape(tiles_y, tiles_x, mi, th, S, cols).max(axis=4)
        dmax = d.transpose(0, 3, 1, 2, 4).reshape(ph, pw)
        iw = ids.reshape(tiles_y, tiles_x, mi, th * S // mi, mi, cols)
        iw = iw.reshape(tiles_y, tiles_x, mi, th, S, cols)
        covered_any = (iw >= 0).any(axis=4)
        win_ids = iw.max(axis=4)

    t = meta.num_triangles
    winners = np.unique(win_ids[win_ids >= 0])
    bbox = np.asarray(setup["bbox"])          # (T,4) i32 x0,y0,x1,y1
    valid = np.asarray(setup["valid"])
    zw = np.asarray(setup["zw"])              # (T,2,3) anchored planes
    anchor = np.asarray(setup["anchor"])      # (T,2)
    print(f"tris={t} valid={int(valid.sum())} winners={winners.size} "
          f"({winners.size / max(int(valid.sum()), 1):.1%} of valid)")

    # ---- ideal block pyramid ------------------------------------------------
    B = args.block
    by, bx = -(-ph // B), -(-pw // B)
    pad_y, pad_x = by * B - ph, bx * B - pw
    dpad = np.pad(dmax, ((0, pad_y), (0, pad_x)), constant_values=1.0)
    zblock = dpad.reshape(by, B, bx, B).max(axis=(1, 3))  # (by, bx)

    # ---- per-triangle conservative zmin over its own bbox -------------------
    # depth plane anchored at bbox corner: d(s) = a*dx + b*dy + c,
    # dx in [0, w], dy in [0, h]; min at a corner; clamp >= 0 (kernel
    # rejects depth < 0).
    a, b, c = zw[:, 0, 0], zw[:, 0, 1], zw[:, 0, 2]
    w = (bbox[:, 2] - bbox[:, 0]).astype(np.float64)
    h = (bbox[:, 3] - bbox[:, 1]).astype(np.float64)
    tzmin = c + np.minimum(0.0, a * w) + np.minimum(0.0, b * h)
    tzmin = np.maximum(tzmin, 0.0)
    tzmin = np.where(valid, tzmin, 2.0)  # invalid never visits

    # ---- stream structures exactly as rasterize_pallas builds them ---------
    chunk = config.pallas_chunk
    gs = config.raster_group_size
    t_pad = -(-t // chunk) * chunk
    n_chunks = t_pad // chunk

    def padv(x, fill):
        return np.concatenate([x, np.full(t_pad - t, fill, x.dtype)])

    bx0 = np.where(valid, bbox[:, 0], 2**30).astype(np.float64)
    by0 = np.where(valid, bbox[:, 1], 2**30).astype(np.float64)
    bx1 = np.where(valid, bbox[:, 2], -(2**30)).astype(np.float64)
    by1 = np.where(valid, bbox[:, 3], -(2**30)).astype(np.float64)
    sx0 = padv(bx0, 2**30)[perm]
    sy0 = padv(by0, 2**30)[perm]
    sx1 = padv(bx1, -(2**30))[perm]
    sy1 = padv(by1, -(2**30))[perm]
    szmin = padv(tzmin, 2.0)[perm]

    def group_reduce(x, g, red):
        return red(x.reshape(-1, g), axis=1)

    gx0 = group_reduce(sx0, gs, np.min)
    gy0 = group_reduce(sy0, gs, np.min)
    gx1 = group_reduce(sx1, gs, np.max)
    gy1 = group_reduce(sy1, gs, np.max)
    gzmin = group_reduce(szmin, gs, np.min)
    cx0 = group_reduce(sx0, chunk, np.min)
    cy0 = group_reduce(sy0, chunk, np.min)
    cx1 = group_reduce(sx1, chunk, np.max)
    cy1 = group_reduce(sy1, chunk, np.max)
    czmin = group_reduce(szmin, chunk, np.min)

    # bins = column segments, same bands formula as rasterize_pallas
    rows = S * th
    layers = 1
    bands = 1
    if tiles_y > 1:
        for ddd in range(2, tiles_y + 1):
            if (tiles_y % ddd == 0
                    and ddd * rows * tw * 8 * layers <= _ACC_VMEM_BUDGET):
                bands = ddd
    bin_h = bands * th
    num_bins = (tiles_y // bands) * tiles_x
    print(f"bands={bands} bins={num_bins} chunks={n_chunks} "
          f"block={B} zblock_mean={zblock.mean():.3f}")

    def region_zmax(x0, y0, x1, y1):
        """Zmax over blocks overlapping [x0,x1) x [y0,y1) (clipped)."""
        ix0 = max(int(np.floor(x0 / B)), 0)
        iy0 = max(int(np.floor(y0 / B)), 0)
        ix1 = min(int(np.ceil(x1 / B)), bx)
        iy1 = min(int(np.ceil(y1 / B)), by)
        if ix0 >= ix1 or iy0 >= iy1:
            return 1.0
        return float(zblock[iy0:iy1, ix0:ix1].max())

    stats = dict(chunk_visits=0, chunk_culled=0, group_visits=0,
                 group_culled=0, group_culled_chunklive=0,
                 win_weight=0.0, win_weight_culled=0.0)
    for bin_id in range(num_bins):
        t_x0 = (bin_id % tiles_x) * tw
        t_y0 = (bin_id // tiles_x) * bin_h
        t_x1, t_y1 = t_x0 + tw, t_y0 + bin_h
        hit = (cx0 < t_x1) & (cx1 > t_x0) & (cy0 < t_y1) & (cy1 > t_y0)
        for ci in np.nonzero(hit)[0]:
            stats["chunk_visits"] += 1
            rz = region_zmax(max(cx0[ci], t_x0), max(cy0[ci], t_y0),
                             min(cx1[ci], t_x1), min(cy1[ci], t_y1))
            chunk_culled = czmin[ci] > rz
            if chunk_culled:
                stats["chunk_culled"] += 1
            g0 = ci * (chunk // gs)
            for gi in range(g0, g0 + chunk // gs):
                if not ((gx0[gi] < t_x1) and (gx1[gi] > t_x0)
                        and (gy0[gi] < t_y1) and (gy1[gi] > t_y0)):
                    continue
                stats["group_visits"] += 1
                # window weight: rows the group's y span touches in the bin
                ry0 = max(gy0[gi], t_y0)
                ry1 = min(gy1[gi], t_y1)
                wweight = max(ry1 - ry0, 0.0) * S / 32.0 + 1.0
                stats["win_weight"] += wweight
                grz = region_zmax(max(gx0[gi], t_x0), max(gy0[gi], t_y0),
                                  min(gx1[gi], t_x1), min(gy1[gi], t_y1))
                if gzmin[gi] > grz:
                    stats["group_culled"] += 1
                    stats["win_weight_culled"] += wweight
                    if not chunk_culled:
                        stats["group_culled_chunklive"] += 1

    cv, cc = stats["chunk_visits"], stats["chunk_culled"]
    gv, gc = stats["group_visits"], stats["group_culled"]
    print(f"chunk visits {cv}, culled {cc} ({cc / max(cv, 1):.1%})")
    print(f"group visits {gv}, culled {gc} ({gc / max(gv, 1):.1%}) "
          f"[{stats['group_culled_chunklive']} in surviving chunks]")
    print(f"window-weighted visits {stats['win_weight']:.0f}, culled "
          f"{stats['win_weight_culled']:.0f} "
          f"({stats['win_weight_culled'] / max(stats['win_weight'], 1):.1%})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Sweep the raster stream ORDER (a data-only input) on the live chip.

The raster kernel is per-visit-overhead-bound (tools/raster_interleave_ab2),
and visits are driven by stream locality: the Morton sort puts consecutive
chunks in compact screen cells so the per-(chunk, tile) bbox prefilter and
the per-group window loops skip most of the screen. The sort key was never
swept — granularity 16 px was inherited from round 1, and column-supertile
mode (one program per tile COLUMN) suggests a column-major key could beat
Morton: a chunk that stays inside one tile column is DMA'd by exactly one
program.

Every variant is the SAME compiled raster program with a different perm
array (depth ties use original draw ids, so output is bit-identical across
all stream orders — asserted here). Cost per variant ~= 0 compiles.

    python tools/perm_sweep.py [--preset sponza]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from stage_probe import device_time

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import PallasFrameProgram
from vktf_tpu.ops.raster_pallas import _part1by1
from vktf_tpu.runtime.cache import enable_persistent_cache
from vktf_tpu.scene.flatten import flatten_assets
from bench import CAMERAS


def perm_from_key(key, valid, chunk):
    t = valid.shape[0]
    t_pad = -(-t // chunk) * chunk
    key = jnp.where(valid, key, jnp.int32(2**31 - 1))
    if t_pad != t:
        key = jnp.pad(key, (0, t_pad - t), constant_values=jnp.int32(2**31 - 1))
    return jnp.argsort(key)


def cells(setup, g):
    bbox = setup["bbox"]
    cx = jnp.clip((bbox[:, 0] + bbox[:, 2]) // (2 * g), 0, 1023)
    cy = jnp.clip((bbox[:, 1] + bbox[:, 3]) // (2 * g), 0, 1023)
    return cx, cy


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    enable_persistent_cache()
    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="pallas")
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp, cam_pos = camera.view_projection_transform, camera.position
    prog = PallasFrameProgram(meta, config)
    setup, _lights = prog._prepare(scene, vp, cam_pos)
    setup = jax.tree.map(jax.block_until_ready, setup)
    chunk = config.pallas_chunk
    th, tw = config.tile_shape

    def variants(setup):
        out = {}
        for g in (8, 16, 32, 64):
            cx, cy = cells(setup, g)
            out[f"morton{g}"] = _part1by1(cx) | (_part1by1(cy) << 1)
        # column-major: tile-column cells outer, Morton within the column
        for g in (16, 32):
            cx, cy = cells(setup, g)
            col = cx // max(tw // g, 1)
            out[f"colmaj{g}"] = (
                (col << 20) | _part1by1(cx % max(tw // g, 1))
                | (_part1by1(cy) << 1)
            )
        # band-major (y outer) for contrast
        cx, cy = cells(setup, 16)
        out["ymaj16"] = (cy << 10) | cx
        return out

    valid = setup["valid"]
    perms = {
        name: perm_from_key(key, valid, chunk)
        for name, key in variants(setup).items()
    }
    perms = {k: jax.block_until_ready(v) for k, v in perms.items()}

    # bit-equality across stream orders (depth ties use original ids)
    ref_name = "morton16"
    ref = jax.tree.map(np.asarray, prog._raster(setup, perms[ref_name]))
    for name, perm in perms.items():
        if name == ref_name:
            continue
        out = jax.tree.map(np.asarray, prog._raster(setup, perm))
        eq = all(np.array_equal(a, b)
                 for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)))
        print(f"{name}: equal={eq}", flush=True)
        assert eq, f"stream order {name} changed raster output"

    for _ in range(2):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

    res = {n: [] for n in perms}
    for name, perm in perms.items():  # warm probe path
        device_time(prog._raster, setup, perm, n=1, rpc_s=rpc_s)
    for rep in range(args.reps):
        for name, perm in perms.items():
            dt = device_time(prog._raster, setup, perm, n=args.frames,
                             rpc_s=rpc_s) * 1e3
            res[name].append(dt)
            print(f"rep{rep} raster[{name:9s}] {dt:7.2f} ms", flush=True)
    print({n: round(float(np.median(v)), 2) for n, v in res.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Per-stage timing of the PRODUCTION split-stage pallas frame program.

Unlike tools/profile_stages.py (which re-derives stages and predates the
kernel-shade path), this drives PallasFrameProgram's own jitted stage
functions, so the numbers are exactly the production pipeline's.

    python tools/profile_stages2.py --preset sponza
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from tbench import timeit, roundtrip_ms  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--shade-chunk", type=int, default=None)
    p.add_argument("--window-rows", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import PallasFrameProgram
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.scene.flatten import flatten_assets
    from bench import CAMERAS

    enable_persistent_cache()
    print(f"platform={jax.devices()[0].platform} roundtrip={roundtrip_ms():.1f} ms",
          flush=True)

    extra = {}
    if args.shade_chunk is not None:
        extra["shade_chunk"] = args.shade_chunk
    if args.window_rows is not None:
        extra["raster_window_rows"] = args.window_rows
    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="pallas",
                          pallas_interpret=args.cpu or None, **extra)
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp = camera.view_projection_transform
    cam_pos = camera.position
    prog = PallasFrameProgram(meta, config)
    print(f"tris={meta.num_triangles} fb={config.padded_width}x"
          f"{config.padded_height} msaa={args.msaa} layers={meta.peel_layers}",
          flush=True)

    t0 = time.perf_counter()
    prog.warmup(scene, vp, cam_pos)
    compile_s = time.perf_counter() - t0
    print(f"warmup (all stages) {compile_s:.1f} s", flush=True)

    results = {}
    n = args.frames
    t = timeit(prog._prepare, scene, vp, cam_pos, n=n, jit=False,
               label="prepare")
    results["prepare_ms"] = t * 1e3
    setup, lights = prog._prepare(scene, vp, cam_pos)

    t = timeit(prog._perm_fn, setup, n=n, jit=False, label="stream perm")
    results["perm_ms"] = t * 1e3
    perm = prog._perm_fn(setup)

    t = timeit(prog._raster, setup, perm, n=n, jit=False, label="raster")
    results["raster_ms"] = t * 1e3
    tri_id, depth = prog._raster(setup, perm)

    t = timeit(prog._table, setup, scene, n=n, jit=False, label="table build")
    results["table_ms"] = t * 1e3
    table = prog._table(setup, scene)

    if prog._two_phase:
        t = timeit(prog._shade_addr, tri_id, depth, table, n=n, jit=False,
                   label="shade addr (table gather)")
        results["shade_addr_ms"] = t * 1e3
        addr = prog._shade_addr(tri_id, depth, table)
        t = timeit(prog._shade_final, addr, scene, lights, cam_pos,
                   n=n, jit=False, label="shade final (pool+kernel)")
        results["shade_final_ms"] = t * 1e3
    else:
        t = timeit(prog._shade, tri_id, depth, table, scene, lights, cam_pos,
                   n=n, jit=False, label="shade+resolve")
        results["shade_ms"] = t * 1e3

    t = timeit(lambda: prog(scene, vp, cam_pos), n=n, jit=False,
               label="whole frame (chained)")
    results["frame_ms"] = t * 1e3
    results["compile_s"] = compile_s

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-STAGE interleaved A/B of two tile shapes on the production program.

frame_ab.py measured (128,128) raster 2 ms faster but ~22 ms slower
end-to-end; this localizes WHERE the loss sits (winner reduction? pixel
coords? shade chunking? assemble?) by timing each split-stage program for
both tile shapes in one process, interleaved.

    python tools/tile_stage_ab.py [--ta 64,128] [--tb 128,128]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ta", default="64,128")
    p.add_argument("--tb", default="128,128")
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import PallasFrameProgram
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.scene.flatten import flatten_assets
    from bench import CAMERAS
    from stage_probe import device_time

    enable_persistent_cache()
    scene, meta, _aux = flatten_assets(build_preset("sponza"))
    position, direction = CAMERAS["sponza"]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0), 1920 / 1080,
                                      0.1, 1.0e6))
    vp, cam_pos = camera.view_projection_transform, camera.position

    variants = {}
    frames_out = {}
    for name in ("ta", "tb"):
        ts = tuple(int(x) for x in getattr(args, name).split(","))
        config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                              backend="pallas", tile_shape=ts)
        prog = PallasFrameProgram(meta, config)
        t0 = time.time()
        out = prog.warmup(scene, vp, cam_pos)
        print(f"{name}={ts} warmup {time.time()-t0:.1f} s", flush=True)
        frames_out[name] = np.asarray(out)
        variants[name] = (ts, prog)

    same = np.array_equal(frames_out["ta"], frames_out["tb"])
    print(f"frames bit-equal: {same}", flush=True)

    # per-variant stage arg sets
    stage_sets = {}
    for name, (ts, prog) in variants.items():
        setup, lights = prog._prepare(scene, vp, cam_pos)
        perm = prog._perm_fn(setup)
        tri_id, depth = prog._raster(setup, perm)
        table = prog._table(setup, scene)
        stages = [
            ("raster", prog._raster, (setup, perm)),
        ]
        if prog._two_phase:
            addr = prog._shade_addr(tri_id, depth, table)
            stages += [
                ("shade_addr", prog._shade_addr, (tri_id, depth, table)),
                ("shade_final", prog._shade_final,
                 (addr, scene, lights, cam_pos)),
            ]
        else:
            stages += [("shade", prog._shade,
                        (tri_id, depth, table, scene, lights, cam_pos))]
        stages += [("frame", lambda s, v, c, pr=prog: pr(s, v, c),
                    (scene, vp, cam_pos))]
        stage_sets[name] = stages

    for _ in range(2):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

    for name, stages in stage_sets.items():
        for _n, fn, a in stages:
            device_time(fn, *a, n=1, rpc_s=rpc_s)

    results = {}
    for rep in range(args.reps):
        for name, stages in stage_sets.items():
            for sname, fn, a in stages:
                dt = device_time(fn, *a, n=args.frames, rpc_s=rpc_s)
                key = f"{sname}[{name}]"
                results.setdefault(key, []).append(dt * 1e3)
                print(f"rep{rep} {key:24s} {dt*1e3:8.2f} ms", flush=True)
    print("--- medians ---")
    for key, v in results.items():
        print(f"{key:24s} {np.median(v):8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

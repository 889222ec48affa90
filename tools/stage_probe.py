#!/usr/bin/env python
"""One-sync DEVICE stage timing of the production pallas frame program.

tools/profile_stages2.py times each stage with host syncs, which on this
machine's tunneled TPU folds a ~35 ms RPC round trip and co-tenant noise
into every number. This version uses bench.py's device-probe method per
stage: dispatch n repeats of ONE stage, fold a 128-lane reduction of its
output into an accumulator, sync once, subtract the measured no-op RPC.

    python tools/stage_probe.py --preset sponza
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def probe_leaf(x, acc):
    # ONE probe op per stage call: a dispatched program completes as a
    # unit, so leaf 0 ready implies the stage is done — and every extra
    # tiny op pays host->tunnel dispatch latency that inflates multi-leaf
    # stages (measured: per-leaf probing put the stage SUM 40% above the
    # chained frame time).
    import jax
    import jax.numpy as jnp

    v = jax.tree.leaves(x)[0]
    return acc + jnp.sum(v.ravel()[-64:].astype(jnp.float32))


def device_time(fn, *args, n: int, rpc_s: float) -> float:
    """Median-free single-sync loop: n dispatches, one host sync."""
    import jax.numpy as jnp

    acc = jnp.zeros((), jnp.float32)
    np.asarray(acc)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        acc = probe_leaf(out, acc)
    np.asarray(acc)
    return (time.time() - t0 - rpc_s) / n


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--window-rows", type=int, default=None)
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

    enable_persistent_cache()
    extra = {}
    if args.window_rows is not None:
        extra["raster_window_rows"] = args.window_rows
    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="pallas", **extra)
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp, cam_pos = camera.view_projection_transform, camera.position
    prog = PallasFrameProgram(meta, config)
    print(f"tris={meta.num_triangles} layers={meta.peel_layers}", flush=True)

    t0 = time.time()
    prog.warmup(scene, vp, cam_pos)
    print(f"warmup {time.time()-t0:.1f} s", flush=True)

    setup, lights = prog._prepare(scene, vp, cam_pos)
    perm = prog._perm_fn(setup)
    stages = [
        ("prepare", prog._prepare, (scene, vp, cam_pos)),
        ("perm", prog._perm_fn, (setup,)),
    ]
    if getattr(prog, "_prestream", False):
        # pre-permuted stream path (config.raster_prestream): per-frame
        # stream pass + perm-less raster; "restream" is the RESORT-time
        # input re-gather (amortized over the resort interval)
        state = prog._maybe_restream(scene, setup, vp)
        stream = prog._stream_cam(*state, vp)
        tri_id, depth = prog._raster_stream(stream)
        _mrows, mrowsT, _l, _a = prog._maybe_scene_update(scene)
        stages += [
            ("restream", prog._perm_inputs,
             (scene.tri_corner, mrowsT, perm)),
            ("stream", prog._stream_cam, (*state, vp)),
            ("raster", prog._raster_stream, (stream,)),
        ]
    else:
        tri_id, depth = prog._raster(setup, perm)
        stages += [("raster", prog._raster, (setup, perm))]
    table = prog._table(setup, scene)
    stages += [
        ("table", prog._table, (setup, scene)),
    ]
    if prog._two_phase:
        addr = prog._shade_addr(tri_id, depth, table)
        stages += [
            ("shade_addr", prog._shade_addr, (tri_id, depth, table)),
            ("shade_final", prog._shade_final, (addr, scene, lights, cam_pos)),
        ]
    else:
        stages += [("shade", prog._shade,
                    (tri_id, depth, table, scene, lights, cam_pos))]
    stages += [("frame", lambda s, v, c: prog(s, v, c), (scene, vp, cam_pos))]

    # no-op RPC cost
    for _ in range(2):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

    # warm each probe program once
    for name, fn, a in stages:
        device_time(fn, *a, n=1, rpc_s=rpc_s)

    results = {}
    for rep in range(args.reps):
        for name, fn, a in stages:
            dt = device_time(fn, *a, n=args.frames, rpc_s=rpc_s)
            results.setdefault(name, []).append(dt * 1e3)
            print(f"rep{rep} {name:12s} {dt*1e3:8.2f} ms", flush=True)
    print(json.dumps({k: round(min(v), 2) for k, v in results.items()}))

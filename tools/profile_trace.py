#!/usr/bin/env python
"""Capture a jax.profiler device trace of the production frame stages.

Writes a trace to /tmp/vktf_trace; if the tunneled device supports
profiling, the trace.json.gz events give per-op device times.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--outdir", default="/tmp/vktf_trace")
    args = p.parse_args()

    import jax

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import PallasFrameProgram
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.scene.flatten import flatten_assets
    from bench import CAMERAS

    enable_persistent_cache()
    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="pallas")
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp = camera.view_projection_transform
    cam_pos = camera.position
    prog = PallasFrameProgram(meta, config)
    t0 = time.perf_counter()
    out = prog.warmup(scene, vp, cam_pos)
    print(f"warmup {time.perf_counter() - t0:.1f} s", flush=True)

    with jax.profiler.trace(args.outdir):
        for _ in range(3):
            out = prog(scene, vp, cam_pos)
        np.asarray(out)
    print("trace written", flush=True)


if __name__ == "__main__":
    main()

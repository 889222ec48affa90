#!/usr/bin/env python
"""Same-process whole-frame A/B of two RenderConfig variants.

Interleaved one-sync device loops over the split-stage frame program, so
tunnel swings hit both variants equally. Usage:

    python tools/frame_ab.py tile_shape=64,128 tile_shape=128,128
    python tools/frame_ab.py raster_group_size=16 raster_group_size=8
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops.pipeline import PallasFrameProgram
from vktf_tpu.runtime.cache import enable_persistent_cache
from vktf_tpu.scene.flatten import flatten_assets
from bench import CAMERAS


def parse_variant(spec: str) -> dict:
    out = {}
    for kv in spec.split(";"):
        k, v = kv.split("=")
        if k == "tile_shape":
            out[k] = tuple(int(x) for x in v.split(","))
        elif k in ("shading_rate", "shade_impl", "backend"):
            out[k] = v
        elif k in ("max_anisotropy", "resort_threshold"):
            out[k] = float(v)
        else:
            out[k] = int(v)
    return out


def main() -> int:
    argv = sys.argv[1:]
    preset, width, height, msaa = "sponza", 1920, 1080, 4
    specs = []
    for a in argv:  # --preset=X / --size=WxH ride alongside variant specs
        if a.startswith("--preset="):
            preset = a.split("=", 1)[1]
        elif a.startswith("--size="):
            width, height = (int(v) for v in a.split("=", 1)[1].split("x"))
        else:
            specs.append(a)
    specs = specs or ["tile_shape=64,128", "tile_shape=128,128"]
    enable_persistent_cache()
    scene, meta, _aux = flatten_assets(build_preset(preset))
    position, direction = CAMERAS[preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0), width / height,
                                      0.1, 1.0e6))
    vp, cam_pos = camera.view_projection_transform, camera.position
    print(f"tris={meta.num_triangles} layers={meta.peel_layers}", flush=True)

    progs = []
    for spec in specs:
        config = RenderConfig(width=width, height=height, msaa_samples=msaa,
                              backend="pallas", **parse_variant(spec))
        prog = PallasFrameProgram(meta, config)
        t0 = time.time()
        prog.warmup(scene, vp, cam_pos)
        print(f"[{spec}] warmup {time.time()-t0:.1f} s", flush=True)
        progs.append((spec, prog))

    # output equality (cropped frames)
    frames = [np.asarray(prog(scene, vp, cam_pos)) for _, prog in progs]
    for (spec, _), f in zip(progs[1:], frames[1:]):
        eq = np.array_equal(frames[0], f)
        md = int(np.abs(frames[0].astype(np.int32) - f.astype(np.int32)).max())
        print(f"[{spec}] frame equal={eq} maxdiff={md}", flush=True)

    for _ in range(2):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

    N = 12
    results = {spec: [] for spec, _ in progs}
    for rep in range(3):
        for spec, prog in progs:
            acc = jnp.zeros((), jnp.float32)
            np.asarray(acc)
            t0 = time.time()
            for _ in range(N):
                frame = prog(scene, vp, cam_pos)
                acc = acc + jnp.sum(frame.ravel()[-64:].astype(jnp.float32))
            np.asarray(acc)
            dt = (time.time() - t0 - rpc_s) / N * 1e3
            results[spec].append(dt)
            print(f"rep{rep} [{spec}] {dt:7.2f} ms", flush=True)
    print({spec: round(min(v), 2) for spec, v in results.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""4K shade_final A/B: 96-lane pool rows vs 128-lane re-pad.

The 4K flythrough shade_final probe jumped 66 -> ~218 ms between rounds;
the only pool delta is the 96-lane row storage (commit 93acf54, measured
faster at 1080p). 218 is ~6.6x the proportional scale-up — the HBM-vs-
VMEM gather ratio — so the suspicion is that the 96-lane (non-pow2-lane)
operand stops XLA from staging the pool in VMEM at 4K's gather volume.
This times the production shade_final with the pool as stored (96) vs
zero-padded back to 128 lanes (identical texel bits; qw is read from the
array, taps touch lanes <= 95, so output must be bit-equal).

    python tools/pool_width4k_ab.py [--size=3840x2160]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main() -> int:
    width, height, preset = 3840, 2160, "flythrough"
    for a in sys.argv[1:]:
        if a.startswith("--size="):
            width, height = (int(v) for v in a.split("=", 1)[1].split("x"))
        elif a.startswith("--preset="):
            preset = a.split("=", 1)[1]

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
    config = RenderConfig(width=width, height=height, msaa_samples=4,
                          backend="pallas")
    scene, meta, _aux = flatten_assets(build_preset(preset))
    position, direction = CAMERAS[preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0), width / height,
                                      0.1, 1.0e6))
    vp, cam_pos = camera.view_projection_transform, camera.position
    qp = scene.quad_pool
    print(f"tris={meta.num_triangles} layers={meta.peel_layers} "
          f"pool={qp.shape} ({qp.size * 2 / 2**20:.1f} MiB live)", flush=True)

    prog = PallasFrameProgram(meta, config)
    t0 = time.time()
    prog.warmup(scene, vp, cam_pos)
    print(f"warmup {time.time()-t0:.1f} s", flush=True)
    assert prog._two_phase

    pad = 128 - qp.shape[1]
    scene128 = dataclasses.replace(
        scene, quad_pool=jnp.pad(qp, ((0, 0), (0, pad))))

    setup, lights = prog._prepare(scene, vp, cam_pos)
    perm = prog._perm_fn(setup)
    tri_id, depth = prog._raster(setup, perm)
    table = prog._table(setup, scene)
    addr = prog._shade_addr(tri_id, depth, table)

    a = np.asarray(prog._shade_final(addr, scene, lights, cam_pos))
    b = np.asarray(prog._shade_final(addr, scene128, lights, cam_pos))
    print(f"bit-equal: {np.array_equal(a, b)}", flush=True)

    for _ in range(2):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

    res = {"w96": [], "w128": []}
    for rep in range(4):
        for name, sc in (("w96", scene), ("w128", scene128)):
            dt = device_time(prog._shade_final, addr, sc, lights, cam_pos,
                             n=6, rpc_s=rpc_s)
            res[name].append(dt * 1e3)
            print(f"rep{rep} shade_final[{name}] {dt*1e3:8.2f} ms",
                  flush=True)
    for name, v in res.items():
        print(f"median {name:5s} {np.median(v):8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""4K two-phase shade chunking A/B: 4x 2^21-px chunks (default) vs ONE
2^23-px chunk.

Hypothesis (from tools/gather_scale_ab.py): per-index row-gather cost is
flat ~2 ns from a VMEM-staged table, yet the 4K shade_addr stage measures
~4.2 ns/idx — if XLA re-stages the 67 MB table into VMEM once per unrolled
chunk call, 4 chunks pay 4 stagings and one big chunk should reclaim them.
The chunks exist only to bound the phase-boundary working set
(pipeline._TWO_PHASE_CHUNK); at 4K the one-chunk boundary is ~2.1 GB of
HBM, fine on 16 GB.

Method: two PallasFrameProgram instances (the module constant is patched
between constructions), bit-equality check, then interleaved single-sync
device timing of shade_addr / shade_final / whole frame.

    python tools/shade_chunk4k_ab.py --preset flythrough --width 3840 --height 2160
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from stage_probe import device_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="flythrough")
    p.add_argument("--width", type=int, default=3840)
    p.add_argument("--height", type=int, default=2160)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--big-chunk", type=int, default=1 << 23)
    args = p.parse_args()

    import jax.numpy as jnp

    import vktf_tpu.ops.pipeline as pl
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
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
    vp, cam_pos = camera.view_projection_transform, camera.position

    default_chunk = pl._TWO_PHASE_CHUNK
    progs = {}
    for name, chunk in (("chunked", default_chunk), ("one", args.big_chunk)):
        pl._TWO_PHASE_CHUNK = chunk
        progs[name] = pl.PallasFrameProgram(meta, config)
        t0 = time.time()
        progs[name].warmup(scene, vp, cam_pos)
        print(f"warmup[{name}] chunk={chunk} {time.time()-t0:.1f} s",
              flush=True)
    pl._TWO_PHASE_CHUNK = default_chunk

    fa = np.asarray(progs["chunked"](scene, vp, cam_pos))
    fb = np.asarray(progs["one"](scene, vp, cam_pos))
    print(f"bit-equal: {bool(np.array_equal(fa, fb))}", flush=True)

    # stage inputs (shared; both variants consume the same raster output)
    prog = progs["chunked"]
    setup, lights = prog._prepare(scene, vp, cam_pos)
    perm = prog._perm_fn(setup)
    tri_id, depth = prog._raster(setup, perm)
    table = prog._table(setup, scene)
    addr = {n: progs[n]._shade_addr(tri_id, depth, table) for n in progs}

    # no-op RPC cost (warm first: stage_probe method)
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    for _ in range(4):
        np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpc_s = (time.time() - t0) / 4
    print(f"rpc {rpc_s*1e3:.1f} ms", flush=True)

    rows = {}
    for n in progs:
        rows[f"addr[{n}]"] = (progs[n]._shade_addr, (tri_id, depth, table))
        rows[f"final[{n}]"] = (
            progs[n]._shade_final, (addr[n], scene, lights, cam_pos))
        rows[f"frame[{n}]"] = (progs[n], (scene, vp, cam_pos))

    meds = {k: [] for k in rows}
    for _ in range(args.reps):
        for name, (fn, fargs) in rows.items():
            dt = device_time(fn, *fargs, n=args.frames, rpc_s=rpc_s)
            meds[name].append(dt * 1e3)
    for name, ts in meds.items():
        print(f"  {name:>16}: {float(np.median(ts)):7.2f} ms   "
              f"all={['%.1f' % t for t in ts]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Joint (interleave m, group_size, window_rows) raster sweep on the chip.

The m=2 lane interleave changed the visit economics (narrower windows match
small bboxes, so the wasted-lane argument that picked GS=8 at m=1 may no
longer bind) — re-sweep group size and window rows under it, interleaved
reps for tunnel-variance robustness.

    python tools/raster_mgw_sweep.py
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax

from tbench import timeit, roundtrip_ms

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops import raster_pallas as rp

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position
ph, pw = config.padded_height, config.padded_width

print(f"roundtrip {roundtrip_ms():.1f} ms", flush=True)
setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)
perm = jax.block_until_ready(
    jax.jit(lambda s: rp.stream_perm(s, chunk=config.pallas_chunk))(setup))

# (m, group_size, window_rows)
CASES = [
    (2, 8, 32),    # current default
    (2, 16, 32),
    (2, 4, 32),
    (2, 8, 64),
    (2, 16, 64),
    (2, 8, 16),
    (2, 8, 128),
    (4, 16, 32),
    (1, 8, 32),    # m=1 reference
]
fns = {}
for m, gs, win in CASES:
    fns[(m, gs, win)] = jax.jit(
        lambda su, p, m=m, g=gs, w=win: rp.rasterize_pallas(
            su, ph, pw, tile_shape=config.tile_shape,
            msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
            interpret=False, sort="none", perm=p, window_rows=w,
            group_size=g, interleave=m))

outs = {}
for case, fn in fns.items():
    outs[case] = jax.tree.map(np.asarray, fn(setup, perm))
    print(f"compiled {case}", flush=True)
base_id, base_d = outs[(1, 8, 32)]
H = config.height
for case in CASES:
    if case == (1, 8, 32):
        continue
    gid, gd = outs[case]
    same_vis = (np.array_equal(base_id[:, :H], gid[:, :H])
                and np.array_equal(base_d[:, :H], gd[:, :H]))
    print(f"m={case[0]} gs={case[1]} win={case[2]}: visible bit-identical="
          f"{same_vis}", flush=True)

results = {c: [] for c in CASES}
for rep in range(6):
    for case in CASES:
        dt = timeit(fns[case], setup, perm, n=4, warmup=1,
                    label=f"m={case[0]} gs={case[1]} win={case[2]} rep{rep}")
        results[case].append(dt * 1e3)
print("\nmedian / best (ms):")
for case, ts in results.items():
    print(f"  m={case[0]} gs={case[1]:2d} win={case[2]:3d}: "
          f"median={np.median(ts):6.2f} best={min(ts):6.2f}")

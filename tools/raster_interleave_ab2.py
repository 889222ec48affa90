#!/usr/bin/env python
"""Focused A/B: interleave m=1/win=32 vs m=2/win=32 vs m=4/win=32.

Alternating 6-rep measurement + VISIBLE-region bit-equality (padding rows
below the 1080-row clip legitimately differ across window geometries and
are cropped before present — raster_pallas._raster_kernel docstring).
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

CASES = [(1, 32), (2, 32), (4, 32)]
fns = {}
for m, win in CASES:
    fns[(m, win)] = jax.jit(lambda su, p, m=m, w=win: rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        interpret=False, sort="none", perm=p, window_rows=w, interleave=m))

outs = {}
for case, fn in fns.items():
    outs[case] = jax.tree.map(np.asarray, fn(setup, perm))
base_id, base_d = outs[(1, 32)]
H = config.height
for case in CASES[1:]:
    gid, gd = outs[case]
    same_vis = (np.array_equal(base_id[:, :H], gid[:, :H])
                and np.array_equal(base_d[:, :H], gd[:, :H]))
    diff_pad = int((base_id != gid).sum())
    print(f"m={case[0]} win={case[1]}: visible-region bit-identical="
          f"{same_vis}  total differing samples incl. padding={diff_pad}",
          flush=True)

results = {c: [] for c in CASES}
for rep in range(6):
    for case in CASES:
        dt = timeit(fns[case], setup, perm, n=4, warmup=1,
                    label=f"m={case[0]} win={case[1]} rep{rep}")
        results[case].append(dt * 1e3)
print("\nmedian / best (ms):")
for case, ts in results.items():
    print(f"  m={case[0]} win={case[1]}: median={np.median(ts):6.2f} "
          f"best={min(ts):6.2f}")

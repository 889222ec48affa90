#!/usr/bin/env python
"""A/B the raster lane interleave (m) x window rows on the live chip.

Same-process interleaved measurement at sponza 1080p 4xMSAA (tunnel
variance policy: README performance rules #8). Checks bit-equality of the
assembled (S, H, W) outputs against the m=1 baseline as it goes.
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

print(f"roundtrip {roundtrip_ms():.1f} ms; tris={meta.num_triangles}",
      flush=True)

setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)
perm = jax.block_until_ready(
    jax.jit(lambda s: rp.stream_perm(s, chunk=config.pallas_chunk))(setup))

CASES = [(1, 32), (1, 16)]
for m in (2, 4, 8):
    for win in (8, 16, 32):
        if (256 // m) % win == 0 and win <= 256 // m:
            CASES.append((m, win))

base = None
results = {}
for rep in range(2):  # interleaved repeats guard against tunnel drift
    for m, win in CASES:
        fn = jax.jit(lambda su, p, m=m, w=win: rp.rasterize_pallas(
            su, ph, pw, tile_shape=config.tile_shape,
            msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
            interpret=False, sort="none", perm=p,
            window_rows=w, interleave=m))
        dt = timeit(fn, setup, perm, n=4,
                    label=f"raster m={m:2d} win={win:2d} rep{rep}")
        results.setdefault((m, win), []).append(dt * 1e3)
        if rep == 0:
            out = jax.tree.map(np.asarray, fn(setup, perm))
            if m == 1 and win == 32:
                base = out
            elif base is not None:
                same = all(np.array_equal(a, b) for a, b in zip(base, out))
                print(f"   bit-identical vs m=1/win=32: {same}", flush=True)

print("\nbest-of-reps (ms):")
for (m, win), ts in sorted(results.items(), key=lambda kv: min(kv[1])):
    print(f"  m={m:2d} win={win:2d}  {min(ts):7.2f}  (reps {ts})")

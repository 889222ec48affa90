#!/usr/bin/env python
"""Sweep raster kernel window_rows/chunk/tile at sponza 1080p 4xMSAA (TPU).

Production call form (assemble=False, morton sort, scene peel layers).
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

scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position
print(f"roundtrip {roundtrip_ms():.1f} ms; tris={meta.num_triangles} "
      f"layers={meta.peel_layers}", flush=True)

base = RenderConfig(width=1920, height=1080, msaa_samples=4)
setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=base)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)

configs = [
    # (tile_shape, chunk, window_rows, layers)
    ((64, 128), 256, 32, meta.peel_layers),   # production default
    ((64, 128), 256, 16, meta.peel_layers),
    ((64, 128), 256, 64, meta.peel_layers),
    ((64, 128), 512, 32, meta.peel_layers),
    ((64, 128), 128, 32, meta.peel_layers),
    ((128, 128), 256, 32, meta.peel_layers),
    ((32, 128), 256, 32, meta.peel_layers),
    ((64, 128), 256, 32, 1),                  # peel cost isolation
]

for rep in range(2):
    for tile_shape, chunk, wrows, layers in configs:
        th, tw = tile_shape
        ph = -(-1080 // th) * th
        pw = -(-1920 // tw) * tw
        fn = jax.jit(
            lambda su, t=tile_shape, c=chunk, w=wrows, L=layers, p=(ph, pw):
            rp.rasterize_pallas(su, p[0], p[1], tile_shape=t,
                                msaa_samples=4, chunk=c, interpret=False,
                                sort="morton", layers=L, window_rows=w,
                                assemble=False))
        try:
            timeit(fn, setup, n=6,
                   label=f"rep{rep} tile={tile_shape} chunk={chunk} "
                         f"win={wrows} layers={layers}")
        except Exception as e:
            print(f"tile={tile_shape} chunk={chunk} win={wrows}: "
                  f"{type(e).__name__}: {e}"[:160], flush=True)

#!/usr/bin/env python
"""Raster-stage config sweep at 1080p Sponza: window_rows x tile_h x chunk.

Same-process A/B (tunnel contention makes cross-process numbers
incomparable). Raster only — shading excluded.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
from tbench import timeit, roundtrip_ms

from vktf_tpu.config import RenderConfig
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops.raster_pallas import rasterize_pallas
from bench import CAMERAS

print(f"roundtrip {roundtrip_ms():.1f} ms", flush=True)
g = jnp.zeros((4096, 4096), jnp.bfloat16)
timeit(lambda a: a @ a, g, label="gauge: 4096^3 bf16 matmul (~0.7ms clean)")

scene, meta, aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))

for th in (32, 64, 128):
    config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                          backend="pallas", tile_shape=(th, 128))
    setup, bins, lights, world, inst_matrix = prepare_frame(
        scene, camera.view_projection_transform, camera.position,
        meta=meta, config=config)
    setup = {k: v for k, v in setup.items()}
    ph, pw = config.padded_height, config.padded_width

    for win in (16, 32, 64):
        if win > th * 4:
            continue
        for chunk in (128, 256, 512):
            fn = jax.jit(lambda su, w=win, c=chunk, t=th: rasterize_pallas(
                su, ph, pw, tile_shape=(t, 128), msaa_samples=4,
                chunk=c, sort="morton", layers=1, window_rows=w,
                assemble=False))
            try:
                timeit(fn, setup, n=5,
                       label=f"th={th} win={win} chunk={chunk}")
            except Exception as e:  # noqa: BLE001
                print(f"th={th} win={win} chunk={chunk} FAILED: "
                      f"{type(e).__name__}", flush=True)

timeit(lambda a: a @ a, g, label="gauge again")

#!/usr/bin/env python
"""A/B the raster kernel variants + isolate prep vs kernel (run on TPU)."""
from __future__ import annotations

import importlib.util
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from tbench import timeit, roundtrip_ms

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops import raster_pallas as rp_new

spec = importlib.util.spec_from_file_location("rp_old", "/tmp/raster_old.py")
rp_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rp_old)

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position
ph, pw = config.padded_height, config.padded_width

print(f"roundtrip {roundtrip_ms():.1f} ms; tris={meta.num_triangles}", flush=True)

setup = jax.jit(
    lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)

for name, mod, sort in (("old morton", rp_old, "morton"),
                        ("old nosort", rp_old, "none"),
                        ("new static", rp_new, "static"),
                        ("new morton", rp_new, "morton")):
    fn = jax.jit(lambda su, m=mod, s=sort: m.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        interpret=False, sort=s))
    timeit(fn, setup, n=6, label=f"rasterize {name}")

# prep only (everything before pallas_call) for the new static path:
def prep_only(su):
    tri_data = rp_new.pack_tri_data(su, None)
    tri_data = rp_new._pad_cols(tri_data, config.pallas_chunk)
    return tri_data

timeit(jax.jit(prep_only), setup, n=6, label="prep: pack_tri_data only")

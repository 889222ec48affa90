#!/usr/bin/env python
"""A/B: bbox-size class in the stream sort key's low bits.

Groups form on the sorted stream (8 consecutive triangles), and the window
loop covers the GROUP's y span: one tall triangle in a group makes the 7
small ones evaluate over its full window range (the body is branchless).
Appending a size class below the Morton cell key makes groups
size-homogeneous within each screen cell — zero kernel changes, and output
is bit-identical by construction (depth ties stay lexicographic on the
ORIGINAL ids, which the perm does not alter).

MEASURED (live v5e, 5 interleaved reps): base(g16) median 27.65 / best
26.62 ms; size2(g16) 27.29/26.60; size3(g16) 27.96/26.48; coarser Morton
cells with classes (g32/g64) are ~1.5 ms WORSE. NEGATIVE: a wash — group
spans are already homogeneous enough under 16px Morton cells that
size-classing recovers nothing; not adopted.

    python tools/sortkey_size_ab.py
"""
from __future__ import annotations

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
from vktf_tpu.ops import raster_pallas as rp
from vktf_tpu.ops.raster_pallas import _part1by1

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


def perm_sized(setup, g: int, size_bits: int, chunk: int = 256):
    bbox = setup["bbox"]
    valid = setup["valid"]
    t = valid.shape[0]
    t_pad = -(-t // chunk) * chunk
    cx = jnp.clip((bbox[:, 0] + bbox[:, 2]) // (2 * g), 0, 1023)
    cy = jnp.clip((bbox[:, 1] + bbox[:, 3]) // (2 * g), 0, 1023)
    key = _part1by1(cx) | (_part1by1(cy) << 1)
    if size_bits:
        h = jnp.maximum(bbox[:, 3] - bbox[:, 1], 1)
        w = jnp.maximum(bbox[:, 2] - bbox[:, 0], 1)
        ext = jnp.maximum(h, w)
        # class ~ log2(extent/8), clamped to size_bits
        cls = jnp.clip(
            jnp.ceil(jnp.log2(ext.astype(jnp.float32) / 8.0)), 0,
            (1 << size_bits) - 1).astype(jnp.int32)
        key = (key << size_bits) | cls
    key = jnp.where(valid, key, jnp.int32(2**31 - 1))
    if t_pad != t:
        key = jnp.pad(key, (0, t_pad - t), constant_values=jnp.int32(2**31 - 1))
    return jnp.argsort(key)


CASES = {
    "base(g16)": lambda s: rp.stream_perm(s, chunk=config.pallas_chunk),
    "size2(g16)": lambda s: perm_sized(s, 16, 2),
    "size3(g16)": lambda s: perm_sized(s, 16, 3),
    "size2(g32)": lambda s: perm_sized(s, 32, 2),
    "size3(g64)": lambda s: perm_sized(s, 64, 3),
}

perms = {k: jax.block_until_ready(jax.jit(fn)(setup))
         for k, fn in CASES.items()}

raster = jax.jit(lambda su, p: rp.rasterize_pallas(
    su, ph, pw, tile_shape=config.tile_shape,
    msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
    interpret=False, sort="none", perm=p,
    interleave=config.resolved_interleave()))

outs = {}
for k in CASES:
    outs[k] = jax.tree.map(np.asarray, raster(setup, perms[k]))
    print(f"compiled/ran {k}", flush=True)
H = config.height
bid, bd = outs["base(g16)"]
for k in CASES:
    if k == "base(g16)":
        continue
    gid, gd = outs[k]
    same = (np.array_equal(bid[:, :H], gid[:, :H])
            and np.array_equal(bd[:, :H], gd[:, :H]))
    print(f"{k}: visible bit-identical={same}", flush=True)

results = {k: [] for k in CASES}
for rep in range(6):
    for k in CASES:
        dt = timeit(raster, setup, perms[k], n=4, warmup=1,
                    label=f"{k} rep{rep}")
        results[k].append(dt * 1e3)
print("\nmedian / best (ms):")
for k, ts in results.items():
    print(f"  {k:12s} median={np.median(ts):6.2f} best={min(ts):6.2f}")

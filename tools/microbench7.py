#!/usr/bin/env python
"""Decompose the deferred-shade stage at sponza scale on the live chip.

Run AFTER a perf regression to localize: gauge (contention), table gather,
pool gathers, filter arithmetic, full shade chunk map.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
from tbench import timeit, roundtrip_ms

from vktf_tpu.config import RenderConfig
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.shade_table import (
    gather_rows, gather_table_f32, shade_table_samples,
)

print(f"roundtrip {roundtrip_ms():.1f} ms", flush=True)
# contention gauge: 4096^3 bf16 matmul, ~0.7 ms uncontended on v5e
a = jnp.zeros((4096, 4096), jnp.bfloat16)
timeit(lambda a: a @ a, a, label="gauge: 4096^3 bf16 matmul (~0.7ms clean)")

scene, meta, aux = flatten_assets(build_preset("sponza"))
T = meta.num_triangles
N = 1 << 21  # ~2M samples (1080p pixel-rate)
key = jax.random.PRNGKey(0)
tri = jax.random.randint(key, (N,), 0, T, jnp.int32)
prow = jax.random.randint(key, (N,), 0, scene.quad_pool.shape[0], jnp.int32)
table = jnp.zeros((T, 128), jnp.uint16)
sx = jax.random.uniform(key, (N,), jnp.float32) * 1920.0
sy = jax.random.uniform(key, (N,), jnp.float32) * 1080.0

timeit(lambda t, i: gather_rows(t, i), table, tri,
       label=f"table row gather ({T}x128 u16, {N} idx)")
timeit(lambda t, i: gather_table_f32(t, i), tri=None if False else table, i=tri,
       label="table gather + f32 reconstruct") if False else None
timeit(lambda t, i: gather_table_f32(t, i), table, tri,
       label="table gather + f32 reconstruct")
timeit(lambda q, i: gather_rows(q, i), scene.quad_pool, prow,
       label=f"pool row gather ({scene.quad_pool.shape} u16)")

lights = jnp.zeros((meta.num_lights, 8), jnp.float32)
background = jnp.zeros((4,), jnp.float32)
cam = jnp.zeros((3,), jnp.float32)


def shade_flat(tri, sx, sy, table, qp):
    chunk = 1 << 19
    def one(args):
        t, x, y = args
        return shade_table_samples(t, x, y, table, qp, cam, lights,
                                   background, max_anisotropy=16.0)
    return jax.lax.map(
        one, (tri.reshape(-1, chunk), sx.reshape(-1, chunk),
              sy.reshape(-1, chunk)))


# use the REAL per-frame table so planes/material columns are realistic
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops.shade_table import build_shade_table_pallas
from vktf_tpu.mathx import Camera, ViewFrustumParams
from bench import CAMERAS

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
prep = jax.jit(lambda s, v, c: prepare_frame(
    s, v, c, meta=meta, config=config)[0])
setup = prep(scene, camera.view_projection_transform, camera.position)
tbl_fn = jax.jit(lambda su, sc: build_shade_table_pallas(su, sc, None))
real_table = tbl_fn(setup, scene)
np.asarray(real_table[:1])

timeit(shade_flat, tri, sx, sy, real_table, scene.quad_pool, n=6,
       label=f"full shade chunk map ({N} samples, aniso16)")

# aniso off comparison
def shade_flat_a1(tri, sx, sy, table, qp):
    chunk = 1 << 19
    def one(args):
        t, x, y = args
        return shade_table_samples(t, x, y, table, qp, cam, lights,
                                   background, max_anisotropy=1.0)
    return jax.lax.map(
        one, (tri.reshape(-1, chunk), sx.reshape(-1, chunk),
              sy.reshape(-1, chunk)))

timeit(shade_flat_a1, tri, sx, sy, real_table, scene.quad_pool, n=6,
       label="full shade chunk map (aniso off)")

timeit(lambda a: a @ a, a, label="gauge again (contention drift check)")

#!/usr/bin/env python
"""Decompose the kernel-shade path: gathers alone, kernel alone, full chain.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import functools
import jax
import jax.numpy as jnp
from tbench import timeit, roundtrip_ms

from vktf_tpu.config import RenderConfig
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.ops.pipeline import prepare_frame
from vktf_tpu.ops.shade_table import (
    ROW, build_shade_table_pallas, gather_rows, pool_row_indices)
from vktf_tpu.ops import shade_kernel as sk
from bench import CAMERAS

print(f"roundtrip {roundtrip_ms():.1f} ms", flush=True)
g = jnp.zeros((4096, 4096), jnp.bfloat16)
timeit(lambda a: a @ a, g, label="gauge: 4096^3 bf16 matmul (~0.7ms clean)")

scene, meta, aux = flatten_assets(build_preset("sponza"))
T = meta.num_triangles
N = 1 << 21
key = jax.random.PRNGKey(0)
tri = jax.random.randint(key, (N,), 0, T, jnp.int32)
sx = jax.random.uniform(key, (N,), jnp.float32) * 1920.0
sy = jax.random.uniform(jax.random.PRNGKey(7), (N,), jnp.float32) * 1080.0
# Morton-ish coherent variant: sorted sample positions, coherent tri ids
tri_coh = jnp.sort(tri)
sx_coh = jnp.sort(sx)

config = RenderConfig(width=1920, height=1080, msaa_samples=4, backend="pallas")
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
setup, bins, lights, world, inst_matrix = prepare_frame(
    scene, camera.view_projection_transform, camera.position,
    meta=meta, config=config)
table = jax.jit(
    lambda su, sc: build_shade_table_pallas(dict(su), sc, None)
)(setup, scene)
np.asarray(table[:1])
cam = camera.position
pool = scene.quad_pool
print("table rows", table.shape, "pool rows", pool.shape, flush=True)

CHUNK = 1 << 19


def chunked(fn):
    def run(tri, sx, sy):
        return jax.lax.map(
            lambda a: fn(*a),
            (tri.reshape(-1, CHUNK), sx.reshape(-1, CHUNK),
             sy.reshape(-1, CHUNK)))
    return run


def gathers_only(t, x, y):
    trow = gather_rows(table, jnp.maximum(t, 0))

    def colx(c):
        chi = trow[:, c].astype(jnp.uint32) << 16
        clo = trow[:, ROW + c].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(chi | clo, jnp.float32)

    r0, r1 = pool_row_indices(colx, x, y, 16.0, slot=0)
    q0 = gather_rows(pool, r0)
    q1 = gather_rows(pool, r1)
    # cheap consume: one lane each
    return (trow[:, 0].astype(jnp.int32) + q0[:, 0].astype(jnp.int32)
            + q1[:, 0].astype(jnp.int32))


def table_gather_only(t, x, y):
    trow = gather_rows(table, jnp.maximum(t, 0))
    return trow[:, 0].astype(jnp.int32)


timeit(chunked(table_gather_only), tri, sx, sy, n=6,
       label="1 table gather only")
timeit(chunked(gathers_only), tri, sx, sy, n=6,
       label="3 gathers + addr math only")
timeit(chunked(gathers_only), tri_coh, sx_coh, sy, n=6,
       label="3 gathers, coherent ids")

kf = chunked(lambda t, x, y: sk.shade_table_layer_kernel(
    t, x, y, table, pool, cam, lights, max_anisotropy=16.0, block=1024)[:2])
timeit(kf, tri, sx, sy, n=6, label="full kernel path (random)")
timeit(kf, tri_coh, sx_coh, sy, n=6, label="full kernel path (coherent)")
timeit(lambda a: a @ a, g, label="gauge again")

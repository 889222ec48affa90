#!/usr/bin/env python
"""A/B the XLA deferred shade vs the single-kernel Pallas shade on the chip
at Sponza scale (2^21 random samples), with a block-size sweep.
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
from vktf_tpu.ops.shade_table import build_shade_table_pallas, shade_table_layer
from vktf_tpu.ops.shade_kernel import shade_table_layer_kernel
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

CHUNK = 1 << 19


def chunked(layer_fn):
    def run(tri, sx, sy):
        def one(args):
            t, x, y = args
            rgb, a, _c = layer_fn(t, x, y)
            return rgb, a
        return jax.lax.map(
            one, (tri.reshape(-1, CHUNK), sx.reshape(-1, CHUNK),
                  sy.reshape(-1, CHUNK)))
    return run


xla_fn = chunked(lambda t, x, y: shade_table_layer(
    t, x, y, table, scene.quad_pool, cam, lights, max_anisotropy=16.0))
timeit(xla_fn, tri, sx, sy, n=6, label="XLA shade (current prod)")

for block in (512, 1024, 2048, 4096):
    k_fn = chunked(lambda t, x, y, b=block: shade_table_layer_kernel(
        t, x, y, table, scene.quad_pool, cam, lights, max_anisotropy=16.0,
        block=b))
    timeit(k_fn, tri, sx, sy, n=6, label=f"kernel shade block={block}")

timeit(xla_fn, tri, sx, sy, n=6, label="XLA shade again (drift check)")
timeit(lambda a: a @ a, g, label="gauge again")

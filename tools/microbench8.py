#!/usr/bin/env python
"""Bisect the deferred-shade cost: which part of shade_table_samples costs
the ~196 ms (microbench7) when the gathers sum to ~12 ms?

Variants monkeypatch shade_table internals one at a time; run on the chip.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
from tbench import timeit, roundtrip_ms

import vktf_tpu.ops.shade_table as st
from vktf_tpu.config import RenderConfig
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.ops.pipeline import prepare_frame
from bench import CAMERAS

print(f"roundtrip {roundtrip_ms():.1f} ms", flush=True)
a = jnp.zeros((4096, 4096), jnp.bfloat16)
timeit(lambda a: a @ a, a, label="gauge: 4096^3 bf16 matmul (~0.7ms clean)")

scene, meta, aux = flatten_assets(build_preset("sponza"))
T = meta.num_triangles
N = 1 << 21
key = jax.random.PRNGKey(0)
tri = jax.random.randint(key, (N,), 0, T, jnp.int32)
sx = jax.random.uniform(key, (N,), jnp.float32) * 1920.0
sy = jax.random.uniform(key, (N,), jnp.float32) * 1080.0
lights = jnp.zeros((meta.num_lights, 8), jnp.float32)
background = jnp.zeros((4,), jnp.float32)
cam = jnp.zeros((3,), jnp.float32)

config = RenderConfig(width=1920, height=1080, msaa_samples=4)
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
prep = jax.jit(lambda s, v, c: prepare_frame(
    s, v, c, meta=meta, config=config)[0])
setup = prep(scene, camera.view_projection_transform, camera.position)
tbl_fn = jax.jit(lambda su, sc: st.build_shade_table_pallas(su, sc, None))
real_table = tbl_fn(setup, scene)
np.asarray(real_table[:1])


def run(label, n=6):
    def shade_flat(tri, sx, sy, table, qp):
        chunk = 1 << 19

        def one(args):
            t, x, y = args
            return st.shade_table_samples(t, x, y, table, qp, cam, lights,
                                          background, max_anisotropy=16.0)

        return jax.lax.map(
            one, (tri.reshape(-1, chunk), sx.reshape(-1, chunk),
                  sy.reshape(-1, chunk)))

    timeit(shade_flat, tri, sx, sy, real_table, scene.quad_pool, n=n,
           label=label)


run("baseline full shade")

# V1: sRGB decode -> identity (isolates the pow-chain cost)
orig_srgb = st._srgb_to_linear
st._srgb_to_linear = lambda c: c
run("V1 srgb decode = identity")
st._srgb_to_linear = orig_srgb

# V2: case folding off (cx=cy=0: static-lane taps, no where chains)
orig_level_addr = st._level_addr
def _level_addr_c0(tp, level_i):
    row, fx, fy, cx, cy = orig_level_addr(tp, level_i)
    return row, fx, fy, jnp.zeros_like(cx), jnp.zeros_like(cy)
st._level_addr = _level_addr_c0
run("V2 cx=cy=0 (no tap-fold selects)")
st._level_addr = orig_level_addr

# V3: single mip level (lerp weight 0 — does XLA DCE the l1 branch? No:
# gathers still issued; this isolates the filter arithmetic of level 1)
orig_filter = st._filter_slot
# patch shade_gathered's lfrac via _texture_params
orig_tp = st._texture_params
def _tp_l0(col, sxx, syy, ma, slot=0):
    out = orig_tp(col, sxx, syy, ma, slot=slot)
    out["lfrac"] = jnp.zeros_like(out["lfrac"])
    out["l1"] = out["l0"]
    return out
st._texture_params = _tp_l0
run("V3 l1=l0, lfrac=0 (coincident mip rows)")
st._texture_params = orig_tp

# V4: drop the BRDF/TBN (texture sampling only)
orig_lights = st.shade_lights_cf
st.shade_lights_cf = lambda wp, n, v, rgb, m, r, L: rgb
run("V4 no lighting (sampling+TBN only)")
st.shade_lights_cf = orig_lights

# V5: one texture slot instead of three
orig_sg = st.shade_gathered
def sg_one_slot(col, sxx, syy, quad0, quad1, cam3, lts, ma, covered):
    return orig_sg(col, sxx, syy, quad0, quad1, cam3, lts, ma, covered)
# patch inside shade_gathered is hard; emulate by making slots 1,2 reuse
# slot 0's taps: monkeypatch _filter_slot to ignore slot index
# (post-fold_window signature: the (cx, cy) window selects moved into
# fold_window, which this bench's V2 verdict motivated)
def _filter_slot0(quad, slot, fx, fy, srgb):
    return orig_filter(quad, 0, fx, fy, srgb)
st._filter_slot = _filter_slot0
run("V5 all slots read slot-0 lanes")
st._filter_slot = orig_filter

timeit(lambda a: a @ a, a, label="gauge again")

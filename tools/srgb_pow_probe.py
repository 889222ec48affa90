#!/usr/bin/env python
"""How much of phase B (pool gathers + fragment kernel) is the sRGB EOTF?

The base-color slot decodes 4 taps x 3 channels x 2 mip levels = 24
jnp.power evaluations per pixel inside the fragment kernel
(shade_table._filter_slot). This probe traces the production phase B twice
— once normal, once with _srgb_to_linear patched to identity (WRONG output,
timing only) — and interleaves one-sync device loops. If the delta is
material, a pre-decoded wide-fixed-point base slot in the pool's 32 free
pad lanes is the follow-up.

    python tools/srgb_pow_probe.py
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
from vktf_tpu.ops import shade_table
from vktf_tpu.ops.pipeline import (
    PallasFrameProgram,
    pallas_shade_addr_tiled,
    pallas_shade_final_tiled,
    prepare_frame,
)
from vktf_tpu.ops.raster_pallas import rasterize_pallas, stream_perm
from vktf_tpu.ops.shade_table import build_shade_table_pallas


def main() -> int:
    scene, meta, _aux = flatten_assets(build_preset("sponza"))
    camera = Camera(
        (-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
        ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6),
    )
    vp, cam = camera.view_projection_transform, camera.position
    config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                          backend="pallas")
    print(f"roundtrip {roundtrip_ms():.1f} ms; tris={meta.num_triangles}",
          flush=True)

    setup = jax.jit(
        lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
    )(scene, vp, cam)
    setup = jax.tree.map(jax.block_until_ready, setup)
    perm = jax.jit(lambda s: stream_perm(s, chunk=config.pallas_chunk))(setup)
    table = jax.jit(
        lambda s, sc: build_shade_table_pallas(s, sc, None)
    )(setup, scene)
    ph, pw = config.padded_height, config.padded_width
    tri_id, depth = jax.jit(lambda s, p: rasterize_pallas(
        s, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="none", perm=p, layers=meta.peel_layers,
        interleave=config.resolved_interleave(), assemble=False,
    ))(setup, perm)
    addr = jax.jit(lambda t, d, tb: pallas_shade_addr_tiled(
        t, d, tb, config=config))(tri_id, depth, table)
    addr = jax.tree.map(jax.block_until_ready, addr)

    lights = jax.jit(
        lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[2]
    )(scene, vp, cam)

    def final(a, qp, lg, cm):
        return pallas_shade_final_tiled(a, qp, lg, cm, config=config)

    orig = shade_table._srgb_to_linear
    variants = {}
    variants["srgb"] = (
        jax.jit(final).lower(addr, scene.quad_pool, lights, cam).compile()
    )
    shade_table._srgb_to_linear = lambda c: c
    try:
        variants["identity"] = (
            jax.jit(final).lower(addr, scene.quad_pool, lights, cam).compile()
        )
    finally:
        shade_table._srgb_to_linear = orig

    res = {n: [] for n in variants}
    for rep in range(6):
        for name, f in variants.items():
            res[name].append(
                timeit(f, addr, scene.quad_pool, lights, cam, n=8, jit=False,
                       label=f"rep{rep} shade_final[{name}]") * 1e3)
    for name, v in res.items():
        print(f"median {name:9s} {np.median(v):7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

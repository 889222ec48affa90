#!/usr/bin/env python
"""(chunk, group_size) re-sweep UNDER column-supertile mode.

The round-2 sweeps fixing chunk=256 / gs=8 ran in per-tile mode; column
mode changes the DMA/visit economics (one DMA serves a whole column), so
the optimum may shift. Interleaved one-sync loops, bit-equality asserted
against the (256, 8) baseline.

    python tools/raster_columns_sweep.py
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


def main() -> int:
    scene, meta, _aux = flatten_assets(build_preset("sponza"))
    camera = Camera(
        (-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
        ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6),
    )
    vp, cam = camera.view_projection_transform, camera.position
    print(f"roundtrip {roundtrip_ms():.1f} ms; tris={meta.num_triangles}",
          flush=True)

    config = RenderConfig(width=1920, height=1080, msaa_samples=4)
    setup = jax.jit(
        lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
    )(scene, vp, cam)
    setup = jax.tree.map(jax.block_until_ready, setup)

    # measured medians under columns (1080p sponza): (256,8) 24.9 wins;
    # (512,8) 28.3, (256,16) 29.6, (1024,8) 30.2, (512,16) 32.1,
    # (256,4) 26.6 — the (chunk, gs) axis is closed
    grid = [(256, 8), (512, 8), (256, 16), (512, 16), (1024, 8), (256, 4)]
    fns, perms = {}, {}
    for ck, gs in grid:
        perms[ck] = jax.jit(
            lambda s, c=ck: rp.stream_perm(s, chunk=c))(setup)
        perms[ck].block_until_ready()
        try:
            fns[(ck, gs)] = jax.jit(
                lambda su, pe, c=ck, g=gs: rp.rasterize_pallas(
                    su, 1088, 1920, tile_shape=(64, 128), msaa_samples=4,
                    chunk=c, sort="none", perm=pe, layers=meta.peel_layers,
                    group_size=g, columns=True, assemble=False)
            ).lower(setup, perms[ck]).compile()
        except Exception as e:  # e.g. SMEM overflow at big chunks
            print(f"({ck}, {gs}): compile failed: {type(e).__name__}",
                  flush=True)

    base = jax.tree.map(np.asarray, fns[(256, 8)](setup, perms[256]))
    for key, f in fns.items():
        out = jax.tree.map(np.asarray, f(setup, perms[key[0]]))
        same = all(
            np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(out))
        )
        print(f"{key}: bit-equal {same}", flush=True)
        assert same

    res = {k: [] for k in fns}
    for rep in range(4):
        for key, f in fns.items():
            res[key].append(
                timeit(f, setup, perms[key[0]], n=8, jit=False,
                       label=f"rep{rep} chunk={key[0]} gs={key[1]}") * 1e3)
    print("--- medians ---")
    for key, v in sorted(res.items(), key=lambda kv: np.median(kv[1])):
        print(f"chunk={key[0]:5d} gs={key[1]:3d} {np.median(v):7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

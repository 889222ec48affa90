#!/usr/bin/env python
"""Raster-stage A/B of the safe-group slim window body (_SAFE_SLIM).

Setup's "safe" margin proof (ops/vertex.py) lets groups of triangles skip
the per-sample w_recip>0 / depth-in-[0,1] tests. Asserts bit-equal outputs
ON HARDWARE (interpret mode cannot see Mosaic pipelining effects), prints
the safe-triangle fraction, then interleaves one-sync device loops.

    python tools/raster_safe_ab.py
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
    safe = np.asarray(setup["safe"])
    valid = np.asarray(setup["valid"])
    print(f"safe: {int((safe & valid).sum())} of {int(valid.sum())} valid "
          f"({100.0 * (safe & valid).sum() / max(valid.sum(), 1):.1f}%)",
          flush=True)
    perm = jax.jit(lambda s: rp.stream_perm(s, chunk=256))(setup)
    perm.block_until_ready()

    def stage(su, pe):
        return rp.rasterize_pallas(
            su, 1088, 1920, tile_shape=(64, 128), msaa_samples=4,
            chunk=256, sort="none", perm=pe, layers=meta.peel_layers,
            assemble=False)

    variants = {}
    for name, flag in (("full", False), ("slim", True)):
        rp._SAFE_SLIM = flag
        variants[name] = (
            jax.jit(lambda su, pe: stage(su, pe)).lower(setup, perm).compile()
        )
    rp._SAFE_SLIM = True

    outs = {
        n: jax.tree.map(np.asarray, f(setup, perm))
        for n, f in variants.items()
    }
    same = all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(outs["full"]),
                        jax.tree.leaves(outs["slim"]))
    )
    print(f"bit-equal on hardware: {same}", flush=True)
    if not same:
        ids_a, ids_b = outs["full"][0], outs["slim"][0]
        diff = np.asarray(ids_a) != np.asarray(ids_b)
        print(f"  differing id samples: {int(diff.sum())} of {diff.size}",
              flush=True)
    assert same

    res = {n: [] for n in variants}
    for rep in range(6):
        for name, f in variants.items():
            res[name].append(
                timeit(f, setup, perm, n=8, jit=False,
                       label=f"rep{rep} raster[{name}]") * 1e3)
    for name, v in res.items():
        print(f"median {name:8s} {np.median(v):7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

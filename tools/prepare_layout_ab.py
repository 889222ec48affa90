#!/usr/bin/env python
"""Decompose prepare_frame's cost: elementwise math vs padded-layout outputs.

prepare returns edge/edge_raster (T,3,3), zw (T,2,3), bbox (T,4), anchor
(T,2) ACROSS A JIT PROGRAM BOUNDARY — trailing small dims pad to (8,128)
tiles (README perf rule 1: (N,3) wastes 42x), so the stage may be paying
for layout, not math. Times, as one-sync device loops:

  full      - production prepare_frame (pallas path)
  flat      - same math, outputs returned as FLAT (T,) component lists
  cm        - same math, outputs stacked component-major ((9,T), (6,T), ...)
  mrows     - the (T,16) instance-matrix row gather alone

MEASURED (live v5e, sponza 263k tris): full ~3.7 ms, flat ~3.6, cm ~3.3-4.2,
mrows ~1.3 — all variants within tunnel noise of each other. NEGATIVE: the
padded (T,3,3) outputs are NOT the cost; prepare is elementwise-math +
instance-row-gather bound, so the component-major output refactor was
dropped.

    python tools/prepare_layout_ab.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import prepare_frame
    from vktf_tpu.ops import vertex as vx
    from vktf_tpu.scene.flatten import flatten_assets
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from bench import CAMERAS

    config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                          backend="pallas")
    scene, meta, _aux = flatten_assets(build_preset("sponza"))
    scene = jax.device_put(scene)
    position, direction = CAMERAS["sponza"]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0), 1920 / 1080,
                                      0.1, 1.0e6))
    vp, cp = camera.view_projection_transform, camera.position

    def full(s, v, c):
        return prepare_frame(s, v, c, meta=meta, config=config)[0]

    # same math, different output layouts: monkey-style variant of
    # triangle_setup_cm that skips/reshapes the final stacks
    def setup_core(s, v):
        mrows = s.node_local  # placeholder, replaced below
        raise NotImplementedError

    from vktf_tpu.ops.pipeline import propagate_transforms
    from vktf_tpu.mathx.frustum import (frustum_planes,
                                        aabbs_intersect_frustum)
    from vktf_tpu.mathx.bounding_box import transform_aabbs

    def variant(s, v, c, layout):
        node_global = propagate_transforms(s.node_local, s.node_parent,
                                           meta.level_slices)
        inst_matrix = node_global[s.inst_node]
        mrows = inst_matrix.reshape(-1, 16)[s.tri_instance]
        setup = dict(vx.triangle_setup_cm(
            s.tri_corner, mrows, v, config.width, config.height))
        planes = frustum_planes(v)
        world_aabbs = transform_aabbs(s.inst_aabb, inst_matrix)
        visible = aabbs_intersect_frustum(world_aabbs, planes)
        setup["valid"] = setup["valid"] & visible[s.tri_instance]
        if layout == "row":
            return setup
        t = setup["valid"].shape[0]
        if layout == "cm":
            return {
                "edge9": setup["edge"].reshape(t, 9).T,
                "edge_raster9": setup["edge_raster"].reshape(t, 9).T,
                "zw6": setup["zw"].reshape(t, 6).T,
                "bbox4": setup["bbox"].T,
                "anchor2": setup["anchor"].T,
                "valid": setup["valid"],
                "inv_det": setup["inv_det"],
                "mrows": mrows.T,
            }
        # flat: unstacked (T,) components
        out = {}
        for k in ("edge", "edge_raster", "zw"):
            a = setup[k].reshape(t, -1)
            for i in range(a.shape[1]):
                out[f"{k}{i}"] = a[:, i]
        out["valid"] = setup["valid"]
        return out

    def mrows_fn(s):
        node_global = propagate_transforms(s.node_local, s.node_parent,
                                           meta.level_slices)
        inst_matrix = node_global[s.inst_node]
        return inst_matrix.reshape(-1, 16)[s.tri_instance]

    def probe_leaf(x, acc):
        v = jax.tree.leaves(x)[0]
        return acc + jnp.sum(v.ravel()[-64:].astype(jnp.float32))

    def device_time(fn, *fargs, n=20):
        f = jax.jit(fn)
        acc = jnp.zeros((), jnp.float32)
        acc = probe_leaf(f(*fargs), acc)
        np.asarray(acc)
        t0 = time.perf_counter()
        a2 = acc
        for _ in range(n):
            a2 = a2 + 1.0
        np.asarray(a2)
        rpc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            acc = probe_leaf(f(*fargs), acc)
        np.asarray(acc)
        return (time.perf_counter() - t0 - rpc) / n * 1000.0

    cases = {
        "full": lambda: device_time(full, scene, vp, cp),
        "row": lambda: device_time(
            lambda s, v, c: variant(s, v, c, "row"), scene, vp, cp),
        "cm": lambda: device_time(
            lambda s, v, c: variant(s, v, c, "cm"), scene, vp, cp),
        "flat": lambda: device_time(
            lambda s, v, c: variant(s, v, c, "flat"), scene, vp, cp),
        "mrows": lambda: device_time(mrows_fn, scene),
    }
    results = {k: [] for k in cases}
    for rep in range(4):
        for k, run in cases.items():
            results[k].append(run())
        print(f"rep{rep} " + "  ".join(
            f"{k}={results[k][-1]:6.2f}" for k in cases), flush=True)
    print("\nmedians (ms):")
    for k, ts in results.items():
        print(f"  {k:6s} {np.median(ts):6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

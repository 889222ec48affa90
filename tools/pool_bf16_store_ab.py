#!/usr/bin/env python
"""A/B: quad pool STORED as bf16 (host-side view) vs u16 for phase B.

Distinct from tools/shade_bf16_ab.py's dead end (an IN-PROGRAM bitcast view
of the u16 operand, which defeated XLA's VMEM gather staging): here the pool
ARRAY is bf16 from device_put, the gather operand dtype is bf16 end to end,
and the bitcast back to u16 happens INSIDE the Pallas shade kernel (VMEM,
bit-exact). gather_dtype_ab measured pre-made bf16 row gathers ~12% faster
than u16 at (2M, 128).

MEASURED (live v5e): median u16 16.9 ms vs bf16 16.0 ms — a wash within
tunnel noise — and **bit-identical: False**. NEGATIVE, rejected: arbitrary
u16 halves reinterpreted as bf16 include NaN payloads, and some value-level
copy/gather lowering outside the kernel canonicalizes them, so a bf16-stored
pool is UNSAFE for bit-exact integer texel data even though the in-kernel
bitcast itself is exact. The production pool stays u16.

    python tools/pool_bf16_store_ab.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops import pipeline as pp
    from vktf_tpu.ops.pipeline import PallasFrameProgram
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
    prog = PallasFrameProgram(meta, config)
    vp, cp = camera.view_projection_transform, camera.position

    setup, lights = prog._prepare(scene, vp, cp)
    perm = prog._perm_fn(setup)
    tri_id, depth = prog._raster(setup, perm)
    table = prog._table(setup, scene)
    addr = prog._shade_addr(tri_id, depth, table)

    pool_u16 = scene.quad_pool
    pool_bf16 = jax.device_put(
        np.asarray(pool_u16).view(ml_dtypes.bfloat16))

    def final(ad, qp, li, c):
        return pp.pallas_shade_final_tiled(ad, qp, li, c, config=config)

    f = jax.jit(final)
    out_u16 = np.asarray(f(addr, pool_u16, lights, cp))
    out_bf16 = np.asarray(f(addr, pool_bf16, lights, cp))
    print("bit-identical:", np.array_equal(out_u16, out_bf16), flush=True)

    def probe_leaf(x, acc):
        v = jax.tree.leaves(x)[0]
        return acc + jnp.sum(v.ravel()[-64:].astype(jnp.float32))

    def device_time(pool, n=16):
        acc = jnp.zeros((), jnp.float32)
        acc = probe_leaf(f(addr, pool, lights, cp), acc)
        np.asarray(acc)
        t0 = time.perf_counter()
        a2 = acc
        for _ in range(n):
            a2 = a2 + 1.0
        np.asarray(a2)
        rpc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            acc = probe_leaf(f(addr, pool, lights, cp), acc)
        np.asarray(acc)
        return (time.perf_counter() - t0 - rpc) / n * 1000.0

    results = {"u16": [], "bf16": []}
    for rep in range(5):
        results["u16"].append(device_time(pool_u16))
        results["bf16"].append(device_time(pool_bf16))
        print(f"rep{rep} u16 {results['u16'][-1]:6.2f} ms   "
              f"bf16 {results['bf16'][-1]:6.2f} ms", flush=True)
    print(f"median u16 {np.median(results['u16']):6.2f} ms   "
          f"bf16 {np.median(results['bf16']):6.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

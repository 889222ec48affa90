#!/usr/bin/env python
"""Same-process A/B of two shade_kernel variants on identical real data.

The axon tunnel's throughput swings 2-3x between runs, so cross-run bench
FPS cannot adjudicate a kernel change. This script loads one scene, runs
the production raster once, and then times phase A (table gather +
addressing) and phase B (pool gathers + shade kernel) for BOTH the working
tree's shade_kernel and a pinned old copy (path via --old), interleaved
within one process: any tunnel drift hits both variants equally.

    python tools/shade_ab.py --old /tmp/shade_kernel_old.py --preset sponza
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--old", required=True)
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--inner", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops import shade_kernel as new_sk
    from vktf_tpu.ops.pipeline import (
        _shade_chunks,
        _flat_pad_chunks,
        _tiled_pixel_coords,
        _tiled_winner,
        prepare_frame,
    )
    from vktf_tpu.ops.raster_pallas import rasterize_pallas
    from vktf_tpu.ops.shade_table import build_shade_table_pallas
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.scene.flatten import flatten_assets
    from bench import CAMERAS

    old_sk = load_module("shade_kernel_old", args.old)
    enable_persistent_cache()

    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa)
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp = camera.view_projection_transform
    cam_pos = jnp.asarray(camera.position, jnp.float32)
    ph, pw = config.padded_height, config.padded_width
    platform = jax.devices()[0].platform
    interp = platform != "tpu"
    print(f"platform={platform} tris={meta.num_triangles} fb={pw}x{ph}",
          file=sys.stderr)

    def block(x):
        leaf = [v for v in jax.tree.leaves(x) if hasattr(v, "dtype")][0]
        np.asarray(leaf.ravel()[-8:])
        return x

    setup = block(jax.jit(lambda s, v, c: prepare_frame(
        s, v, c, meta=meta, config=config)[0])(scene, vp, cam_pos))
    inst_matrix = block(jax.jit(lambda s, v, c: prepare_frame(
        s, v, c, meta=meta, config=config)[4])(scene, vp, cam_pos))
    table = block(jax.jit(lambda su, sc, im: build_shade_table_pallas(
        su, sc, im, interpret=interp))(setup, scene, inst_matrix))
    tri_id, depth = block(jax.jit(lambda su: rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        interpret=interp, sort="morton", layers=meta.peel_layers,
        window_rows=config.raster_window_rows, assemble=False))(setup))

    ids = tri_id if tri_id.ndim == 4 else tri_id[None]
    deps = depth if depth.ndim == 4 else depth[None]
    num_tiles = ids.shape[1]
    th, tw = config.tile_shape
    id_px, frac = _tiled_winner(ids, deps, config)
    sx, sy = _tiled_pixel_coords(config, num_tiles)
    n_px = num_tiles * th * tw
    shade_chunk, n_pad = _shade_chunks(n_px, config)
    sxp = _flat_pad_chunks(sx, n_px, shade_chunk, n_pad)
    syp = _flat_pad_chunks(sy, n_px, shade_chunk, n_pad)
    idp = _flat_pad_chunks(id_px[0], n_px, shade_chunk, n_pad, fill=-1)
    idp = [block(x) for x in idp]
    sxp = [block(x) for x in sxp]
    syp = [block(x) for x in syp]
    lights = jnp.zeros((max(meta.num_lights, 1), 8), jnp.float32)
    covered_frac = float(jnp.mean((id_px[0] >= 0).astype(jnp.float32)))
    print(f"chunks={len(idp)} chunk={shade_chunk} covered={covered_frac:.3f}",
          file=sys.stderr)

    def make_phases(sk):
        def phase_a(table, idp, sxp, syp):
            return [sk.shade_addr_chunk(t, x, y, table,
                                        max_anisotropy=config.max_anisotropy)
                    for t, x, y in zip(idp, sxp, syp)]

        def phase_b(addr, idp, sxp, syp, qp):
            outs = []
            for (trow, r0, r1), t, x, y in zip(addr, idp, sxp, syp):
                rgb, a, _cov = sk.shade_final_chunk(
                    trow, r0, r1, t, x, y, qp, cam_pos, lights,
                    max_anisotropy=config.max_anisotropy, interpret=interp)
                outs.append((rgb, a))
            return outs

        return jax.jit(phase_a), jax.jit(phase_b)

    a_old, b_old = make_phases(old_sk)
    a_new, b_new = make_phases(new_sk)

    # compile + stash phase-A outputs for phase B
    addr_old = block(a_old(table, idp, sxp, syp))
    addr_new = block(a_new(table, idp, sxp, syp))
    out_old = block(b_old(addr_old, idp, sxp, syp, scene.quad_pool))
    out_new = block(b_new(addr_new, idp, sxp, syp, scene.quad_pool))

    # correctness: identical results between variants
    for (ro, ao), (rn, an) in zip(out_old, out_new):
        np.testing.assert_allclose(np.asarray(ro), np.asarray(rn),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ao), np.asarray(an),
                                   rtol=1e-5, atol=1e-5)
    print("outputs match", file=sys.stderr)

    def timeit(fn, *a):
        t0 = time.perf_counter()
        for _ in range(args.inner):
            out = fn(*a)
        block(out)
        return (time.perf_counter() - t0) / args.inner * 1e3

    rows = {k: [] for k in ("A_old", "A_new", "B_old", "B_new")}
    for r in range(args.reps):
        rows["A_old"].append(timeit(a_old, table, idp, sxp, syp))
        rows["A_new"].append(timeit(a_new, table, idp, sxp, syp))
        rows["B_old"].append(timeit(b_old, addr_old, idp, sxp, syp,
                                    scene.quad_pool))
        rows["B_new"].append(timeit(b_new, addr_new, idp, sxp, syp,
                                    scene.quad_pool))
    for k, v in rows.items():
        print(f"{k}: min={min(v):7.2f} ms  med={np.median(v):7.2f} ms  "
              f"all={[round(x, 1) for x in v]}")
    print(f"total_old={min(rows['A_old']) + min(rows['B_old']):.2f} ms  "
          f"total_new={min(rows['A_new']) + min(rows['B_new']):.2f} ms")

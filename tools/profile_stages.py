#!/usr/bin/env python
"""Per-stage frame profiling on the live device.

Times each pipeline stage (prepare -> raster -> shade-table -> shade ->
resolve/encode) as its own jitted+blocked unit, plus the fused frame and the
host transfer. Run on TPU for real numbers:

    python tools/profile_stages.py --preset sponza --width 1920 --height 1080 --msaa 4
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


sys.path.insert(0, "tools")
from tbench import timeit as _timeit, roundtrip_ms  # noqa: E402


def block(x):
    """Reliable device sync: materialize a tiny slice (block_until_ready is
    optimistic over the axon tunnel)."""
    leaf = [v for v in jax.tree.leaves(x) if hasattr(v, "dtype")][0]
    np.asarray(leaf.ravel()[-8:])
    return x


def timeit(fn, *args, n=10, warmup=2):
    out = fn(*args)
    dt = _timeit(fn, *args, n=n, warmup=warmup, jit=False)
    return dt, out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.scene.flatten import flatten_assets
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.ops.pipeline import prepare_frame, render_frame
    from vktf_tpu.ops.raster_pallas import rasterize_pallas, morton_order, pack_tri_data
    from vktf_tpu.ops.shade_table import build_shade_table, build_shade_table_pallas, shade_table_samples

    enable_persistent_cache()

    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa)
    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    from bench import CAMERAS
    position, direction = CAMERAS[args.preset]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0),
                                      args.width / args.height, 0.1, 1.0e6))
    vp = camera.view_projection_transform
    cam_pos = camera.position
    ph, pw = config.padded_height, config.padded_width
    platform = jax.devices()[0].platform
    print(f"platform={platform} tris={meta.num_triangles} "
          f"fb={pw}x{ph} msaa={args.msaa}", file=sys.stderr)

    results = {}

    # stage 1: prepare (transforms, vertex, setup, cull)
    prep = jax.jit(lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0])
    t, setup = timeit(prep, scene, vp, cam_pos, n=args.frames)
    results["prepare_ms"] = t * 1e3

    # stage 2a: morton + pack + hit lists (currently inside rasterize_pallas)
    interp = platform != "tpu"

    rast = jax.jit(lambda su: rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        interpret=interp, sort="morton"))
    t, (tri_id, depth) = timeit(rast, setup, n=args.frames)
    results["raster_ms"] = t * 1e3

    # stage 3: shade table build
    inst_fn = jax.jit(lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[4])
    inst_matrix = block(inst_fn(scene, vp, cam_pos))
    tbl = jax.jit(lambda su, sc, im: build_shade_table_pallas(
        su, sc, im, interpret=platform != "tpu"))
    t, table = timeit(tbl, setup, scene, inst_matrix, n=args.frames)
    results["table_ms"] = t * 1e3

    # stage 4: shading (pixel rate)
    def shade(tri_id, table, qp):
        id_px = jnp.max(tri_id, axis=0)
        n_px = ph * pw
        py = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 0)
        px = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 1)
        background = jnp.asarray(config.clear_color, jnp.float32)
        lights = jnp.zeros((meta.num_lights, 8), jnp.float32)
        sc = min(config.shade_chunk, n_px)
        n_pad = -(-n_px // sc) * sc
        def fp(x):
            x = x.reshape(-1)
            if n_pad != n_px:
                x = jnp.concatenate([x, jnp.zeros((n_pad - n_px,), x.dtype)])
            return x.reshape(n_pad // sc, sc)
        rgba = jax.lax.map(
            lambda a: shade_table_samples(a[0], a[1], a[2], table, qp,
                                          cam_pos, lights, background),
            (fp(id_px), fp(px + 0.5), fp(py + 0.5)))
        return rgba

    sh = jax.jit(shade)
    t, rgba = timeit(sh, tri_id, table, scene.quad_pool, n=args.frames)
    results["shade_ms"] = t * 1e3

    # fused frame (the real thing)
    frame = jax.jit(lambda s, v, c: render_frame(s, v, c, meta=meta, config=config))
    t0 = time.perf_counter()
    out = block(frame(scene, vp, cam_pos))
    results["frame_compile_s"] = time.perf_counter() - t0
    t, out = timeit(frame, scene, vp, cam_pos, n=args.frames)
    results["frame_ms"] = t * 1e3

    # host transfer of the (4,H,W) u8 frame
    t0 = time.perf_counter()
    for _ in range(args.frames):
        host = np.asarray(out)
    results["transfer_ms"] = (time.perf_counter() - t0) / args.frames * 1e3

    # full loop as bench measures it (dispatch + materialize)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        host = np.asarray(frame(scene, vp, cam_pos))
    results["loop_ms"] = (time.perf_counter() - t0) / args.frames * 1e3

    for k, v in results.items():
        print(f"{k:18s} {v:10.2f}")
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))

#!/usr/bin/env python
"""Static pair/quad coherence of the shade-phase winner-id stream (VERDICT
r3 #1 groundwork). Pure CPU replay at sponza 1080p: rasterizes visibility
with the tiled XLA backend (bit-equal ladder), reduces to the per-pixel
lexicographic winner, reorders into the PRODUCTION pallas block-layout
flat pixel order (tile 64x128, interleave m=2 — the order phase A gathers
in), and counts:

- odd=L: odd-position pixels whose id == left even neighbor (free under a
  stride-2 gather + structured expansion)
- odd=R: odd pixels whose id == RIGHT even neighbor (free under shift+select)
- resid: odd pixels equal to NEITHER neighbor -> the capped fix-up gather's
  static capacity C comes from this count
- quad-uniform fraction + total run count for context

Run: VKTF_FORCE_CPU=1 python tools/pair_coherence_stats.py [--msaa 4]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from vktf_tpu.config import RenderConfig  # noqa: E402
from vktf_tpu.mathx import Camera, ViewFrustumParams  # noqa: E402
from vktf_tpu.models.scenes import build_preset  # noqa: E402
from vktf_tpu.scene.flatten import flatten_assets  # noqa: E402


def block_flat(win, th, tw, mi):
    """(H, W) winner ids -> production block-layout flat order."""
    ph, pw = win.shape
    ty, tx = ph // th, pw // tw
    cols = tw // mi
    t = win.reshape(ty, th, tx, mi, cols)  # y split, x split into strips
    # order: (tile_y, tile_x, strip, y, x_local)
    return t.transpose(0, 2, 3, 1, 4).reshape(-1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="sponza")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--msaa", type=int, default=4)
    p.add_argument("--cameras", type=int, default=3,
                   help="bench camera + N-1 rotated variants")
    args = p.parse_args()

    from bench import CAMERAS
    from vktf_tpu.ops.pipeline import prepare_frame
    from vktf_tpu.ops.raster_tiled import rasterize_tiled

    scene, meta, _aux = flatten_assets(build_preset(args.preset))
    config = RenderConfig(width=args.width, height=args.height,
                          msaa_samples=args.msaa, backend="tiled")
    # the shade order is the PALLAS production layout
    pcfg = RenderConfig(width=args.width, height=args.height,
                        msaa_samples=args.msaa, backend="pallas")
    th, tw = pcfg.tile_shape
    mi = pcfg.resolved_interleave()
    position, direction = CAMERAS[args.preset]

    @jax.jit
    def vis(scene, vp, cam):
        setup, bins, _lights, _world, _inst = prepare_frame(
            scene, vp, cam, meta=meta, config=config)
        return rasterize_tiled(
            setup, config.padded_height, config.padded_width,
            tile_shape=config.tile_shape,
            msaa_samples=config.msaa_samples,
            bin_capacity=config.bin_capacity,
            large_capacity=config.large_capacity,
            bins=bins,
        )

    print(f"block layout: tile ({th},{tw}) interleave {mi}")
    for ci in range(args.cameras):
        camera = Camera(position, direction,
                        ViewFrustumParams(np.radians(45.0),
                                          args.width / args.height,
                                          0.1, 1.0e6))
        for _ in range(ci):
            camera.rotate(0.0, 0.35)
        tri_id, depth = vis(scene, camera.view_projection_transform,
                            camera.position)
        ids = np.asarray(tri_id)
        deps = np.asarray(depth)
        # per-pixel lexicographic (depth, id) winner across samples,
        # invalid (-1) treated as +inf like _tiled_winner
        d = np.where(ids >= 0, deps, np.inf)
        dmin = d.min(axis=0)
        cand = np.where((d == dmin) & (ids >= 0), ids, 2**31 - 1)
        win = cand.min(axis=0)
        win = np.where(win == 2**31 - 1, -1, win)  # (H, W)
        # crop/pad to the pallas padded framebuffer
        pph, ppw = pcfg.padded_height, pcfg.padded_width
        full = -np.ones((pph, ppw), np.int64)
        full[: win.shape[0], : win.shape[1]] = win[:pph, :ppw]
        flat = block_flat(full, th, tw, mi)

        n = flat.size
        e, o = flat[0::2], flat[1::2]
        right = np.concatenate([e[1:], e[-1:]])
        use_l = o == e
        use_r = (~use_l) & (o == right)
        resid = ~(use_l | use_r)
        q = flat.reshape(-1, 4)
        quad_ok = (q == q[:, :1]).all(axis=1)
        print(f"camera {ci}: n_px={n} odd=L {use_l.mean():.4f} "
              f"odd=R {use_r.mean():.4f} resid {resid.mean():.5f} "
              f"(count {int(resid.sum())}) | quad uniform "
              f"{quad_ok.mean():.4f} | runs "
              f"{int((flat[1:] != flat[:-1]).sum()) + 1}")


if __name__ == "__main__":
    main()

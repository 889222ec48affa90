#!/usr/bin/env python
"""Dump compiled HLO of the two-phase shade stages (VMEM staging check)."""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.ops.pipeline import PallasFrameProgram
    from vktf_tpu.runtime.cache import enable_persistent_cache
    from vktf_tpu.scene.flatten import flatten_assets
    from bench import CAMERAS

    enable_persistent_cache()
    config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                          backend="pallas")
    scene, meta, _aux = flatten_assets(build_preset("sponza"))
    position, direction = CAMERAS["sponza"]
    camera = Camera(position, direction,
                    ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1,
                                      1.0e6))
    vp = camera.view_projection_transform
    cam_pos = camera.position
    prog = PallasFrameProgram(meta, config)

    setup, lights = prog._prepare(scene, vp, cam_pos)
    perm = prog._perm_fn(setup)
    tri_id, depth = prog._raster(setup, perm)
    table = prog._table(setup, scene)
    txt = prog._shade_addr.lower(tri_id, depth, table).compile().as_text()
    with open("/tmp/shade_addr_hlo.txt", "w") as f:
        f.write(txt)
    addr = prog._shade_addr(tri_id, depth, table)
    txt = prog._shade_final.lower(addr, scene, lights,
                                  cam_pos).compile().as_text()
    with open("/tmp/shade_final_hlo.txt", "w") as f:
        f.write(txt)
    print("done")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump the compiled HLO of the production shade stage (to find hot fusions)."""
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
    lowered = prog._shade.lower(tri_id, depth, table, scene, lights, cam_pos)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/shade_hlo.txt", "w") as f:
        f.write(txt)
    print("bytes", len(txt))


if __name__ == "__main__":
    main()

"""Lane-interleaved raster layout (raster_interleave m > 1) parity.

The interleave only repacks the kernel's window footprint (one vreg covers
8m sample rows x 128/m px cols); output SEMANTICS are identical for every
m — these tests lock that, at the raster level (assembled (S, H, W) ids +
depths) and through the full tiled-resolve frame (final u8 image), against
the m = 1 baseline that the round-1/2 goldens pin to the numpy oracle.
"""

import jax
import numpy as np
import pytest

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.ops import raster_pallas as rp
from vktf_tpu.ops.pipeline import make_frame_fn, prepare_frame
from vktf_tpu.scene.flatten import flatten_assets


@pytest.fixture(scope="module")
def helmet_frame():
    scene, meta, _aux = flatten_assets(build_preset("helmet"))
    camera = Camera((0.0, 0.2, 2.2), (0.0, -0.05, -1.0),
                    ViewFrustumParams(np.radians(45.0), 256 / 128, 0.1, 1e3))
    return scene, meta, camera


def _setup_for(scene, meta, camera, config):
    return jax.jit(
        lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
    )(scene, camera.view_projection_transform, camera.position)


@pytest.mark.parametrize("m", [2, 4, 8])
def test_interleave_raster_bit_identical(helmet_frame, m):
    scene, meta, camera = helmet_frame
    config = RenderConfig(width=256, height=128, msaa_samples=4,
                          backend="pallas", pallas_interpret=True)
    setup = _setup_for(scene, meta, camera, config)

    def run(interleave, window_rows):
        return rp.rasterize_pallas(
            setup, config.padded_height, config.padded_width,
            tile_shape=config.tile_shape, msaa_samples=4,
            interpret=True, sort="morton", interleave=interleave,
            window_rows=window_rows,
        )

    base_id, base_d = jax.jit(lambda: run(1, None))()
    got_id, got_d = jax.jit(lambda: run(m, 8))()
    np.testing.assert_array_equal(np.asarray(base_id), np.asarray(got_id))
    np.testing.assert_array_equal(np.asarray(base_d), np.asarray(got_d))


def test_interleave_full_frame_bit_identical(helmet_frame):
    scene, meta, camera = helmet_frame
    imgs = {}
    for m in (1, 4):
        config = RenderConfig(width=256, height=128, msaa_samples=4,
                              backend="pallas", pallas_interpret=True,
                              split_stages=False, raster_interleave=m,
                              raster_window_rows=8 if m > 1 else None)
        frame = make_frame_fn(meta, config)
        imgs[m] = np.asarray(frame(
            scene, camera.view_projection_transform, camera.position
        ))
    np.testing.assert_array_equal(imgs[1], imgs[4])

"""Basis Universal (ETC1S/BasisLZ + UASTC) transcoder round-trip tests.

This environment has no basisu encoder and no real .ktx2 payloads (the
reference's assets are git-LFS pointers), so the transcoder is exercised
end-to-end through the module's own encoder: encode RGBA mips -> KTX2
container (vkFormat 0, DFD model 163/166, BasisLZ sgd) -> parse_ktx2 ->
compare against the ETC1S quantization applied directly.
"""

import numpy as np
import pytest

from vktf_tpu.loaders import basis
from vktf_tpu.loaders.images import generate_mips
from vktf_tpu.loaders.ktx import encode_ktx2_basis, parse_ktx2


def _test_image(size=32, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 0] = (xx * 255 // size).astype(np.uint8)
    img[..., 1] = (yy * 255 // size).astype(np.uint8)
    img[..., 2] = ((xx // 4 + yy // 4) % 2) * 200 + 30
    img[..., 3] = 255
    img[..., :3] = np.clip(
        img[..., :3].astype(np.int32) + rng.integers(-8, 8, img[..., :3].shape),
        0, 255,
    ).astype(np.uint8)
    return img


def _etc1s_direct(levels):
    """Quantize + decode each level directly through the block codec (the
    'ground truth' the container round trip must reproduce exactly)."""
    out = []
    for level in levels:
        h, w = level.shape[:2]
        bw, bh = (w + 3) // 4, (h + 3) // 4
        padded = np.zeros((bh * 4, bw * 4, 3), np.uint8)
        padded[:h, :w] = level[..., :3]
        padded[h:] = padded[max(h - 1, 0):max(h, 1)]
        padded[:, w:] = padded[:, max(w - 1, 0):max(w, 1)]
        eidx, sidx, emap, smap = [], [], {}, {}
        for y in range(bh):
            for x in range(bw):
                block = padded[4 * y:4 * y + 4, 4 * x:4 * x + 4].astype(np.int32)
                key, sel = basis._encode_etc1s_block(block)
                eidx.append(emap.setdefault(key, len(emap)))
                sidx.append(smap.setdefault(sel, len(smap)))
        endpoints = np.asarray(list(emap), np.int32)
        sel_rows = np.frombuffer(b"".join(smap), np.uint8).reshape(-1, 4)
        selectors = np.zeros((len(smap), 16), np.uint8)
        for i in range(4):
            for j in range(4):
                selectors[:, i * 4 + j] = (sel_rows[:, i] >> (2 * j)) & 3
        out.append(
            basis.decode_etc1s_blocks(
                np.asarray(eidx), np.asarray(sidx), endpoints, selectors, w, h
            )
        )
    return out


def test_huffman_roundtrip():
    rng = np.random.default_rng(1)
    freqs = rng.integers(0, 100, 40).tolist()
    freqs[7] = 1000
    lengths = basis._code_lengths_for(freqs)
    wr = basis.BitWriter()
    enc = basis.write_huffman_table(wr, lengths)
    symbols = [int(s) for s in rng.integers(0, 40, 500) if freqs[int(s)] > 0]
    for s in symbols:
        enc.write(wr, s)
    reader = basis.BitReader(wr.getvalue())
    dec = basis.read_huffman_table(reader)
    assert [dec.read(reader) for _ in symbols] == symbols


def test_etc1s_ktx2_roundtrip():
    levels = generate_mips(_test_image(32), srgb=True)
    blob = encode_ktx2_basis(levels, srgb=True, mode="etc1s")
    tex = parse_ktx2(blob, "etc1s-fixture")
    assert tex is not None and tex.srgb
    assert len(tex.levels) == len(levels)
    expected = _etc1s_direct(levels)
    for got, want in zip(tex.levels, expected):
        np.testing.assert_array_equal(got, want)
    # lossy but close: ETC1S quantization stays within a coarse budget
    diff = np.abs(tex.levels[0][..., :3].astype(int) - levels[0][..., :3].astype(int))
    assert diff.mean() < 16.0


def test_etc1s_nonsquare_npot():
    img = _test_image(32)[:20, :28]  # non-multiple-of-4 extents
    blob = encode_ktx2_basis([img], srgb=False, mode="etc1s")
    tex = parse_ktx2(blob, "npot")
    assert tex is not None and not tex.srgb
    assert tex.levels[0].shape == (20, 28, 4)
    np.testing.assert_array_equal(tex.levels[0], _etc1s_direct([img])[0])


def test_uastc_solid_roundtrip():
    img = np.zeros((16, 16, 4), np.uint8)
    img[:8] = (200, 40, 40, 255)
    img[8:] = (40, 40, 200, 255)
    blob = encode_ktx2_basis([img], srgb=True, mode="uastc")
    tex = parse_ktx2(blob, "uastc-fixture")
    assert tex is not None and tex.srgb
    np.testing.assert_array_equal(tex.levels[0], img)


def test_uastc_unknown_mode_skips(caplog_any=None):
    blocks = bytes([0x07] + [0] * 15) * 16  # unsupported mode byte
    assert basis.decode_uastc(blocks, 16, 16) is None


def test_etc1s_renders_through_material_pipeline(tmp_path):
    """A BasisLZ .ktx2 feeds the real glTF->flatten->render path."""
    import jax

    from vktf_tpu.loaders.ktx import write_ktx2_basis
    from vktf_tpu.models.gltf_writer import GltfWriter
    from vktf_tpu.models.primitives import plane_mesh
    from helpers import build_scene, default_camera
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import make_frame_fn

    levels = generate_mips(_test_image(32), srgb=True)
    ktx_path = write_ktx2_basis(tmp_path / "base.ktx2", levels, srgb=True)

    w = GltfWriter()
    img = w.add_image_uri(str(ktx_path.name))
    tex = w.add_texture(img, None, basisu=True)
    mat = w.add_material(base_color_texture=tex, metallic_factor=0.0)
    quad = w.add_mesh(plane_mesh(1.0), material=mat)
    light = w.add_light("point", color=(6.0, 6.0, 6.0))
    w.add_scene([
        # plane rotated to face the camera (+90deg about x)
        w.add_node(mesh=quad, translation=(0.0, 0.5, 0.0),
                   rotation=(0.7071068, 0.0, 0.0, 0.7071068)),
        w.add_node(light=light, translation=(0.5, 1.0, 2.0)),
    ])
    path = w.write(tmp_path / "scene.gltf")
    scene, meta, aux = build_scene(path)
    config = RenderConfig(width=64, height=64, msaa_samples=1,
                          tile_shape=(32, 64), backend="pallas")
    camera = default_camera()
    fn = make_frame_fn(meta, config)
    out = np.asarray(fn(scene, camera.view_projection_transform, camera.position))
    assert (out[:3].sum(axis=0) > 0).any(), "textured quad rendered black"

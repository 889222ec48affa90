"""Golden-image tests of the full Pallas backend (streaming raster +
shade-table deferred shading) against the independent numpy reference —
the same harness as test_golden.py with backend="pallas" (interpret mode
on CPU)."""

import numpy as np

from vktf_tpu.models.gltf_writer import GltfWriter
from vktf_tpu.models.primitives import box_mesh, plane_mesh, uv_sphere_mesh

from helpers import (
    assert_images_close,
    checker_png_bytes,
    default_camera,
    normal_map_png_bytes,
    render_both,
)


def test_pallas_flat_color_box(tmp_path):
    w = GltfWriter()
    mat = w.add_material(
        base_color_factor=(0.1, 0.7, 0.2, 1.0), metallic_factor=0.0, roughness_factor=0.8
    )
    mesh = w.add_mesh(box_mesh(), material=mat)
    w.add_scene(
        [
            w.add_node(mesh=mesh, rotation=(0.0, 0.2588, 0.0, 0.9659)),
            w.add_node(light=w.add_light(type="directional"), rotation=(0.3827, 0, 0, 0.9239)),
        ]
    )
    produced, expected = render_both(w.write(tmp_path / "box.gltf"), backend="pallas")
    assert produced[..., 1].max() > 30
    assert_images_close(produced, expected)


def test_pallas_full_pbr_textured(tmp_path):
    """PBR + textures exercises the quad-packed material pool + shade table."""
    w = GltfWriter()
    base_img = w.add_image_bytes(
        checker_png_bytes(16, a=(200, 160, 60, 255), b=(60, 60, 70, 255)), "image/png"
    )
    normal_img = w.add_image_bytes(normal_map_png_bytes(16), "image/png")
    sampler = w.add_sampler()
    mat = w.add_material(
        base_color_texture=w.add_texture(base_img, sampler=sampler),
        normal_texture=w.add_texture(normal_img, sampler=sampler),
        normal_scale=0.8,
        metallic_factor=0.7,
        roughness_factor=0.4,
    )
    mesh = w.add_mesh(uv_sphere_mesh(radius=0.7, rings=8, sectors=12), material=mat)
    w.add_scene(
        [
            w.add_node(mesh=mesh),
            w.add_node(light=w.add_light(type="directional", color=(2.0, 2.0, 1.8)),
                       rotation=(0.3827, 0.0, 0.0, 0.9239)),
            w.add_node(light=w.add_light(type="point", color=(4.0, 1.0, 1.0)),
                       translation=(1.2, 0.8, 1.2)),
        ]
    )
    produced, expected = render_both(
        w.write(tmp_path / "sphere.gltf"),
        camera=default_camera(position=(0.0, 0.2, 2.0), direction=(0.0, -0.1, -1.0)),
        backend="pallas",
    )
    assert produced[..., :3].max() > 40
    assert_images_close(produced, expected, max_mean=2.5, max_outlier_frac=0.02)


def test_pallas_hierarchy_msaa(tmp_path):
    """Instanced hierarchy + 4x MSAA through the Pallas backend."""
    w = GltfWriter()
    red = w.add_material(base_color_factor=(0.8, 0.2, 0.2, 1.0), roughness_factor=0.6)
    blue = w.add_material(base_color_factor=(0.2, 0.2, 0.8, 1.0),
                          metallic_factor=0.3, roughness_factor=0.3)
    floor_mat = w.add_material(base_color_factor=(0.4, 0.4, 0.4, 1.0), roughness_factor=0.9)
    box_red = w.add_mesh(box_mesh(), material=red)
    box_blue = w.add_mesh(box_mesh(0.3), material=blue)
    floor = w.add_mesh(plane_mesh(size=4.0), material=floor_mat)
    child = w.add_node(mesh=box_blue, translation=(0.0, 0.8, 0.0))
    w.add_scene(
        [
            w.add_node(mesh=box_red, translation=(-0.4, 0.0, 0.0), children=[child]),
            w.add_node(mesh=box_blue, translation=(0.8, -0.2, 0.3)),
            w.add_node(mesh=floor, translation=(0.0, -0.5, 0.0)),
            w.add_node(light=w.add_light(type="directional", color=(2.5, 2.5, 2.3)),
                       rotation=(0.46, 0.18, 0.0, 0.87)),
        ]
    )
    path = w.write(tmp_path / "mini.gltf")
    # sample-rate shading supersamples exactly like the numpy reference
    produced, expected = render_both(path, msaa=4, backend="pallas",
                                     shading_rate="sample")
    assert produced[..., 0].max() > 40
    assert_images_close(produced, expected, max_mean=2.5, max_outlier_frac=0.02)
    # pixel-rate (the production default, Vulkan non-sampleShading semantics)
    # differs from the supersampled reference only at object-object sample
    # edges — a few percent of pixels at this tiny resolution
    produced_px, _ = render_both(path, msaa=4, backend="pallas",
                                 shading_rate="pixel")
    assert_images_close(produced_px, expected, max_mean=3.5, max_outlier_frac=0.06)


def test_pallas_msaa8_matches_oracle_and_shards(tmp_path):
    """8x MSAA (the reference's PREFERRED sample count, engine.cppm:157-171)
    had no coverage: golden vs the supersampling oracle at the standard
    Vulkan 8-sample positions, plus sharded bit-equality at S=8."""
    import jax
    import numpy as np

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import make_frame_fn
    from vktf_tpu.parallel import make_render_mesh, make_sharded_frame_fn

    from helpers import build_scene, default_camera

    w = GltfWriter()
    red = w.add_material(base_color_factor=(0.8, 0.2, 0.2, 1.0),
                         roughness_factor=0.6)
    floor_mat = w.add_material(base_color_factor=(0.4, 0.4, 0.4, 1.0),
                               roughness_factor=0.9)
    w.add_scene([
        w.add_node(mesh=w.add_mesh(box_mesh(), material=red),
                   rotation=(0.0, 0.2588, 0.0, 0.9659)),
        w.add_node(mesh=w.add_mesh(plane_mesh(4.0), material=floor_mat),
                   translation=(0.0, -0.5, 0.0)),
        w.add_node(light=w.add_light(type="directional", color=(2.5, 2.5, 2.3)),
                   rotation=(0.46, 0.18, 0.0, 0.87)),
    ])
    path = w.write(tmp_path / "m8.gltf")
    produced, expected = render_both(path, 96, 64, msaa=8, backend="pallas",
                                     shading_rate="sample")
    assert produced[..., 0].max() > 40
    assert_images_close(produced, expected, max_mean=2.5,
                        max_outlier_frac=0.02)

    # sharded path at S=8 stays bit-equal to single-chip
    scene, meta, _aux = build_scene(path)
    camera = default_camera(aspect=96 / 64)
    config = RenderConfig(width=96, height=64, msaa_samples=8,
                          tile_shape=(32, 64), backend="pallas",
                          pallas_chunk=128)
    vp, pos = camera.view_projection_transform, camera.position
    single = np.asarray(make_frame_fn(meta, config)(scene, vp, pos))
    mesh = make_render_mesh(jax.devices()[:4], gp=2, sp=2)
    sharded = np.asarray(
        make_sharded_frame_fn(meta, config, mesh)(scene, vp, pos))
    np.testing.assert_array_equal(single, sharded)


def test_table_build_pallas_matches_xla(tmp_path):
    """build_shade_table_pallas must reproduce build_shade_table to ~1 ULP.

    The kernel computes the identical column expressions; only FMA
    contraction inside the Pallas lowering may differ, so compare the
    reconstructed f32 columns at tight relative tolerance and require the
    static (non-arithmetic) columns to be bit-exact.
    """
    import jax
    import numpy as np
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.models.gltf_writer import GltfWriter
    from vktf_tpu.models.primitives import box_mesh, uv_sphere_mesh
    from vktf_tpu.ops.pipeline import prepare_frame
    from vktf_tpu.ops.shade_table import (ROW, build_shade_table,
                                          build_shade_table_pallas)

    from helpers import build_scene

    w = GltfWriter()
    mat = w.add_material(base_color_factor=(0.8, 0.4, 0.2, 1.0))
    w.add_scene([
        w.add_node(mesh=w.add_mesh(box_mesh(), material=mat)),
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(0.5, rings=7, sectors=13),
                                   material=mat), translation=(1.0, 0.2, 0.0)),
        w.add_node(light=w.add_light(type="directional")),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "t.gltf"))
    config = RenderConfig(width=128, height=128, msaa_samples=1)
    camera = Camera((0.0, 0.5, 3.0), (0.0, 0.0, -1.0),
                    ViewFrustumParams(np.radians(45.0), 1.0, 0.1, 100.0))
    setup, _b, _l, _w, inst = jax.jit(
        lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)
    )(scene, camera.view_projection_transform, camera.position)

    def to_f32(u16):
        u16 = np.asarray(u16)
        return ((u16[:, :ROW].astype(np.uint32) << 16)
                | u16[:, ROW:]).view(np.float32)

    # block smaller than T to exercise the grid; T here is not a block
    # multiple, exercising the pad/slice path too
    a = to_f32(build_shade_table(setup, scene, inst))
    b = to_f32(build_shade_table_pallas(setup, scene, inst, interpret=True,
                                        block=256))
    assert a.shape == b.shape
    # plane coefficients suffer catastrophic cancellation (tiny values from
    # large products), so bound the error per COLUMN: |diff| within ~1 ULP
    # of the column's magnitude, not of the (possibly cancelled) element.
    # (whole columns can cancel to ~1e-4 — e.g. a flat scene's wpos-y plane —
    # so keep a small absolute floor as well)
    col_scale = np.abs(a).max(axis=0, keepdims=True)
    assert (np.abs(b - a) <= col_scale * 2e-5 + 1e-4).all()
    # static material columns + anchors are copies, not arithmetic
    np.testing.assert_array_equal(a[:, 39:], b[:, 39:])


def test_two_phase_shade_matches_single_stage(tmp_path):
    """The split-stage frame program's two-program shade (phase A gathers
    the shade table, phase B the texel pool — so XLA can stage each gather
    operand in VMEM; ops.shade_kernel.shade_addr_chunk) must be
    bit-identical to the single-program kernel shade."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import PallasFrameProgram, make_frame_fn

    from helpers import build_scene, checker_png_bytes, default_camera

    w = GltfWriter()
    img = w.add_image_bytes(checker_png_bytes(), "image/png")
    tex = w.add_texture(img, w.add_sampler())
    mat = w.add_material(base_color_factor=(1.0, 0.8, 0.6, 1.0),
                         base_color_texture=tex, metallic_factor=0.2,
                         roughness_factor=0.5)
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(16, 24), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(4.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=4, shading_rate="pixel",
                backend="pallas", pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12)
    one = make_frame_fn(meta, RenderConfig(shade_skip_mode=True, **base))
    two = make_frame_fn(meta, RenderConfig(shade_skip_mode=False, **base))
    assert isinstance(two, PallasFrameProgram) and two._two_phase
    vp, pos = camera.view_projection_transform, camera.position
    a = np.asarray(one(scene, vp, pos))
    b = np.asarray(two(scene, vp, pos))
    np.testing.assert_array_equal(a, b)


def test_shade_px_slice_composes_to_full(tmp_path):
    """pallas_shade_addr_tiled's multi-chip hooks: shading the flat
    block-layout pixel stream in gp slices (px_slice) and concatenating
    must be BYTE-IDENTICAL to the unsliced shade, and a y0 screen offset
    must match shading the same rows addressed via a y-offset raster.
    The sharded path's per-rank slicing (parallel/tiles.py) rests on
    exactly this composition."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import (
        _tiled_assemble,
        gather_world_lights,
        pallas_shade_addr_tiled,
        pallas_shade_final_tiled,
    )
    from vktf_tpu.ops.raster_pallas import rasterize_pallas
    from vktf_tpu.ops.shade_table import build_shade_table_pallas
    from vktf_tpu.ops.vertex import propagate_transforms
    from vktf_tpu.ops.pipeline import prepare_frame

    from helpers import build_scene, checker_png_bytes, default_camera

    w = GltfWriter()
    img = w.add_image_bytes(checker_png_bytes(), "image/png")
    tex = w.add_texture(img, w.add_sampler())
    mat = w.add_material(base_color_factor=(1.0, 0.8, 0.6, 1.0),
                         base_color_texture=tex, metallic_factor=0.2,
                         roughness_factor=0.5)
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(12, 18), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(4.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    config = RenderConfig(width=128, height=64, msaa_samples=2,
                          backend="pallas", pallas_interpret=True,
                          tile_shape=(32, 64), pallas_chunk=128,
                          shade_chunk=1 << 12)
    vp, pos = camera.view_projection_transform, camera.position
    setup, _bins, lights, _world, _inst = prepare_frame(
        scene, vp, pos, meta=meta, config=config)
    table = build_shade_table_pallas(setup, scene, None, interpret=True)
    ids, deps = rasterize_pallas(
        setup, config.padded_height, config.padded_width,
        tile_shape=config.tile_shape, msaa_samples=config.msaa_samples,
        chunk=config.pallas_chunk, interpret=True, sort="morton",
        assemble=False)
    fused = config.resolved_fused_pool(mirror_wrap=meta.mirror_wrap,
                                       mixed_samplers=meta.mixed_samplers)

    def shade(px_slice=None):
        addr = pallas_shade_addr_tiled(ids, deps, table, config=config,
                                       fused_pool=fused, px_slice=px_slice)
        return np.asarray(pallas_shade_final_tiled(
            addr, scene.quad_pool, lights, pos, config=config,
            fused_pool=fused, assemble=False))

    full = shade()
    n_px = full.shape[1]
    for gp in (2, 4):
        parts = [shade((k * n_px // gp, n_px // gp)) for k in range(gp)]
        np.testing.assert_array_equal(np.concatenate(parts, axis=1), full)
    # the assembled image from flat pixels matches the assemble=True path
    addr = pallas_shade_addr_tiled(ids, deps, table, config=config,
                                   fused_pool=fused)
    assembled = np.asarray(pallas_shade_final_tiled(
        addr, scene.quad_pool, lights, pos, config=config,
        fused_pool=fused))
    np.testing.assert_array_equal(
        np.asarray(_tiled_assemble(full, config)), assembled)


def test_shade_pool_rowmajor_bit_identical(tmp_path):
    """shade_pool_rowmajor feeds the fragment kernel the gathered pool rows
    in the gather's natural row-major layout and transposes per block in
    VMEM (tools/relayout_ab.py: XLA's HBM relayout copies cost ~1.76 ms per
    tensor at 1080p volumes). The layout choice must never change a pixel:
    both forms of the two-phase shade are asserted bit-identical."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import PallasFrameProgram, make_frame_fn

    from helpers import build_scene, checker_png_bytes, default_camera

    w = GltfWriter()
    img = w.add_image_bytes(checker_png_bytes(), "image/png")
    tex = w.add_texture(img, w.add_sampler())
    mat = w.add_material(base_color_factor=(1.0, 0.8, 0.6, 1.0),
                         base_color_texture=tex, metallic_factor=0.2,
                         roughness_factor=0.5)
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(16, 24), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(4.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=4, shading_rate="pixel",
                backend="pallas", pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12,
                shade_skip_mode=False)
    lane = make_frame_fn(meta, RenderConfig(shade_pool_rowmajor=False, **base))
    rowm = make_frame_fn(meta, RenderConfig(shade_pool_rowmajor=True, **base))
    assert isinstance(rowm, PallasFrameProgram) and rowm._two_phase
    vp, pos = camera.view_projection_transform, camera.position
    a = np.asarray(lane(scene, vp, pos))
    b = np.asarray(rowm(scene, vp, pos))
    np.testing.assert_array_equal(a, b)


def test_shade_attrs_boundary_bit_identical(tmp_path):
    """shade_attrs_boundary ships per-pixel INTERPOLATED fragment attrs
    across the two-phase shade boundary instead of raw table columns
    (ops.shade_kernel.shade_attrs_chunk). A measured dead end as the
    default (config.py note: slower on hardware, and Mosaic's FMA
    contraction of the plane math differs from XLA's by 1 u8 step at
    scattered pixels there) — this test pins the SEMANTIC equivalence in
    interpret mode, where both boundaries evaluate the same helper
    expressions and must be bit-identical."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import PallasFrameProgram, make_frame_fn

    from helpers import build_scene, checker_png_bytes, default_camera

    w = GltfWriter()
    img = w.add_image_bytes(checker_png_bytes(), "image/png")
    tex = w.add_texture(img, w.add_sampler())
    mat = w.add_material(base_color_factor=(1.0, 0.8, 0.6, 1.0),
                         base_color_texture=tex, metallic_factor=0.2,
                         roughness_factor=0.5)
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(16, 24), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(4.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=4, shading_rate="pixel",
                backend="pallas", pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12,
                shade_skip_mode=False)
    cols = make_frame_fn(meta, RenderConfig(shade_attrs_boundary=False, **base))
    attrs = make_frame_fn(meta, RenderConfig(shade_attrs_boundary=True, **base))
    assert isinstance(attrs, PallasFrameProgram) and attrs._two_phase
    vp, pos = camera.view_projection_transform, camera.position
    a = np.asarray(cols(scene, vp, pos))
    b = np.asarray(attrs(scene, vp, pos))
    np.testing.assert_array_equal(a, b)


def test_raster_safe_slim_bit_identical(tmp_path):
    """The safe-group slim raster body (stream row 19: statically-proven
    w/depth-range tests dropped per group) must be bit-identical to the
    full-test body — including near-plane CROSSER triangles, which must
    route to the full body (vertex.py "safe" margin proof)."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.ops import raster_pallas as rp
    from vktf_tpu.ops.pipeline import prepare_frame

    from helpers import build_scene

    w = GltfWriter()
    mat = w.add_material(base_color_factor=(1.0, 0.8, 0.6, 1.0))
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(0.7, 10, 14),
                                   material=mat)),
        # a large ground plane the camera sits just above, crossing the
        # near plane in view -> exercises the crosser (full-test) body
        w.add_node(mesh=w.add_mesh(plane_mesh(60.0, segments=4),
                                   material=mat),
                   translation=(0.0, -0.2, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = Camera((0.0, 0.1, 2.0), (0.0, -0.05, -1.0),
                    ViewFrustumParams(np.pi / 4, 2.0, 0.1, 1.0e6))
    config = RenderConfig(width=128, height=64, msaa_samples=2,
                          backend="pallas", pallas_interpret=True,
                          tile_shape=(32, 64), pallas_chunk=128)
    import jax

    setup = jax.jit(
        lambda s, v, c: prepare_frame(s, v, c, meta=meta, config=config)[0]
    )(scene, camera.view_projection_transform, camera.position)
    safe = np.asarray(setup["safe"])
    valid = np.asarray(setup["valid"])
    assert (safe & valid).any(), "expected some statically-safe triangles"
    assert (~safe & valid).any(), "expected some full-test (crosser) triangles"

    outs = []
    for flag in (False, True):
        old = rp._SAFE_SLIM
        rp._SAFE_SLIM = flag
        try:
            out = rp.rasterize_pallas(
                setup, 64, 128, tile_shape=(32, 64), msaa_samples=2,
                chunk=128, interpret=True, sort="morton")
        finally:
            rp._SAFE_SLIM = old
        outs.append(tuple(np.asarray(o) for o in out))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_prepare_scene_cache_bit_identical(tmp_path):
    """The split-stage program's cross-frame scene-state cache (camera-
    independent prepare half: node transforms, world lights, the (T,16)
    instance-matrix rows, world AABBs — pipeline._maybe_scene_update) must
    reproduce the fused prepare bit-for-bit, reuse its state while the
    scene pytree is unchanged, and invalidate when node transforms swap."""
    import dataclasses

    import jax.numpy as jnp

    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import PallasFrameProgram

    from helpers import build_scene, checker_png_bytes, default_camera

    w = GltfWriter()
    img = w.add_image_bytes(checker_png_bytes(), "image/png")
    tex = w.add_texture(img, w.add_sampler())
    mat = w.add_material(base_color_factor=(1.0, 0.8, 0.6, 1.0),
                         base_color_texture=tex, metallic_factor=0.2,
                         roughness_factor=0.5)
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(16, 24), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(4.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=4, shading_rate="pixel",
                backend="pallas", pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12)
    # prepare_packed=False on BOTH: this test isolates the scene-cache
    # variable; the fused prepare emits the legacy dict, so the cached
    # program must too for a key-by-key comparison (the packed-vs-legacy
    # form equivalence has its own pin, test_prepare_packed_bit_identical)
    cached = PallasFrameProgram(meta, RenderConfig(
        prepare_scene_cache=True, prepare_packed=False, **base))
    fused = PallasFrameProgram(meta, RenderConfig(
        prepare_scene_cache=False, **base))
    vp, pos = camera.view_projection_transform, camera.position
    sa, la = cached._prepare(scene, vp, pos)
    sb, lb = fused._prepare(scene, vp, pos)
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_array_equal(np.asarray(sa[k]), np.asarray(sb[k]))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # reuse while the scene pytree is unchanged
    assert cached._maybe_scene_update(scene) is cached._maybe_scene_update(
        scene)
    # swapping node transforms invalidates and changes the state
    state = cached._maybe_scene_update(scene)
    nl = np.asarray(scene.node_local).copy()
    nl[:, :3, 3] += 1.0
    moved = dataclasses.replace(scene, node_local=jnp.asarray(nl))
    state2 = cached._maybe_scene_update(moved)
    assert state2 is not state
    assert not np.array_equal(np.asarray(state2[0]), np.asarray(state[0]))
    # whole frames agree
    np.testing.assert_array_equal(np.asarray(cached(scene, vp, pos)),
                                  np.asarray(fused(scene, vp, pos)))


def test_pair_gather_rowsT_bit_identical_adversarial():
    """pair_gather_rowsT must equal gather_rows(table, t).T BIT-FOR-BIT on
    every stream shape: coherent runs, random ids, a worst-case alternating
    stream where EVERY odd pixel is a 1-px run (residuals = 100% of odd,
    exceeding the cap -> the cond fallback), and boundary patterns."""
    import jax
    import jax.numpy as jnp

    from vktf_tpu.ops.shade_kernel import pair_gather_rowsT
    from vktf_tpu.ops.shade_table import gather_rows

    rng = np.random.default_rng(7)
    rows = 977
    table = jnp.asarray(
        rng.integers(0, 2**16, (rows, 128), dtype=np.uint16))

    streams = {
        "coherent": np.repeat(rng.integers(0, rows, 400), 5)[:2048],
        "random": rng.integers(0, rows, 2048),
        "alternating": np.tile([3, 901], 1024),  # all odd are residuals
        "constant": np.full(2048, 42),
        "run_starts_on_odd": np.repeat(rng.integers(0, rows, 1025), 2)[1:2049],
    }
    for name, t_np in streams.items():
        t = jnp.asarray(t_np.astype(np.int32))
        ref = np.asarray(jax.jit(lambda tb, tt: gather_rows(tb, tt).T)(
            table, t))
        got = np.asarray(jax.jit(
            lambda tb, tt: pair_gather_rowsT(tb, tt, cap_frac=8))(table, t))
        np.testing.assert_array_equal(ref, got, err_msg=name)


def test_shade_pair_gather_bit_identical(tmp_path):
    """The shade_pair_gather frame flag must never change a pixel: the
    two-phase shade with the pair-coherent table gather is asserted
    bit-identical to the classic per-pixel gather end-to-end."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import PallasFrameProgram, make_frame_fn

    from helpers import build_scene, checker_png_bytes, default_camera

    w = GltfWriter()
    img = w.add_image_bytes(checker_png_bytes(), "image/png")
    tex = w.add_texture(img, w.add_sampler())
    mat = w.add_material(base_color_factor=(1.0, 0.8, 0.6, 1.0),
                         base_color_texture=tex, metallic_factor=0.2,
                         roughness_factor=0.5)
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(16, 24), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(4.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=4, shading_rate="pixel",
                backend="pallas", pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12,
                shade_skip_mode=False)
    classic = make_frame_fn(meta, RenderConfig(shade_pair_gather=False,
                                               **base))
    paired = make_frame_fn(meta, RenderConfig(shade_pair_gather=True, **base))
    assert isinstance(paired, PallasFrameProgram) and paired._two_phase
    vp, pos = camera.view_projection_transform, camera.position
    np.testing.assert_array_equal(np.asarray(classic(scene, vp, pos)),
                                  np.asarray(paired(scene, vp, pos)))


def test_prepare_packed_bit_identical(tmp_path):
    """The round-5 PACKED prepare (flat component-major triangle setup ->
    pack_tri_rows stream rows, no lane-padded (T,3,3) intermediates) must
    reproduce the legacy dict prepare BIT-FOR-BIT: same expressions, the
    packed rows match pack_tri_data's row semantics exactly, and whole
    frames agree — including a scene with translucency (peel layers) and
    culling-active camera."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import PallasFrameProgram
    from vktf_tpu.ops.raster_pallas import pack_tri_data

    from helpers import build_scene, default_camera

    w = GltfWriter()
    mat = w.add_material(base_color_factor=(0.6, 0.5, 0.4, 1.0),
                         metallic_factor=0.3, roughness_factor=0.5)
    blend = w.add_material(base_color_factor=(0.9, 0.2, 0.2, 0.5),
                           alpha_mode="BLEND")
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(0.6, 10, 16), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(6.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(mesh=w.add_mesh(plane_mesh(0.8), material=blend),
                   translation=(0.2, 0.2, 0.8),
                   rotation=(0.7071068, 0.0, 0.0, 0.7071068)),
        # an instance far outside the frustum so culling bites
        w.add_node(mesh=w.add_mesh(box_mesh(), material=mat),
                   translation=(40.0, 0.0, 0.0)),
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=2, backend="pallas",
                pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12,
                shade_skip_mode=False)
    packed_prog = PallasFrameProgram(meta, RenderConfig(
        prepare_packed=True, **base))
    legacy_prog = PallasFrameProgram(meta, RenderConfig(
        prepare_packed=False, **base))
    vp, pos = camera.view_projection_transform, camera.position

    # stage-level: same row semantics. Plane-constant values may differ by
    # FMA-contraction ULPs across the two program forms (XLA contracts
    # mul+add differently per fusion — the same tolerance the
    # setup_cm-vs-vertex-route test documents), so discrete rows are exact
    # and plane rows are ULP-tight.
    mrows_p, mrowsT_p, _l, aabbs_p = packed_prog._maybe_scene_update(scene)
    sp = packed_prog._prepare_cam(scene, mrows_p, mrowsT_p, aabbs_p, vp)
    mrows_l, mrowsT_l, _l2, aabbs_l = legacy_prog._maybe_scene_update(scene)
    sl = legacy_prog._prepare_cam(scene, mrows_l, mrowsT_l, aabbs_l, vp)
    # validity RULES differ by design (packed = per-triangle screen cull,
    # legacy = per-instance frustum cull — raster_pallas._packed_valid):
    # both must kill the far-off-screen instance, and triangles valid
    # under BOTH rules must carry identical ids/thresholds.
    vp_mask = np.asarray(sp["valid"])
    vl_mask = np.asarray(sl["valid"])
    # culling is ACTIVE under both rules (the x=40 box dies in both)
    assert vp_mask.sum() < vp_mask.size
    assert vl_mask.sum() < vl_mask.size
    both = vp_mask & vl_mask
    assert both.any()
    tdp = np.asarray(sp["tri_data"])
    tdl = np.asarray(pack_tri_data(sl))
    for row in (15, 16, 17, 18):  # ids + thresholds: discrete
        np.testing.assert_array_equal(tdp[row][both], tdl[row][both])
    # plane rows are valid-independent: comparable everywhere
    np.testing.assert_allclose(tdp[:15], tdl[:15], rtol=1e-5, atol=1e-5)
    t = sl["edge"].shape[0]
    np.testing.assert_allclose(
        np.asarray(sp["edge9"]), np.asarray(sl["edge"].reshape(t, 9).T),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(sp["anchor2"]), np.asarray(sl["anchor"].T))

    # whole frames agree bit-for-bit (pinned on real hardware too:
    # tools/prepare_flat_ab.py bit_equal=True maxdiff=0)
    np.testing.assert_array_equal(np.asarray(packed_prog(scene, vp, pos)),
                                  np.asarray(legacy_prog(scene, vp, pos)))


def test_prepare_impl_kernel_bit_identical(tmp_path):
    """The ONE-pass Mosaic setup kernel (prepare_impl='kernel',
    ops/setup_kernel.py) must reproduce the flat XLA packed prepare's
    frames bit-for-bit in interpret mode (the kernel body shares the
    _setup_from_corners / packed_row_lists source), across culling,
    translucency, and a triangle count that is NOT a block multiple."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import make_frame_fn

    from helpers import build_scene, default_camera

    w = GltfWriter()
    mat = w.add_material(base_color_factor=(0.6, 0.5, 0.4, 1.0),
                         metallic_factor=0.3, roughness_factor=0.5)
    blend = w.add_material(base_color_factor=(0.9, 0.2, 0.2, 0.5),
                           alpha_mode="BLEND")
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(0.6, 10, 16), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(6.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(mesh=w.add_mesh(plane_mesh(0.8), material=blend),
                   translation=(0.2, 0.2, 0.8),
                   rotation=(0.7071068, 0.0, 0.0, 0.7071068)),
        w.add_node(mesh=w.add_mesh(box_mesh(), material=mat),
                   translation=(40.0, 0.0, 0.0)),  # culled
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=2, backend="pallas",
                pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12,
                shade_skip_mode=False)
    vp, pos = camera.view_projection_transform, camera.position
    a = np.asarray(make_frame_fn(
        meta, RenderConfig(prepare_impl="kernel", **base))(scene, vp, pos))
    b = np.asarray(make_frame_fn(
        meta, RenderConfig(prepare_impl="xla", **base))(scene, vp, pos))
    np.testing.assert_array_equal(a, b)
    assert (a.sum(axis=0) > 0).any()


def test_prepare_impl_kernel_crossers_and_block_multiple(tmp_path):
    """Setup-kernel stress: (a) the triangle count is EXACTLY a kernel
    block multiple (two 32-segment planes = 4096 = ops/setup_kernel's
    block size — the unpadded grid path), and (b) the camera sits INSIDE
    the scene so triangles cross the eye plane (w <= 0 corners), driving
    the near-crosser clipped-bbox candidate math through the Mosaic
    kernel's (32, 128) tile form. Frames must match the XLA packed form
    bit-for-bit in interpret mode."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.ops.pipeline import make_frame_fn
    from vktf_tpu.ops.setup_kernel import _BLOCK

    from helpers import build_scene, default_camera

    w = GltfWriter()
    mat = w.add_material(base_color_factor=(0.6, 0.5, 0.4, 1.0),
                         metallic_factor=0.2, roughness_factor=0.6)
    floor = w.add_mesh(plane_mesh(12.0, segments=32), material=mat)
    ceil_m = w.add_mesh(plane_mesh(12.0, segments=32), material=mat)
    w.add_scene([
        w.add_node(mesh=floor, translation=(0.0, -0.8, 0.0)),
        w.add_node(mesh=ceil_m, translation=(0.0, 1.2, 0.0),
                   rotation=(1.0, 0.0, 0.0, 0.0)),  # flipped to face down
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    assert meta.num_triangles == 2 * 2 * 32 * 32 == _BLOCK, (
        "fixture must hit the exact-block-multiple path"
    )
    # camera INSIDE the slab, looking along it: geometry spans behind the
    # eye plane -> near-plane crossers take the clipped-bbox route
    camera = default_camera(aspect=2.0, position=(0.0, 0.2, 0.0),
                            direction=(1.0, 0.05, 0.0))
    base = dict(width=128, height=64, msaa_samples=2, backend="pallas",
                pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12,
                shade_skip_mode=False)
    vp, pos = camera.view_projection_transform, camera.position
    a = np.asarray(make_frame_fn(
        meta, RenderConfig(prepare_impl="kernel", **base))(scene, vp, pos))
    b = np.asarray(make_frame_fn(
        meta, RenderConfig(prepare_impl="xla", **base))(scene, vp, pos))
    np.testing.assert_array_equal(a, b)
    assert (a.sum(axis=0) > 0).any(), "camera-inside frame came out empty"


def test_raster_prestream_bit_identical(tmp_path):
    """The pre-permuted raster stream (config.raster_prestream: a second
    setup-kernel pass over perm-gathered inputs replaces the in-raster
    ~18.5 ms lane-dim permute, tools/raster_prologue_probe.py) must be
    invisible in output: frames bit-equal to the classic permute path,
    the emitted stream rows equal to pack-then-permute on every real
    column, and the cross-frame stream cache exact across both resort
    branches (reuse below threshold, refresh above)."""
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.mathx import Camera, ViewFrustumParams
    from vktf_tpu.ops import raster_pallas as rp
    from vktf_tpu.ops.pipeline import PallasFrameProgram

    from helpers import build_scene, default_camera

    w = GltfWriter()
    mat = w.add_material(base_color_factor=(0.6, 0.5, 0.4, 1.0),
                         metallic_factor=0.3, roughness_factor=0.5)
    blend = w.add_material(base_color_factor=(0.9, 0.2, 0.2, 0.5),
                           alpha_mode="BLEND")
    w.add_scene([
        w.add_node(mesh=w.add_mesh(uv_sphere_mesh(0.6, 10, 16), material=mat)),
        w.add_node(mesh=w.add_mesh(plane_mesh(6.0), material=mat),
                   translation=(0.0, -1.0, 0.0)),
        w.add_node(mesh=w.add_mesh(plane_mesh(0.8), material=blend),
                   translation=(0.2, 0.2, 0.8),
                   rotation=(0.7071068, 0.0, 0.0, 0.7071068)),
        w.add_node(mesh=w.add_mesh(box_mesh(), material=mat),
                   translation=(40.0, 0.0, 0.0)),  # culled
        w.add_node(light=w.add_light(type="directional"),
                   rotation=(0.3827, 0.0, 0.0, 0.9239)),
    ])
    scene, meta, _aux = build_scene(w.write(tmp_path / "s.gltf"))
    camera = default_camera(aspect=2.0, position=(0.0, 0.5, 3.0),
                            direction=(0.0, -0.1, -1.0))
    base = dict(width=128, height=64, msaa_samples=2, backend="pallas",
                pallas_interpret=True, tile_shape=(32, 64),
                pallas_chunk=128, shade_chunk=1 << 12,
                shade_skip_mode=False)
    pre = PallasFrameProgram(meta, RenderConfig(raster_prestream=True,
                                                **base))
    cls = PallasFrameProgram(meta, RenderConfig(raster_prestream=False,
                                                **base))
    assert pre._prestream and not cls._prestream
    vp, pos = camera.view_projection_transform, camera.position

    np.testing.assert_array_equal(np.asarray(pre(scene, vp, pos)),
                                  np.asarray(cls(scene, vp, pos)))

    # stage-level: stream rows == pack-then-permute on every REAL column
    # (permutation-padding columns carry garbage plane rows by design —
    # valid=False, never dereferenced past the hit test)
    setup, _lights = pre._prepare(scene, vp, pos)
    state = pre._maybe_restream(scene, setup, vp)
    stream = pre._stream_cam(*state, vp)
    perm = np.asarray(pre._perm)
    t = setup["valid"].shape[0]
    chunk = pre.config.pallas_chunk
    td_ref = np.array(rp._pad_cols(setup["tri_data"], chunk))
    if td_ref.shape[1] > t:  # rasterize_pallas's padding marking
        td_ref[15, t:] = -1.0
        td_ref[19, t:] = 1.0
    br = setup["bbox_rows"]
    br_ref = np.concatenate([
        np.asarray(rp._pad_cols(br[:2], chunk, 2**30)),
        np.asarray(rp._pad_cols(br[2:], chunk, -(2**30))),
    ])
    real = perm < t
    td_p = np.asarray(stream["tri_data"])[:, : perm.size]
    br_p = np.asarray(stream["bbox_rows"])[:, : perm.size]
    np.testing.assert_array_equal(td_p[:, real], td_ref[:, perm[real]])
    np.testing.assert_array_equal(br_p[:, real], br_ref[:, perm[real]])
    # stream padding (perm past t, and the kernel's block tail) is
    # invalid + slim everywhere
    assert (td_p[15, ~real] == -1.0).all()
    assert (td_p[19, ~real] == 1.0).all()
    tail = np.asarray(stream["tri_data"])[:, perm.size:]
    assert (tail[15] == -1.0).all() if tail.size else True

    # tiny camera motion (below resort_threshold): cached stream state is
    # REUSED (stale perm, exact output) and frames still agree
    camera2 = Camera((0.001, 0.5, 3.0), (0.0, -0.1, -1.0),
                     ViewFrustumParams(np.radians(45.0), 2.0, 0.1, 1.0e6))
    vp2 = camera2.view_projection_transform
    state2 = pre._maybe_restream(
        scene, pre._prepare(scene, vp2, camera2.position)[0], vp2)
    assert all(a is b for a, b in zip(state, state2)), "expected reuse"
    np.testing.assert_array_equal(
        np.asarray(pre(scene, vp2, camera2.position)),
        np.asarray(cls(scene, vp2, camera2.position)))

    # large motion (past threshold): stream state REFRESHES, still exact
    camera3 = Camera((0.5, 0.6, 2.0), (0.3, -0.2, -1.0),
                     ViewFrustumParams(np.radians(45.0), 2.0, 0.1, 1.0e6))
    vp3 = camera3.view_projection_transform
    state3 = pre._maybe_restream(
        scene, pre._prepare(scene, vp3, camera3.position)[0], vp3)
    assert any(a is not b for a, b in zip(state, state3)), "expected refresh"
    np.testing.assert_array_equal(
        np.asarray(pre(scene, vp3, camera3.position)),
        np.asarray(cls(scene, vp3, camera3.position)))

    # SCENE SWAP (animation: a rebuilt node_local array) must invalidate
    # the cached permuted-input state even with the camera unmoved — a
    # stale stream would rasterize the OLD instance matrices
    import dataclasses as _dc

    import jax.numpy as jnp

    shift = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.4)
    node_local2 = scene.node_local.at[1].set(shift @ scene.node_local[1])
    scene2 = _dc.replace(scene, node_local=node_local2)
    state4 = pre._maybe_restream(
        scene2, pre._prepare(scene2, vp3, camera3.position)[0], vp3)
    assert any(a is not b for a, b in zip(state3, state4)), (
        "scene swap must refresh the stream cache")
    np.testing.assert_array_equal(
        np.asarray(pre(scene2, vp3, camera3.position)),
        np.asarray(cls(scene2, vp3, camera3.position)))

"""The jitted per-frame render step.

This is the whole of the reference's Engine::Render recording + GPU execution
(engine.cppm:501-563, scene.cppm:314-342) as ONE pure function:

    frame_step(scene, camera) -> sRGB-encoded u8 framebuffer (planar 4xHxW)

  1. scene-graph transform propagation  (Model::Update, model.cppm:163-194)
  2. world-light gathering               (Scene::Update, scene.cppm:183-205)
  3. vertex world/clip transforms        (vertex.glsl)
  4. per-instance frustum culling        (Model::Render, model.cppm:760-768)
  5. triangle->tile binning              (the GPU's internal primitive binning)
  6. per-tile raster + PBR shade + MSAA resolve, fused (fragment.glsl +
     fixed-function raster state + render-pass resolve), component-first
     layouts throughout (see ops.shade_cf for the TPU layout rationale)

Being pure and jitted, frames pipeline through XLA async dispatch with no
host round-trips — the analogue of the reference's 2-frames-in-flight
fence/semaphore machinery (engine.cppm:40,505-562).

The output is PLANAR (3, H, W) uint8 RGB — channel-last (H, W, C) would pad
the trailing channel dim to 128 lanes on TPU (32x memory), and the alpha
plane is always 255, so it is synthesized host-side instead of paying 25%
more device->host transfer per frame. Hosts interleave with np.moveaxis
(see Window.present).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx.bounding_box import transform_aabbs
from vktf_tpu.mathx.frustum import aabbs_intersect_frustum, frustum_planes
from vktf_tpu.ops.binning import bin_triangles
from vktf_tpu.ops.raster_xla import SAMPLE_OFFSETS, rasterize_dense
from vktf_tpu.ops.raster_tiled import make_tile_raster
from vktf_tpu.ops.shade_cf import shade_samples_cf
from vktf_tpu.ops.vertex import (
    clip_transform,
    propagate_transforms,
    triangle_setup,
    triangle_setup_cm,
    vertex_world_transform,
)
from vktf_tpu.scene.flatten import RenderScene, SceneMeta


def gather_world_lights(node_global, light_node, light_type, light_color):
    """Extract world-space lights from node globals -> (L, 8).

    Columns 0:4 = position (w=1) or normalized +z direction (w=0), 4:7 =
    color, 7 = pad — exactly the WorldLight uniform layout
    (scene.cppm:42-63, EmplaceWorldLight scene.cppm:183-205).
    """
    if light_node.shape[0] == 0:
        return jnp.zeros((0, 8), jnp.float32)
    transforms = node_global[light_node]  # (L,4,4)
    z_axis = transforms[:, :3, 2]
    direction = z_axis / jnp.linalg.norm(z_axis, axis=-1, keepdims=True)
    position = transforms[:, :3, 3]
    is_point = (light_type == 1)[:, None]
    pos_or_dir = jnp.where(is_point, position, direction)
    w_flag = is_point.astype(jnp.float32)
    pad = jnp.ones((light_node.shape[0], 1), jnp.float32)
    return jnp.concatenate([pos_or_dir, w_flag, light_color, pad], axis=-1)


def linear_to_srgb_u8(linear):
    """Resolve-time sRGB encode (the swapchain's B8G8R8A8Srgb conversion,
    swapchain.cppm:76-85), then quantize to u8. Any shape."""
    c = jnp.clip(linear, 0.0, 1.0)
    srgb = jnp.where(c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)
    return (srgb * 255.0 + 0.5).astype(jnp.uint8)


def prepare_frame(scene: RenderScene, view_projection, camera_position,
                  *, meta: SceneMeta, config: RenderConfig):
    """Stages 1-5: geometry + light prep shared by all raster backends.

    Returns (setup, bins, lights, world, inst_matrix) where world =
    (pos, normal, tangent) per-vertex arrays and inst_matrix is the (I,4,4)
    per-instance world transform (consumed by the shade-table build). On the
    pallas backend, world is None (nothing downstream needs per-vertex
    arrays) and setup carries "mrows", the (T,16) per-triangle instance
    matrix rows shared by the shade-table build.
    """
    node_global = propagate_transforms(
        scene.node_local, scene.node_parent, meta.level_slices
    )
    lights = gather_world_lights(
        node_global, scene.light_node, scene.light_type, scene.light_color
    )

    inst_matrix = node_global[scene.inst_node]  # (I,4,4)
    # Viewport transform uses the LOGICAL width/height: the padded
    # framebuffer region beyond (width, height) is extra raster area that is
    # cropped away, NOT part of the projection. (Passing padded dims here
    # stretched every frame whose size wasn't a tile multiple — e.g. 1080p
    # rendered with a 0.7% vertical stretch against the 1088-row pad.)
    if config.resolved_backend() == "pallas":
        # component-major geometry path: no per-vertex stage at all — one
        # (T,16) instance-matrix row gather (reused by the shade-table
        # build) + flat (T,) corner math (triangle_setup_cm docstring)
        mrows = inst_matrix.reshape(-1, 16)[scene.tri_instance]
        setup = dict(triangle_setup_cm(
            scene.tri_corner, mrows, view_projection,
            config.width, config.height,
        ))
        setup["mrows"] = mrows
        world = None
    else:
        vert_matrix = inst_matrix[scene.vertex_instance]  # (V,4,4)
        world_pos, world_normal, world_tangent = vertex_world_transform(
            scene.positions, scene.normals, scene.tangents, vert_matrix
        )
        clip = clip_transform(world_pos, view_projection)
        world = (world_pos, world_normal, world_tangent)
        setup = dict(
            triangle_setup(clip, scene.indices, config.width, config.height)
        )

    # frustum culling (per instance = per primitive-draw)
    planes = frustum_planes(view_projection)
    world_aabbs = transform_aabbs(scene.inst_aabb, inst_matrix)
    visible = aabbs_intersect_frustum(world_aabbs, planes)
    setup["valid"] = setup["valid"] & visible[scene.tri_instance]

    bins = None
    if config.resolved_backend() == "tiled":
        bins = bin_triangles(
            setup["bbox"],
            setup["valid"],
            tile_shape=config.tile_shape,
            tiles_y=config.tiles_y,
            tiles_x=config.tiles_x,
            capacity=config.bin_capacity,
            k_pairs=config.k_pairs,
            large_capacity=config.large_capacity,
        )
    return setup, bins, lights, world, inst_matrix


def _shade_flat(tri_id_flat, sx_flat, sy_flat, scene, setup, world, lights,
                camera_position, background):
    world_pos, world_normal, world_tangent = world
    return shade_samples_cf(
        tri_id_flat,
        sx_flat,
        sy_flat,
        setup,
        scene.indices,
        world_pos,
        world_normal,
        world_tangent,
        scene.uvs,
        scene.tri_material,
        scene.mat_base_color,
        scene.mat_metallic_roughness,
        scene.mat_normal_scale,
        scene.mat_alpha,
        scene.mat_textures,
        scene.texture_pool,
        camera_position,
        lights,
        background,
    )


def _shade_layer_fn(config: RenderConfig, per_slot_samplers: bool,
                    fused_pool: bool = False):
    """Resolve the deferred-shade implementation (config.shade_impl).

    Returns fn(tri_c, sx_c, sy_c, table, quad_pool, camera_position, lights)
    -> (rgb (3, N), alpha (N,), covered (N,)). Default is the single-kernel
    Pallas form; mixed-sampler scenes (3x pool gathers per mip) stay on the
    XLA form, as does an explicit shade_impl="xla". fused_pool (kernel impl
    only): one fused-mip pool gather serves both trilinear levels — callers
    resolve it against the scene's static sampler properties
    (RenderConfig.resolved_fused_pool)."""
    from vktf_tpu.ops.shade_table import shade_table_layer

    multi_tap = config.aniso_taps > 1  # N-tap aniso: XLA form only
    impl = config.shade_impl
    if impl is None:
        impl = "xla" if (per_slot_samplers or multi_tap) else "kernel"
    if impl == "kernel" and not per_slot_samplers and not multi_tap:
        from vktf_tpu.ops.shade_kernel import shade_table_layer_kernel

        interpret = config.pallas_interpret
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"

        def fn(tri_c, sx_c, sy_c, table, quad_pool, camera_position, lights):
            return shade_table_layer_kernel(
                tri_c, sx_c, sy_c, table, quad_pool, camera_position,
                lights, max_anisotropy=config.max_anisotropy,
                interpret=interpret, fused_pool=fused_pool,
            )

        return fn

    def fn(tri_c, sx_c, sy_c, table, quad_pool, camera_position, lights):
        return shade_table_layer(
            tri_c, sx_c, sy_c, table, quad_pool, camera_position, lights,
            max_anisotropy=config.max_anisotropy,
            per_slot_samplers=per_slot_samplers,
            aniso_taps=config.aniso_taps,
        )

    return fn


def _tiled_winner(ids, deps, config: RenderConfig):
    """Per-pixel depth-winning triangle + coverage from raw raster blocks.

    ids/deps: (L, num_tiles, S*th, tw) in the raster kernel's block layout
    (row = y*S + s at interleave 1; strip/lane-packed at interleave m > 1 —
    ops.raster_pallas._raster_kernel docstring). Returns (id_px (L, n_px),
    frac (n_px,)) flattened in block-layout pixel order — the SAME order as
    _tiled_pixel_coords and _tiled_assemble — via reshapes + reductions
    only, no transposes.
    """
    layers, num_tiles, rows, tw = ids.shape
    th, tw_c = config.tile_shape
    assert tw == tw_c
    S = rows // th
    mi = config.resolved_interleave()
    if mi == 1:
        idp = ids.reshape(layers, num_tiles, th, S, tw)
        dep = deps.reshape(layers, num_tiles, th, S, tw)
        ax = 3
    else:
        # (rps, ym) merge to sample rows is contiguous; then (y, s) split
        cols = tw // mi
        shape = (layers, num_tiles, mi, th, S, cols)
        idp = ids.reshape(layers, num_tiles, mi, rows // mi, mi, cols
                          ).reshape(shape)
        dep = deps.reshape(layers, num_tiles, mi, rows // mi, mi, cols
                           ).reshape(shape)
        ax = 4
    imax = jnp.int32(2**31 - 1)
    d_min = jnp.min(dep, axis=ax, keepdims=True)
    cand = jnp.where((dep == d_min) & (idp >= 0), idp, imax)
    id_px = jnp.min(cand, axis=ax)
    id_px = jnp.where(id_px == imax, -1, id_px)
    frac = jnp.mean((idp[0] >= 0).astype(jnp.float32), axis=ax - 1)
    return id_px.reshape(layers, -1), frac.reshape(-1)


def _tiled_pixel_coords(config: RenderConfig, num_tiles: int):
    """Pixel-center (sx, sy) in block-layout order: flat (n_px,) f32 each."""
    th, tw = config.tile_shape
    tiles_x = config.tiles_x
    mi = config.resolved_interleave()
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    oy = (tile_ids // tiles_x) * th
    ox = (tile_ids % tiles_x) * tw
    if mi == 1:
        shape = (num_tiles, th, tw)
        ry = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        rx = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        sx = ox[:, None, None] + rx
        sy = oy[:, None, None] + ry
    else:
        cols = tw // mi
        shape = (num_tiles, mi, th, cols)
        strip = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ry = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        xl = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
        sx = ox[:, None, None, None] + strip * cols + xl
        sy = oy[:, None, None, None] + ry
    return (sx.astype(jnp.float32) + 0.5).reshape(-1), (
        sy.astype(jnp.float32) + 0.5).reshape(-1)


def _tiled_assemble(rgb_u8, config: RenderConfig):
    """(3, n_px) block-layout pixels -> (3, ph, pw) planar image."""
    th, tw = config.tile_shape
    ty, tx = config.tiles_y, config.tiles_x
    mi = config.resolved_interleave()
    if mi == 1:
        return (
            rgb_u8.reshape(3, ty, tx, th, tw)
            .transpose(0, 1, 3, 2, 4)
            .reshape(3, ty * th, tx * tw)
        )
    cols = tw // mi
    return (
        rgb_u8.reshape(3, ty, tx, mi, th, cols)
        .transpose(0, 1, 4, 2, 3, 5)  # (3, ty, th, tx, strip, cols)
        .reshape(3, ty * th, tx * tw)
    )


# Two-phase shade chunk size: large (the chunks exist only to bound the
# phase-boundary working set at 4K-scale); chunks are UNROLLED python
# slices, not a lax.map — a while loop carrying the 500 MB phase-boundary
# tensors defeats XLA's VMEM staging of the gather operands (measured: the
# pool silently lost its S(1) residency inside the loop and the pool
# gathers fell back to 6.6x-slower HBM rates).
_TWO_PHASE_CHUNK = 1 << 21


def _shade_chunks(n_px: int, config: RenderConfig):
    shade_chunk = min(_TWO_PHASE_CHUNK, n_px)
    n_pad = -(-n_px // shade_chunk) * shade_chunk
    return shade_chunk, n_pad


def _flat_pad_chunks(x, n_px, shade_chunk, n_pad, fill=0):
    x = x.reshape(-1)
    if n_pad - n_px:
        x = jnp.concatenate(
            [x, jnp.full((n_pad - n_px,), fill, x.dtype)]
        )
    return [x[c * shade_chunk:(c + 1) * shade_chunk]
            for c in range(n_pad // shade_chunk)]


def pallas_shade_addr_tiled(tri_id, depth, table, *, config: RenderConfig,
                            fused_pool: bool = False, y0=0,
                            px_slice=None):
    """Phase A of the two-program deferred shade (tile-layout, kernel impl).

    Winner/coverage reduction + the shade-TABLE row gather + pool row
    addressing, compiled as its own program so XLA stages the table into
    VMEM (see ops.shade_kernel.shade_addr_chunk: the table and the texel
    pool are both per-pixel gather operands but only one fits in VMEM at a
    time; HBM row gathers measured 6.6x slower). Returns the phase-boundary
    pytree consumed by pallas_shade_final_tiled.

    Multi-chip hooks (vktf_tpu.parallel): ``y0`` offsets the pixel-center
    sy coordinates (a band's place in screen space; traced scalar ok), and
    ``px_slice = (start, count)`` restricts phases A+B to a contiguous
    slice of the BLOCK-LAYOUT flat pixel stream — the gp ranks of a band
    each shade 1/gp of its pixels with the same production kernels
    (winner/coverage stays a cheap replicated reduction; measured
    tools/shard_shade_ab.py: this two-phase form is ~1.9x faster than the
    assembled one-program shade at (4,2)-shard pixel counts).
    """
    from vktf_tpu.ops.shade_kernel import shade_addr_chunk, shade_attrs_chunk

    attrs_mode = config.resolved_attrs_boundary()
    if attrs_mode and config.aniso_taps > 1:
        # shade_attrs_chunk carries no tap addressing: rendering would
        # silently degrade to single-tap (ADVICE r4 medium). The auto
        # impl gates route this combo to the XLA multi-tap form; reaching
        # here means an explicit shade_impl="kernel" override.
        raise ValueError(
            "aniso_taps > 1 is not supported with shade_attrs_boundary on "
            "the kernel two-phase path; use shade_impl='xla' (the auto "
            "gate's choice) for multi-tap attrs-boundary configs"
        )
    ids = tri_id if tri_id.ndim == 4 else tri_id[None]
    deps = depth if depth.ndim == 4 else depth[None]
    layers = ids.shape[0]
    num_tiles = ids.shape[1]
    th, tw = config.tile_shape
    id_px, frac = _tiled_winner(ids, deps, config)  # (L, n_px), (n_px,)
    sx, sy = _tiled_pixel_coords(config, num_tiles)
    if not (isinstance(y0, int) and y0 == 0):
        sy = sy + jnp.asarray(y0, jnp.float32)
    n_px = num_tiles * th * tw
    if px_slice is not None:
        start, count = px_slice
        start = jnp.asarray(start, jnp.int32)
        id_px = jax.lax.dynamic_slice(id_px, (0, start), (layers, count))
        frac = jax.lax.dynamic_slice(frac, (start,), (count,))
        sx = jax.lax.dynamic_slice(sx, (start,), (count,))
        sy = jax.lax.dynamic_slice(sy, (start,), (count,))
        n_px = count
    shade_chunk, n_pad = _shade_chunks(n_px, config)
    sxp = _flat_pad_chunks(sx, n_px, shade_chunk, n_pad)
    syp = _flat_pad_chunks(sy, n_px, shade_chunk, n_pad)

    fused = fused_pool and not attrs_mode  # attrs boundary stays classic
    # kernel-native multi-tap anisotropy rides the fused-pool form only
    # (per-tap fused rows; other scenes take the XLA multi-tap path)
    taps = config.aniso_taps if fused else 1
    ids_p, trows, r0s, r1s = [], [], [], []
    for l in range(layers):
        idp = _flat_pad_chunks(id_px[l], n_px, shade_chunk, n_pad, fill=-1)
        for tri_c, sx_c, sy_c in zip(idp, sxp, syp):
            if attrs_mode:
                trow, r0, r1 = shade_attrs_chunk(
                    tri_c, sx_c, sy_c, table,
                    max_anisotropy=config.max_anisotropy,
                )
            else:
                trow, r0, r1 = shade_addr_chunk(
                    tri_c, sx_c, sy_c, table,
                    max_anisotropy=config.max_anisotropy, fused_pool=fused,
                    pair_gather=config.resolved_pair_gather(),
                    aniso_taps=taps,
                )
            trows.append(trow)
            r0s.append(r0)
            r1s.append(r1)
        ids_p.extend(idp)
    return dict(
        ids=tuple(ids_p),      # L*n_chunks x (chunk,) i32
        trow=tuple(trows),     # L*n_chunks x (2*ROW, chunk) u16 (transposed
                               # table rows, hi/lo halves; shade_addr_chunk)
                               # — or (ATTR_PAD, chunk) f32 interpolated
                               # attr rows when config.shade_attrs_boundary
                               # (shade_attrs_chunk)
        r0=tuple(r0s),         # L*n_chunks x (chunk,) i32
        r1=tuple(r1s),
        sx=tuple(sxp),         # n_chunks x (chunk,) f32
        sy=tuple(syp),
        frac=frac,             # (n_px,) f32, block-layout pixel order
    )


def pallas_shade_final_tiled(addr, quad_pool, lights, camera_position, *,
                             config: RenderConfig,
                             fused_pool: bool = False,
                             assemble: bool = True):
    """Phase B of the two-program deferred shade: pool gathers + kernel +
    composite + resolve. Its only gather operand is the quad pool, which
    XLA stages into VMEM. Bit-identical to pallas_shade_resolve_tiled's
    kernel path (same math, same chunking).

    assemble=False returns the (3, n_px) u8 pixels in BLOCK-LAYOUT flat
    order instead of the assembled image — the multi-chip path all_gathers
    rank slices first and assembles once per band (_tiled_assemble)."""
    from vktf_tpu.ops.shade_kernel import (
        shade_final_attrs_chunk,
        shade_final_chunk,
    )

    attrs_mode = config.resolved_attrs_boundary()
    interpret = config.pallas_interpret
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    frac = addr["frac"]  # (n_px,) block-layout pixel order
    n_px = frac.shape[0]
    shade_chunk, n_pad = _shade_chunks(n_px, config)
    n_chunks = n_pad // shade_chunk
    layers = len(addr["ids"]) // n_chunks
    background = jnp.asarray(config.clear_color, jnp.float32)

    fused = fused_pool and not attrs_mode  # must match pallas_shade_addr_tiled

    def final_chunk(i, c, **kw):
        if attrs_mode:
            return shade_final_attrs_chunk(
                addr["trow"][i], addr["r0"][i], addr["r1"][i],
                addr["ids"][i], quad_pool, camera_position, lights,
                interpret=interpret,
                pool_rowmajor=config.resolved_pool_rowmajor(), **kw,
            )
        return shade_final_chunk(
            addr["trow"][i], addr["r0"][i], addr["r1"][i],
            addr["ids"][i], addr["sx"][c], addr["sy"][c], quad_pool,
            camera_position, lights,
            max_anisotropy=config.max_anisotropy, interpret=interpret,
            pool_rowmajor=config.resolved_pool_rowmajor(), fused_pool=fused,
            aniso_taps=config.aniso_taps if fused else 1,
            **kw,
        )

    if layers == 1 and config.shade_resolve_fuse:
        # single-layer fast path: composite + coverage resolve + sRGB u8
        # run INSIDE the kernel (_shade_resolve_kernel) — the XLA tail's
        # HBM passes over (4, n_px) f32 intermediates collapse into VPU
        # ops on tiles the fragment math already holds, and the kernel
        # output shrinks (4, n_px) f32 -> (n_px,) i32 packed bytes.
        # Bit-identical on hardware; won every interleaved frame_ab rep
        # (53-54 vs 75 ms whole-frame in that session's tunnel state).
        fracp = _flat_pad_chunks(frac, n_px, shade_chunk, n_pad)
        parts = [
            final_chunk(c, c, frac=fracp[c], background=background)
            for c in range(n_chunks)
        ]
        packed = jnp.concatenate(parts) if n_chunks > 1 else parts[0]
        packed = packed[:n_px]
        rgb_u8 = jnp.stack(
            [((packed >> (8 * c)) & 0xFF).astype(jnp.uint8)
             for c in range(3)]
        )
        if not assemble:
            return rgb_u8
        return _tiled_assemble(rgb_u8, config)

    rgbs, alphas = [], []
    for l in range(layers):
        parts_rgb, parts_a = [], []
        for c in range(n_chunks):
            i = l * n_chunks + c
            rgb, a, _covered = final_chunk(i, c)
            parts_rgb.append(rgb)
            parts_a.append(a)
        rgb = jnp.concatenate(parts_rgb, axis=1) if n_chunks > 1 else parts_rgb[0]
        a = jnp.concatenate(parts_a) if n_chunks > 1 else parts_a[0]
        rgbs.append(rgb[:, :n_px])
        alphas.append(a[:n_px])

    comp = jnp.broadcast_to(background[:3, None], rgbs[0].shape)
    for l in reversed(range(layers)):
        comp = rgbs[l] * alphas[l] + comp * (1.0 - alphas[l])
    frac_f = frac.reshape(1, n_px)
    resolved = comp * frac_f + background[:3, None] * (1.0 - frac_f)
    if not assemble:
        return linear_to_srgb_u8(resolved)
    return _tiled_assemble(linear_to_srgb_u8(resolved), config)


def pallas_shade_resolve_tiled(tri_id, depth, scene, table, lights,
                               camera_position, *, config: RenderConfig,
                               per_slot_samplers: bool = False,
                               fused_pool: bool = False):
    """Tile-layout shade + MSAA resolve + sRGB encode (single-chip path).

    Consumes the rasterizer's RAW per-tile blocks (num_tiles, S*th, tw)
    (row = y*S + s) — or (L, ...) peel layers — so the per-pixel
    winner/coverage reductions are pure reshapes and the two 33 MB
    id/depth assemble transposes disappear; only the final (3, H, W) u8
    image (6 MB) is assembled. Pixel-rate only (the production default);
    sample-rate uses the assembled path.

    Shading dispatches through _shade_layer_fn: by default the XLA row
    gathers feed ONE Pallas kernel for everything after them
    (ops.shade_kernel, measured 75 -> 48 ms at Sponza scale). Round 1's
    reverted multi-kernel split — several kernels with gathers BETWEEN them
    — measured 10 ms SLOWER; the single-kernel form has no phase boundary
    to rematerialize.
    """

    ids = tri_id if tri_id.ndim == 4 else tri_id[None]
    deps = depth if depth.ndim == 4 else depth[None]
    layers, num_tiles, rows, tw = ids.shape
    th, tw_c = config.tile_shape
    assert tw == tw_c
    background = jnp.asarray(config.clear_color, jnp.float32)

    # per-pixel winner + coverage + pixel-center coordinates, all in
    # block-layout flat order (reshapes + reductions only)
    id_px, frac = _tiled_winner(ids, deps, config)  # (L, n_px), (n_px,)
    sx, sy = _tiled_pixel_coords(config, num_tiles)

    n_px = num_tiles * th * tw
    # Small scenes shade with EMPTY-chunK SKIPPING: a 12-triangle 1080p
    # frame measured the same ~100 ms as Sponza because every pixel paid
    # the 3 row-gathers + BRDF regardless of coverage, and uncovered pixels
    # contribute exactly nothing to the composite (alpha 0, frac 0), so a
    # lax.cond skipping all-uncovered 32k-pixel chunks is bit-exact (A/B
    # verified; 12-triangle frame 100 -> 29 ms). But the cond collapses the
    # cross-chunk gather pipelining XLA gives the plain map — a FULLY
    # covered frame measured 99 -> 449 ms with conds — so the mode is a
    # STATIC choice by scene size: a scene under 32k triangles cannot come
    # close to covering 2M pixels densely, a Sponza-scale one always does.
    if config.shade_skip_mode is not None:
        # explicit override (ADVICE r1: a small scene that fully covers the
        # screen — fullscreen quad, skybox — wants skip_mode off; the
        # triangle-count proxy cannot see coverage)
        skip_mode = config.shade_skip_mode
    else:
        skip_mode = table.shape[0] <= 32768  # static scene size
    if skip_mode:
        shade_chunk = min(max(th * tw * 4, 32768), n_px)
    else:
        shade_chunk = min(config.shade_chunk, n_px)
    n_pad = -(-n_px // shade_chunk) * shade_chunk
    pad = n_pad - n_px

    def flat_pad(x, fill=0):
        x = x.reshape(-1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), fill, x.dtype)]
            )
        return x.reshape(n_pad // shade_chunk, shade_chunk)

    shade_layer = _shade_layer_fn(config, per_slot_samplers, fused_pool)

    def shade_one(args):
        tri_c, sx_c, sy_c = args

        def do(_):
            rgb, a, _covered = shade_layer(
                tri_c, sx_c, sy_c, table, scene.quad_pool,
                camera_position, lights,
            )
            return rgb, a

        if not skip_mode:
            return do(None)

        def skip(_):
            return (jnp.zeros((3, shade_chunk), jnp.float32),
                    jnp.zeros((shade_chunk,), jnp.float32))

        return jax.lax.cond(jnp.any(tri_c >= 0), do, skip, None)

    sxp, syp = flat_pad(sx), flat_pad(sy)
    rgbs, alphas = [], []
    for l in range(layers):
        # pad ids with -1 (background): 0 is a real triangle id, and a
        # 0-padded tail chunk always failed the skip test AND gathered real
        # table/pool rows for lanes that are sliced off anyway (ADVICE r1)
        rgb, a = jax.lax.map(shade_one, (flat_pad(id_px[l], fill=-1), sxp, syp))
        rgbs.append(rgb.transpose(1, 0, 2).reshape(3, n_pad)[:, :n_px])
        alphas.append(a.reshape(n_pad)[:n_px])

    comp = jnp.broadcast_to(background[:3, None], rgbs[0].shape)
    for l in reversed(range(layers)):
        comp = rgbs[l] * alphas[l] + comp * (1.0 - alphas[l])
    frac_f = frac.reshape(1, n_px)
    resolved = comp * frac_f + background[:3, None] * (1.0 - frac_f)
    # assemble the final u8 image (6 MB) — the only transpose left
    return _tiled_assemble(linear_to_srgb_u8(resolved), config)


def pallas_shade_resolve(tri_id, scene, table, lights, camera_position,
                         *, config: RenderConfig, y0=0, depth=None,
                         per_slot_samplers: bool = False,
                         fused_pool: bool = False):
    """Shade-table shading + MSAA resolve + sRGB encode of a visibility block.

    tri_id: (S, h, w) winner ids — or (L, S, h, w) depth-peeled layers,
    nearest first — at framebuffer pixel-row offset y0 (y0 may be traced;
    the multi-chip path passes each device's band offset). depth carries the
    matching per-sample depths when pixel-rate shading should pick the
    depth-winning sample's triangle (None -> max-id fallback). Layers
    composite front-to-back with glTF alphaMode semantics
    (OPAQUE/MASK/BLEND) over the clear color. Returns planar (3, h, w) uint8.
    """
    ids = tri_id if tri_id.ndim == 4 else tri_id[None]
    layers, S, h, w = ids.shape
    offsets = np.asarray(SAMPLE_OFFSETS[config.msaa_samples], np.float32)
    background = jnp.asarray(config.clear_color, jnp.float32)
    y_off = jnp.asarray(y0, jnp.float32)
    shade_layer = _shade_layer_fn(config, per_slot_samplers, fused_pool)

    def shade_chunked(layer_ids, sx_flat, sy_flat):
        """Shade each layer of flat samples; returns (rgb (L,3,N), a (L,N)).

        Chunked because every per-sample row gather materializes a
        lane-padded buffer — a full 8.3M-sample frame would hold several-GB
        intermediates at once (measured OOM).
        """
        n = sx_flat.shape[0]
        shade_chunk = min(config.shade_chunk, n)
        n_pad = -(-n // shade_chunk) * shade_chunk
        pad = n_pad - n

        def flat_pad(x, fill=0):
            # ids pad with -1 (background): 0 is a real triangle id, and a
            # 0-padded tail chunk would gather real table/pool rows for
            # lanes that are sliced off anyway (ADVICE r1)
            if pad:
                x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
            return x.reshape(n_pad // shade_chunk, shade_chunk)

        def shade_one(args):
            tri_c, sx_c, sy_c = args
            rgb, a, _covered = shade_layer(
                tri_c, sx_c, sy_c, table, scene.quad_pool,
                camera_position, lights,
            )
            return rgb, a  # (3, chunk), (chunk,)

        sxp, syp = flat_pad(sx_flat), flat_pad(sy_flat)
        out_rgb, out_a = [], []
        for l in range(layers):
            rgb, a = jax.lax.map(
                shade_one, (flat_pad(layer_ids[l], fill=-1), sxp, syp)
            )
            out_rgb.append(rgb.transpose(1, 0, 2).reshape(3, n_pad)[:, :n])
            out_a.append(a.reshape(n_pad)[:n])
        return out_rgb, out_a

    def composite(rgbs, alphas):
        """Front-to-back over() of the shaded layers onto the clear color."""
        comp = jnp.broadcast_to(background[:3, None], rgbs[0].shape)
        for l in reversed(range(layers)):
            comp = rgbs[l] * alphas[l] + comp * (1.0 - alphas[l])
        return comp

    if config.shading_rate == "pixel" and S > 1:
        # Vulkan non-sampleShading semantics: shade once per pixel at the
        # center, resolve by per-sample coverage fraction. 4x cheaper at
        # 4x MSAA; silhouette-vs-background edges resolve exactly,
        # object-object sample edges approximate to the pixel winner —
        # chosen as the DEPTH-winning sample's triangle when depths are
        # available (max id would pick an arbitrary triangle now that the
        # stream is Morton-reordered).
        n_px = h * w
        if depth is not None:
            depths = depth if depth.ndim == 4 else depth[None]
            imax = jnp.int32(2**31 - 1)
            d_min = jnp.min(depths, axis=1, keepdims=True)  # (L,1,h,w)
            cand = jnp.where((depths == d_min) & (ids >= 0), ids, imax)
            id_px = jnp.min(cand, axis=1)
            id_px = jnp.where(id_px == imax, -1, id_px).reshape(layers, n_px)
        else:
            id_px = jnp.max(ids, axis=1).reshape(layers, n_px)
        py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + y_off
        px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        rgbs, alphas = shade_chunked(
            id_px, (px + 0.5).reshape(n_px), (py + 0.5).reshape(n_px)
        )
        comp = composite(rgbs, alphas).reshape(3, h, w)
        frac = jnp.mean((ids[0] >= 0).astype(jnp.float32), axis=0)  # (h,w)
        resolved = comp * frac + background[:3, None, None] * (1.0 - frac)
    else:
        py = jax.lax.broadcasted_iota(jnp.float32, (S, h, w), 1) + y_off
        px = jax.lax.broadcasted_iota(jnp.float32, (S, h, w), 2)
        sx = px + offsets[:, 0][:, None, None]
        sy = py + offsets[:, 1][:, None, None]
        n = S * h * w
        rgbs, alphas = shade_chunked(
            ids.reshape(layers, n), sx.reshape(n), sy.reshape(n)
        )
        comp = composite(rgbs, alphas)
        resolved = jnp.mean(comp.reshape(3, S, h, w), axis=1)
    return linear_to_srgb_u8(resolved)


def make_tile_render(scene, setup, bins, lights, camera_position, world,
                     *, config: RenderConfig):
    """Build tile_render(tile_idx) -> (3, th, tw) uint8: fused raster + shade
    + MSAA resolve + sRGB encode for one framebuffer tile."""
    th, tw = config.tile_shape
    S = len(SAMPLE_OFFSETS[config.msaa_samples])
    offsets = np.asarray(SAMPLE_OFFSETS[config.msaa_samples], np.float32)
    background = jnp.asarray(config.clear_color, jnp.float32)

    tile_raster = make_tile_raster(
        setup,
        bins,
        tile_shape=config.tile_shape,
        tiles_x=config.tiles_x,
        bin_capacity=config.bin_capacity,
        msaa_samples=config.msaa_samples,
        chunk=config.raster_chunk,
    )

    n = S * th * tw
    ly = jax.lax.broadcasted_iota(jnp.float32, (S, th, tw), 1)
    lx = jax.lax.broadcasted_iota(jnp.float32, (S, th, tw), 2)
    lsx = (lx + offsets[:, 0][:, None, None]).reshape(n)
    lsy = (ly + offsets[:, 1][:, None, None]).reshape(n)

    def tile_render(tile_idx):
        tri_id, _depth = tile_raster(tile_idx)  # (S, th, tw)
        tri_flat = jax.lax.optimization_barrier(tri_id.reshape(n))
        oy = ((tile_idx // config.tiles_x) * th).astype(jnp.float32)
        ox = ((tile_idx % config.tiles_x) * tw).astype(jnp.float32)
        rgba = _shade_flat(
            tri_flat, lsx + ox, lsy + oy, scene, setup, world, lights,
            camera_position, background,
        )  # (4, n)
        resolved = jnp.mean(rgba.reshape(4, S, th * tw), axis=1)  # (4, th*tw)
        return linear_to_srgb_u8(resolved[:3]).reshape(3, th, tw)

    return tile_render


def render_frame(
    scene: RenderScene,
    camera_view_projection,
    camera_position,
    *,
    meta: SceneMeta,
    config: RenderConfig,
) -> jnp.ndarray:
    """Render one frame; returns PLANAR (3, H, W) uint8 RGB (sRGB)."""
    height, width = config.height, config.width
    ph, pw = config.padded_height, config.padded_width

    with jax.named_scope("vktf.prepare"):
        setup, bins, lights, world, inst_matrix = prepare_frame(
            scene, camera_view_projection, camera_position, meta=meta, config=config
        )
    backend = config.resolved_backend()

    if backend == "pallas":
        # Pallas streaming raster + shade-table deferred shading: the
        # production TPU path (ops.raster_pallas / ops.shade_table).
        from vktf_tpu.ops.raster_pallas import rasterize_pallas
        from vktf_tpu.ops.shade_table import build_shade_table_pallas

        interpret = config.pallas_interpret
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        # Stage barriers: XLA's cross-stage fusion of the geometry pipeline
        # into the raster/shade consumers blows up compile time (measured
        # minutes -> hours at 1080p); barriers keep stages separate.
        setup = jax.lax.optimization_barrier(setup)
        # tile-layout pixel-rate path for ALL msaa counts: at S=1 the
        # single sample IS the pixel center (SAMPLE_OFFSETS[1] = (0.5,
        # 0.5)) and coverage frac is 0/1, so pixel-rate == sample-rate
        # exactly — and the tiled two-phase shade is the fast path
        # (duck 1080p 1xMSAA measured 23.5 -> ~9 ms, bench --all).
        tiled_resolve = config.shading_rate == "pixel"
        with jax.named_scope("vktf.raster"):
            tri_id, depth = rasterize_pallas(
                setup, ph, pw, tile_shape=config.tile_shape,
                msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
                interpret=interpret, sort="morton",
                layers=config.resolved_peel_layers(meta.peel_layers),
                window_rows=config.raster_window_rows,
                group_size=config.raster_group_size,
                interleave=config.resolved_interleave(),
                columns=config.raster_columns,
                assemble=not tiled_resolve,
            )
        tri_id, depth = jax.lax.optimization_barrier((tri_id, depth))
        with jax.named_scope("vktf.shade_table"):
            table = jax.lax.optimization_barrier(
                build_shade_table_pallas(setup, scene, inst_matrix,
                                         interpret=interpret)
            )
        fused_pool = config.resolved_fused_pool(
            mirror_wrap=meta.mirror_wrap,
            mixed_samplers=meta.mixed_samplers,
        )
        with jax.named_scope("vktf.shade_resolve"):
            if tiled_resolve:
                rgba = pallas_shade_resolve_tiled(
                    tri_id, depth, scene, table, lights, camera_position,
                    config=config, per_slot_samplers=meta.mixed_samplers,
                    fused_pool=fused_pool,
                )
            else:
                rgba = pallas_shade_resolve(
                    tri_id, scene, table, lights, camera_position,
                    config=config, depth=depth,
                    per_slot_samplers=meta.mixed_samplers,
                    fused_pool=fused_pool,
                )
        return rgba[:, :height, :width]

    if backend in ("dense", "xla"):
        # debug/reference path: dense visibility then one flat shade pass
        tri_id, _depth = rasterize_dense(
            setup, ph, pw, msaa_samples=config.msaa_samples,
            chunk=min(config.raster_chunk, 8),
        )
        tri_id = jax.lax.optimization_barrier(tri_id)
        offsets = np.asarray(SAMPLE_OFFSETS[config.msaa_samples], np.float32)
        S = offsets.shape[0]
        py = jax.lax.broadcasted_iota(jnp.float32, (S, ph, pw), 1)
        px = jax.lax.broadcasted_iota(jnp.float32, (S, ph, pw), 2)
        sx = px + offsets[:, 0][:, None, None]
        sy = py + offsets[:, 1][:, None, None]
        n = S * ph * pw
        background = jnp.asarray(config.clear_color, jnp.float32)
        rgba = _shade_flat(
            tri_id.reshape(n), sx.reshape(n), sy.reshape(n), scene, setup,
            world, lights, camera_position, background,
        )  # (4, n)
        resolved = jnp.mean(rgba.reshape(4, S, ph, pw), axis=1)
        return linear_to_srgb_u8(resolved[:3, :height, :width])

    tile_render = make_tile_render(
        scene, setup, bins, lights, camera_position, world, config=config
    )
    tiles = jax.lax.map(
        tile_render,
        jnp.arange(config.num_tiles, dtype=jnp.int32),
        batch_size=config.tile_batch,
    )  # (num_tiles, 3, th, tw)

    th, tw = config.tile_shape
    image = (
        tiles.reshape(config.tiles_y, config.tiles_x, 3, th, tw)
        .transpose(2, 0, 3, 1, 4)
        .reshape(3, ph, pw)
    )
    return image[:, :height, :width]


class PallasFrameProgram:
    """The pallas frame pipeline as per-stage jit programs.

    Functionally identical to the fused render_frame (same stages, same
    optimization-barrier boundaries — the barriers already prevented
    cross-stage fusion inside the fused program), but compiled as four
    programs instead of one:

      * cold compile drops from minutes to the sum of much smaller stage
        compiles (XLA compile time is superlinear in program size;
        BENCH_r01 paid 314 s for the fused 1080p frame);
      * a source edit invalidates only the stage it touched in the
        persistent cache;
      * the Morton stream permutation becomes a cached cross-frame input:
        the ~9 ms/frame argsort reruns only when the camera has moved past
        ``config.resort_threshold`` (sort order affects raster locality,
        never output — lexicographic depth ties use original draw ids).

    Frames still pipeline through XLA async dispatch: every stage call is
    non-blocking, so N-deep frames-in-flight behaves exactly as with the
    fused program.
    """

    def __init__(self, meta: SceneMeta, config: RenderConfig):
        from vktf_tpu.ops.raster_pallas import rasterize_pallas, stream_perm
        from vktf_tpu.ops.shade_table import build_shade_table_pallas

        self.meta = meta
        self.config = config
        interpret = config.pallas_interpret
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        ph, pw = config.padded_height, config.padded_width
        height, width = config.height, config.width
        # tile-layout pixel-rate path for ALL msaa counts: at S=1 the
        # single sample IS the pixel center (SAMPLE_OFFSETS[1] = (0.5,
        # 0.5)) and coverage frac is 0/1, so pixel-rate == sample-rate
        # exactly — and the tiled two-phase shade is the fast path
        # (duck 1080p 1xMSAA measured 23.5 -> ~9 ms, bench --all).
        tiled_resolve = config.shading_rate == "pixel"

        def prepare(scene, view_projection, camera_position):
            setup, _bins, lights, _world, _inst = prepare_frame(
                scene, view_projection, camera_position,
                meta=meta, config=config,
            )
            return setup, lights

        # Camera-independent half of prepare, cached across frames (see
        # _maybe_scene_update): node transform propagation (Model::Update,
        # model.cppm:163-194), world lights (scene.cppm:183-205), the
        # (T,16) instance-matrix row gather, and world AABBs. Split from
        # the camera half below; together they compute exactly
        # prepare_frame's pallas branch.
        def scene_update(scene):
            node_global = propagate_transforms(
                scene.node_local, scene.node_parent, meta.level_slices
            )
            lights = gather_world_lights(
                node_global, scene.light_node, scene.light_type,
                scene.light_color,
            )
            inst_matrix = node_global[scene.inst_node]
            mrows = inst_matrix.reshape(-1, 16)[scene.tri_instance]
            # component-major copy for the Mosaic setup kernel, transposed
            # ONCE per scene change instead of per frame (the (T,16)
            # row-major form is 8x lane-padded; re-reading it every frame
            # cost a per-frame relayout pass)
            mrowsT = mrows.T
            world_aabbs = transform_aabbs(scene.inst_aabb, inst_matrix)
            return mrows, mrowsT, lights, world_aabbs

        use_packed = config.prepare_packed
        if use_packed is None:
            use_packed = True
        prepare_impl = config.resolved_prepare_impl()

        def prepare_cam(scene, mrows, mrowsT, world_aabbs,
                        view_projection):
            # FLAT component-major setup -> PACKED stream rows (round 5):
            # the legacy (T,3,3)/(T,2,3) dict forced XLA into lane-padded
            # fusion layouts costing ~3.5 ms/frame; the flat pipeline
            # stacks once into dense (C, T) rows and also absorbs the
            # raster program's ~1.1 ms pack_tri_data for free (same
            # expressions, bit-identical output — tools/prepare_anatomy.py,
            # pinned by test_pallas_pipeline packed-vs-legacy bit-equality).
            # Culling: the packed path uses the PER-TRIANGLE screen cull
            # (raster_pallas._packed_valid — frame-identical, and the
            # legacy per-instance gather was the stage's hottest op at
            # 1.5-1.9 ms, tools/prepare_profile.py); the legacy dict path
            # keeps the reference-shaped per-instance frustum cull.
            if not use_packed:  # legacy dict form (A/B: prepare_packed)
                planes = frustum_planes(view_projection)
                visible = aabbs_intersect_frustum(world_aabbs, planes)
                setup = dict(triangle_setup_cm(
                    scene.tri_corner, mrows, view_projection,
                    config.width, config.height,
                ))
                setup["mrows"] = mrows
                setup["valid"] = setup["valid"] & visible[scene.tri_instance]
                return setup
            if prepare_impl == "kernel":
                # ONE-pass Mosaic setup (ops/setup_kernel.py): the whole
                # per-triangle stage in VMEM, single launch
                from vktf_tpu.ops.setup_kernel import setup_pack_kernel

                visf = jnp.ones(
                    (1, scene.tri_corner.shape[1]), jnp.float32
                )
                packed = setup_pack_kernel(
                    scene.tri_corner, mrowsT, visf, view_projection,
                    config.width, config.height, interpret=interpret,
                )
                packed["mrows"] = mrows
                return packed
            from vktf_tpu.ops.raster_pallas import pack_tri_rows

            flat = triangle_setup_cm(
                scene.tri_corner, mrows, view_projection,
                config.width, config.height, flat_out=True,
            )
            packed = pack_tri_rows(flat)
            packed["mrows"] = mrows
            return packed

        def perm_fn(setup):
            return stream_perm(setup, chunk=config.pallas_chunk)

        def raster(setup, perm):
            return rasterize_pallas(
                setup, ph, pw, tile_shape=config.tile_shape,
                msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
                interpret=interpret, sort="none", perm=perm,
                layers=config.resolved_peel_layers(meta.peel_layers),
                window_rows=config.raster_window_rows,
                group_size=config.raster_group_size,
                interleave=config.resolved_interleave(),
                columns=config.raster_columns,
                assemble=not tiled_resolve,
            )

        # Pre-permuted raster stream (config.raster_prestream): the
        # in-raster permute is a 28-row LANE-dim gather measured at
        # ~18.5 ms/frame (262k tris) — ~97% of the raster program's XLA
        # prologue (tools/raster_prologue_probe.py). Instead, a second
        # setup-kernel pass runs per frame over perm-gathered inputs
        # (cached across frames, refreshed on resort: _maybe_restream)
        # and emits the stream rows ALREADY in Morton order; the raster
        # then runs with perm=None. Bit-identical frames (per-lane setup
        # math is position-independent — the sharded micro-shard
        # argument; pinned in tests/test_pallas_pipeline.py).
        prestream = config.raster_prestream
        if prestream is None:
            prestream = use_packed and prepare_impl == "kernel"
        self._prestream = bool(prestream and use_packed
                               and prepare_impl == "kernel")

        def stream_cam(tc_p, mrtT_p, visf_p, ids_p, view_projection):
            # the SAME kernel program as prepare_cam's pass (ids input,
            # keep_pad) — per-lane outputs bit-identical by construction;
            # only the raster stream keys flow out (edge9/anchor2 here are
            # PERMUTED and must never reach the table build)
            from vktf_tpu.ops.setup_kernel import setup_pack_kernel

            packed = setup_pack_kernel(
                tc_p, mrtT_p, visf_p, view_projection,
                config.width, config.height, ids=ids_p,
                interpret=interpret, keep_pad=True,
            )
            return dict(tri_data=packed["tri_data"],
                        bbox_rows=packed["bbox_rows"],
                        valid=packed["valid"])

        def perm_inputs(tri_corner, mrowsT, perm):
            # stream-ordered copies of the setup kernel's inputs; runs
            # only when the cached permutation refreshes (resort), so the
            # 54-row gather amortizes across the resort interval
            t = tri_corner.shape[1]
            pad = perm.shape[0] - t
            tc = jnp.pad(tri_corner, ((0, 0), (0, pad)))[:, perm]
            mrt = jnp.pad(mrowsT, ((0, 0), (0, pad)))[:, perm]
            visf = (perm < t).astype(jnp.float32)[None]
            ids = perm.astype(jnp.float32)[None]
            return tc, mrt, visf, ids

        def raster_stream(stream):
            return rasterize_pallas(
                stream, ph, pw, tile_shape=config.tile_shape,
                msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
                interpret=interpret, sort="none", perm=None,
                layers=config.resolved_peel_layers(meta.peel_layers),
                window_rows=config.raster_window_rows,
                group_size=config.raster_group_size,
                interleave=config.resolved_interleave(),
                columns=config.raster_columns,
                assemble=not tiled_resolve,
            )

        def table_fn(setup, scene):
            return build_shade_table_pallas(
                setup, scene, None, interpret=interpret
            )

        fused_pool = config.resolved_fused_pool(
            mirror_wrap=meta.mirror_wrap,
            mixed_samplers=meta.mixed_samplers,
        )

        # device-side present encoding (preview downsample + optional yuv
        # pack) fused into the final stage (the frame's last producer — no
        # extra program launch or HBM pass)
        from vktf_tpu.ops.present import make_present_encoder

        _present_enc = make_present_encoder(config)

        def shade(tri_id, depth, table, scene, lights, camera_position):
            if tiled_resolve:
                rgba = pallas_shade_resolve_tiled(
                    tri_id, depth, scene, table, lights, camera_position,
                    config=config, per_slot_samplers=meta.mixed_samplers,
                    fused_pool=fused_pool,
                )
            else:
                rgba = pallas_shade_resolve(
                    tri_id, scene, table, lights, camera_position,
                    config=config, depth=depth,
                    per_slot_samplers=meta.mixed_samplers,
                    fused_pool=fused_pool,
                )
            return _present_enc(rgba[:, :height, :width])

        # Two-program shade (phase A stages the shade TABLE in VMEM, phase B
        # the texel POOL — they don't fit together; HBM row gathers measured
        # 6.6x slower than VMEM ones). Applies to the production configuration
        # only: tile-layout pixel-rate resolve, kernel impl, no chunk skipping
        # (large scenes).
        impl = config.shade_impl
        if impl is None:
            # multi-tap aniso is kernel-native only on the fused-pool
            # NON-attrs two-phase form (per-tap fused rows;
            # shade_attrs_chunk carries no tap addressing — ADVICE r4
            # medium: attrs mode used to fall through here and silently
            # shade single-tap); other multi-tap scenes go through the
            # XLA form like mixed samplers
            kernel_taps_ok = fused_pool and not config.resolved_attrs_boundary()
            impl = ("xla" if (meta.mixed_samplers
                              or (config.aniso_taps > 1 and not kernel_taps_ok))
                    else "kernel")
        skip_mode = config.shade_skip_mode
        if skip_mode is None:
            skip_mode = meta.num_triangles <= 32768
        self._two_phase = (tiled_resolve and impl == "kernel"
                           and not skip_mode)
        if self._two_phase:
            def shade_addr(tri_id, depth, table):
                return pallas_shade_addr_tiled(
                    tri_id, depth, table, config=config,
                    fused_pool=fused_pool,
                )

            def shade_final(addr, scene, lights, camera_position):
                rgba = pallas_shade_final_tiled(
                    addr, scene.quad_pool, lights, camera_position,
                    config=config, fused_pool=fused_pool,
                )
                return _present_enc(rgba[:, :height, :width])

            self._shade_addr = jax.jit(shade_addr)
            self._shade_final = jax.jit(shade_final)

        cache_scene = config.prepare_scene_cache
        if cache_scene is None:
            cache_scene = True
        self._prepare_fused = jax.jit(prepare)
        self._scene_update = jax.jit(scene_update)
        self._prepare_cam = jax.jit(prepare_cam)
        self._scene_key = None
        self._scene_state = None
        if cache_scene:
            def prepare_cached(scene, view_projection, camera_position):
                mrows, mrowsT, lights, aabbs = self._maybe_scene_update(
                    scene)
                setup = self._prepare_cam(scene, mrows, mrowsT, aabbs,
                                          view_projection)
                return setup, lights

            self._prepare = prepare_cached
        else:
            self._prepare = self._prepare_fused
        self._perm_fn = jax.jit(perm_fn)
        self._raster = jax.jit(raster)
        self._table = jax.jit(table_fn)
        self._shade = jax.jit(shade)
        self._perm = None
        self._sort_vp = None
        # prestream requires the cached scene state (mrowsT); the fused
        # prepare path keeps the classic in-raster permute
        self._prestream = self._prestream and cache_scene
        self._stream_cam = jax.jit(stream_cam)
        self._perm_inputs = jax.jit(perm_inputs)
        self._raster_stream = jax.jit(raster_stream)
        self._stream_state = None
        self._stream_key = None

    def _maybe_scene_update(self, scene):
        """Cross-frame cache of the camera-independent prepare half.

        jax arrays are immutable, so identity of every input array
        scene_update reads implies identical values; animation that swaps
        in new node transforms (a new node_local array / a rebuilt scene
        pytree) naturally invalidates. The strong refs in _scene_key keep
        id() stable against reuse-after-GC.
        """
        key = (scene.node_local, scene.node_parent, scene.light_node,
               scene.light_type, scene.light_color, scene.inst_node,
               scene.tri_instance, scene.inst_aabb)
        if self._scene_state is None or any(
            a is not b for a, b in zip(key, self._scene_key)
        ):
            self._scene_state = self._scene_update(scene)
            self._scene_key = key
        return self._scene_state

    def _maybe_resort(self, setup, view_projection):
        vp = np.asarray(view_projection, dtype=np.float64)
        if self._perm is not None and self.config.resort_threshold > 0:
            ref = self._sort_vp
            if (np.linalg.norm(vp - ref)
                    <= self.config.resort_threshold * np.linalg.norm(ref)):
                return self._perm
        self._perm = self._perm_fn(setup)
        self._sort_vp = vp
        return self._perm

    def _maybe_restream(self, scene, setup, view_projection):
        """Cross-frame cache of the PRE-PERMUTED setup-kernel inputs
        (config.raster_prestream): refreshed only when the cached stream
        permutation itself refreshes (resort) or the scene state swaps —
        jax array identity implies identical values, as _maybe_scene_update.
        """
        perm = self._maybe_resort(setup, view_projection)
        _mrows, mrowsT, _lights, _aabbs = self._maybe_scene_update(scene)
        key = (perm, mrowsT, scene.tri_corner)
        if self._stream_state is None or any(
            a is not b for a, b in zip(key, self._stream_key)
        ):
            self._stream_state = self._perm_inputs(
                scene.tri_corner, mrowsT, perm
            )
            self._stream_key = key
        return self._stream_state

    def __call__(self, scene, view_projection, camera_position):
        setup, lights = self._prepare(scene, view_projection, camera_position)
        if self._prestream:
            state = self._maybe_restream(scene, setup, view_projection)
            tri_id, depth = self._raster_stream(
                self._stream_cam(*state, view_projection)
            )
        else:
            perm = self._maybe_resort(setup, view_projection)
            tri_id, depth = self._raster(setup, perm)
        table = self._table(setup, scene)
        if self._two_phase:
            addr = self._shade_addr(tri_id, depth, table)
            return self._shade_final(addr, scene, lights, camera_position)
        return self._shade(tri_id, depth, table, scene, lights,
                           camera_position)

    def warmup(self, scene, view_projection, camera_position):
        """Compile every stage (AOT analogue); blocks until done."""
        out = self(scene, view_projection, camera_position)
        np.asarray(out)
        return out


def make_frame_fn(meta: SceneMeta, config: RenderConfig):
    """Build the frame function for a given static scene shape.

    Returns a jitted function, or (pallas backend with split_stages, the
    default) a PallasFrameProgram — same call signature, per-stage compiled.
    """
    if config.resolved_backend() == "pallas" and config.split_stages:
        return PallasFrameProgram(meta, config)

    from vktf_tpu.ops.present import make_present_encoder

    _present_enc = make_present_encoder(config)

    def frame(scene, view_projection, camera_position):
        out = render_frame(
            scene, view_projection, camera_position, meta=meta, config=config
        )
        return _present_enc(out)

    return jax.jit(frame)

"""The jitted per-frame render step.

This is the whole of the reference's Engine::Render recording + GPU execution
(engine.cppm:501-563, scene.cppm:314-342) as ONE pure function:

    frame_step(scene, camera) -> sRGB-encoded u8 framebuffer

  1. scene-graph transform propagation  (Model::Update, model.cppm:163-194)
  2. world-light gathering               (Scene::Update, scene.cppm:183-205)
  3. vertex world/clip transforms        (vertex.glsl)
  4. per-instance frustum culling        (Model::Render, model.cppm:760-768)
  5. visibility rasterization + depth    (fixed-function raster state)
  6. deferred PBR shading per sample     (fragment.glsl)
  7. MSAA resolve + sRGB encode          (render pass resolve attachment)

Being pure and jitted, frames pipeline through XLA async dispatch with no
host round-trips — the analogue of the reference's 2-frames-in-flight
fence/semaphore machinery (engine.cppm:40,505-562).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx.bounding_box import transform_aabbs
from vktf_tpu.mathx.frustum import aabbs_intersect_frustum, frustum_planes
from vktf_tpu.ops.raster_xla import SAMPLE_OFFSETS, rasterize_dense
from vktf_tpu.ops.shade import shade_deferred
from vktf_tpu.ops.vertex import (
    clip_transform,
    propagate_transforms,
    triangle_setup,
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


def linear_to_srgb_u8(linear_rgb):
    """Resolve-time sRGB encode (the swapchain's B8G8R8A8Srgb conversion,
    swapchain.cppm:76-85), then quantize to u8."""
    c = jnp.clip(linear_rgb, 0.0, 1.0)
    srgb = jnp.where(c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)
    return (srgb * 255.0 + 0.5).astype(jnp.uint8)


def render_frame(
    scene: RenderScene,
    camera_view_projection,
    camera_position,
    *,
    meta: SceneMeta,
    config: RenderConfig,
) -> jnp.ndarray:
    """Render one frame; returns (H, W, 4) uint8 (sRGB, alpha=255)."""
    height, width = config.height, config.width
    ph, pw = config.padded_height, config.padded_width

    # 1. transform propagation
    node_global = propagate_transforms(
        scene.node_local, scene.node_parent, meta.level_slices
    )

    # 2. lights
    lights = gather_world_lights(
        node_global, scene.light_node, scene.light_type, scene.light_color
    )

    # 3. vertex stage
    inst_matrix = node_global[scene.inst_node]  # (I,4,4)
    vert_matrix = inst_matrix[scene.vertex_instance]  # (V,4,4)
    world_pos, world_normal, world_tangent = vertex_world_transform(
        scene.positions, scene.normals, scene.tangents, vert_matrix
    )
    clip = clip_transform(world_pos, camera_view_projection)
    setup = triangle_setup(clip, scene.indices, pw, ph)

    # 4. frustum culling (per instance = per primitive-draw)
    planes = frustum_planes(camera_view_projection)
    world_aabbs = transform_aabbs(scene.inst_aabb, inst_matrix)
    visible = aabbs_intersect_frustum(world_aabbs, planes)
    setup = dict(setup)
    setup["valid"] = setup["valid"] & visible[scene.tri_instance]

    # 5. rasterize (visibility buffer per MSAA sample)
    tri_id, _depth = rasterize_dense(
        setup, ph, pw, msaa_samples=config.msaa_samples, chunk=config.raster_chunk
    )

    # 6. deferred shade per sample
    offsets = np.asarray(SAMPLE_OFFSETS[config.msaa_samples], np.float32)
    px = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 0)
    sx = px[None] + offsets[:, 0][:, None, None]
    sy = py[None] + offsets[:, 1][:, None, None]
    background = jnp.asarray(config.clear_color, jnp.float32)
    rgba = shade_deferred(
        tri_id,
        sx,
        sy,
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
        scene.mat_textures,
        scene.texture_pool,
        camera_position,
        lights,
        background,
    )  # (S, PH, PW, 4)

    # 7. resolve (average in linear space) + crop + sRGB encode
    resolved = jnp.mean(rgba, axis=0)[:height, :width]
    rgb_u8 = linear_to_srgb_u8(resolved[..., :3])
    alpha_u8 = jnp.full((height, width, 1), 255, jnp.uint8)
    return jnp.concatenate([rgb_u8, alpha_u8], axis=-1)


def make_frame_fn(meta: SceneMeta, config: RenderConfig):
    """Build the jitted frame function for a given static scene shape."""

    def frame(scene, view_projection, camera_position):
        return render_frame(
            scene, view_projection, camera_position, meta=meta, config=config
        )

    return jax.jit(frame)

"""Deferred PBR fragment shading.

Exact vectorized port of the reference fragment shader's math
(src/game/shaders/fragment.glsl): per-fragment TBN reconstruction
(fragment.glsl:59-66), normal mapping with normal_scale
(fragment.glsl:68-73), metallic-roughness from the b/g channels ×  factors
(fragment.glsl:55-57), punctual lights with the w-flag direction/position
encoding and 1/d² point attenuation with 0.1 minimum radius
(fragment.glsl:75-88), Fresnel-Schlick with f0 = mix(0.04, base, metallic)
(fragment.glsl:90-93), Smith visibility with eps=1e-7 (fragment.glsl:95-103),
GGX distribution (fragment.glsl:105-109), and the diffuse/specular
combination + Σ radiance·brdf·cosθ accumulation (fragment.glsl:111-147).

Operates as a *deferred* pass over the visibility buffer: instead of shading
during rasterization, each covered sample gathers its triangle's vertex data,
reconstructs perspective-correct barycentrics from the homogeneous edge
functions, interpolates attributes, samples materials, and evaluates the
BRDF — dense, regular, VPU/HBM-friendly work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vktf_tpu.ops.texture import TexturePool, sample_texture

PI = 3.1415927
EPSILON = 1.0e-7
POINT_LIGHT_RADIUS = 0.1


def _normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def material_brdf(base_color, metallic, roughness, light_direction, normal, view_direction):
    """GetMaterialBrdf (fragment.glsl:111-128), vectorized over pixels."""
    halfway = _normalize(light_direction + view_direction)
    alpha = roughness * roughness
    alpha2 = alpha * alpha

    h_dot_v = _dot(halfway, view_direction)
    h_dot_l = _dot(halfway, light_direction)
    n_dot_l = _dot(normal, light_direction)
    n_dot_v = _dot(normal, view_direction)
    n_dot_h = _dot(normal, halfway)

    f0 = 0.04 * (1.0 - metallic[..., None]) + base_color[..., :3] * metallic[..., None]
    fresnel = f0 + (1.0 - f0) * jnp.power(1.0 - jnp.abs(h_dot_v)[..., None], 5.0)

    def smith_half(n_dot):
        return jnp.abs(n_dot) + jnp.sqrt(alpha2 + (1.0 - alpha2) * n_dot * n_dot) + EPSILON

    visibility = (
        jnp.where(h_dot_l >= 0.0, 1.0, 0.0)
        / smith_half(n_dot_l)
        * jnp.where(h_dot_v >= 0.0, 1.0, 0.0)
        / smith_half(n_dot_v)
    )

    d_denom = n_dot_h * n_dot_h * (alpha2 - 1.0) + 1.0
    distribution = (
        jnp.where(n_dot_h >= 0.0, 1.0, 0.0) * alpha2 / (PI * d_denom * d_denom + EPSILON)
    )

    diffuse = (1.0 - fresnel) / PI * (base_color[..., :3] * (1.0 - metallic[..., None]))
    specular = fresnel * (visibility * distribution)[..., None]
    return diffuse + specular


def shade_lights(world_position, normal, view_direction, base_color, metallic, roughness, lights):
    """Accumulate Σ radiance·brdf·cosθ over a static light array.

    lights: (L, 8) — [0:4] = position (w=1) or normalized direction (w=0),
    [4:7] = color (fragment.glsl WorldLight + scene.cppm:42-63). The light
    count is static, unrolled at trace time — the analogue of the reference's
    light-count specialization constant (graphics_pipeline.cppm:148-155).
    """
    radiance = jnp.zeros(world_position.shape[:-1] + (3,), jnp.float32)
    num_lights = lights.shape[0]
    for i in range(num_lights):
        light = lights[i]
        has_position = jnp.where(light[3] != 0.0, 1.0, 0.0)
        light_vec = light[:3] - has_position * world_position
        light_distance = jnp.maximum(
            jnp.sqrt(jnp.maximum(_dot(light_vec, light_vec), 1e-20)), POINT_LIGHT_RADIUS
        )
        # mix(1, 1/d^2, has_position)  (fragment.glsl:75-80)
        attenuation = (1.0 - has_position) + has_position / (light_distance * light_distance)
        light_direction = light_vec / light_distance[..., None]
        brdf = material_brdf(
            base_color, metallic, roughness, light_direction, normal, view_direction
        )
        cos_theta = jnp.maximum(_dot(normal, light_direction), 0.0)
        radiance = radiance + (attenuation * cos_theta)[..., None] * light[4:7] * brdf
    return radiance


def shade_deferred(
    tri_id,
    sx,
    sy,
    setup,
    indices,
    world_pos,
    world_normal,
    world_tangent,
    uvs,
    tri_material,
    mat_base_color,
    mat_metallic_roughness,
    mat_normal_scale,
    mat_textures,
    texture_pool: TexturePool,
    camera_position,
    lights,
    background_rgba,
):
    """Shade a visibility buffer; returns linear-premixed RGBA (..., 4).

    tri_id: (...,) int32 (-1 = background); sx/sy: (...,) sample coords.
    Alpha compositing follows the reference blend state (srcAlpha,
    1-srcAlpha; graphics_pipeline.cppm:226-234) against the already-cleared
    background.
    """
    covered = tri_id >= 0
    t = jnp.maximum(tri_id, 0)

    # Perspective-correct barycentrics from homogeneous edge functions:
    # e_i = edge_i . (sx, sy, 1);  lambda_i = e_i / sum(e).
    edge = setup["edge"][t]  # (...,3,3)
    e = edge[..., 0] * sx[..., None] + edge[..., 1] * sy[..., None] + edge[..., 2]
    esum = jnp.sum(e, axis=-1, keepdims=True)
    esum = jnp.where(jnp.abs(esum) < 1e-30, 1e-30, esum)
    lam = e / esum  # (...,3)

    # Analytic screen-space derivative of lambda for texture LOD:
    # d(lambda_i)/dx = (a_i - lambda_i * sum(a)) / sum(e)
    asum = jnp.sum(edge[..., 0], axis=-1, keepdims=True)
    bsum = jnp.sum(edge[..., 1], axis=-1, keepdims=True)
    dlam_dx = (edge[..., 0] - lam * asum) / esum
    dlam_dy = (edge[..., 1] - lam * bsum) / esum

    idx = indices[t]  # (...,3)

    def interp(attr):
        vals = attr[idx]  # (...,3,C)
        return jnp.einsum("...i,...ic->...c", lam, vals)

    frag_world_pos = interp(world_pos)
    frag_normal_raw = interp(world_normal)
    frag_tangent = interp(world_tangent)
    frag_uv = interp(uvs)
    uv_verts = uvs[idx]
    duvdx = jnp.einsum("...i,...ic->...c", dlam_dx, uv_verts)
    duvdy = jnp.einsum("...i,...ic->...c", dlam_dy, uv_verts)

    material = tri_material[t]
    base_factor = mat_base_color[material]  # (...,4)
    mr_factor = mat_metallic_roughness[material]  # (...,2)
    normal_scale = mat_normal_scale[material]  # (...,)
    tex_ids = mat_textures[material]  # (...,3)

    base_sample = sample_texture(texture_pool, tex_ids[..., 0], frag_uv, duvdx, duvdy)
    mr_sample = sample_texture(texture_pool, tex_ids[..., 1], frag_uv, duvdx, duvdy)
    normal_sample = sample_texture(texture_pool, tex_ids[..., 2], frag_uv, duvdx, duvdy)

    base_color = base_factor * base_sample  # (fragment.glsl:50-52)
    # metallic = factor.x * texel.b, roughness = factor.y * texel.g
    metallic = mr_factor[..., 0] * mr_sample[..., 2]
    roughness = mr_factor[..., 1] * mr_sample[..., 1]

    # TBN rebuilt per fragment for orthonormality (fragment.glsl:59-66)
    n = _normalize(frag_normal_raw)
    tangent = _normalize(frag_tangent[..., :3])
    bitangent = _normalize(jnp.cross(n, tangent)) * frag_tangent[..., 3:4]
    sampled_n = 2.0 * normal_sample[..., :3] - 1.0
    sampled_n = sampled_n * jnp.stack(
        [normal_scale, normal_scale, jnp.ones_like(normal_scale)], axis=-1
    )
    normal = _normalize(
        tangent * sampled_n[..., 0:1]
        + bitangent * sampled_n[..., 1:2]
        + n * sampled_n[..., 2:3]
    )

    view_direction = _normalize(camera_position - frag_world_pos)

    radiance = shade_lights(
        frag_world_pos, normal, view_direction, base_color, metallic, roughness, lights
    )
    alpha = base_color[..., 3]

    # blend srcAlpha / (1 - srcAlpha) over the background
    rgb = radiance * alpha[..., None] + background_rgba[:3] * (1.0 - alpha[..., None])
    out = jnp.concatenate([rgb, jnp.ones_like(alpha[..., None])], axis=-1)
    return jnp.where(covered[..., None], out, background_rgba)

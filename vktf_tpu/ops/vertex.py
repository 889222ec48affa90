"""Vertex-stage ops: node transform propagation, world/clip transforms, and
homogeneous triangle setup.

Replaces the reference's per-frame CPU scene-graph recursion
(Model::Update, src/engine/model.cppm:163-194) and the GLSL vertex shader
(src/game/shaders/vertex.glsl) with dense batched einsums over SoA arrays.

Triangle setup implements 2D-homogeneous rasterization (Olano-Greer): edge
functions are built directly from clip-space (x', y', w) without near-plane
geometry clipping — pixels where interpolated w <= 0 or depth is outside
[0, 1] are rejected per-pixel instead. This keeps the geometry pipeline fully
dense and branch-free, which is what the TPU VPU wants.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def propagate_transforms(node_local, node_parent, level_slices: Sequence[Tuple[int, int]]):
    """Compose local transforms into global transforms level by level.

    node_local: (N,4,4) local matrices, nodes sorted topologically by depth so
    each hierarchy level is a contiguous slice; node_parent: (N,) parent index
    (into the same sorted order; roots point at themselves with identity
    composition handled by level 0). level_slices is static: one (start, end)
    per level, roots first.

    This is the jitted analogue of the reference's recursive
    global = parent_global @ local traversal (model.cppm:163-194), flattened
    into ~depth batched (n_l,4,4) matmuls.
    """
    node_global = node_local
    for start, end in level_slices[1:]:  # level 0 = roots: global == local
        parents = node_parent[start:end]
        composed = jnp.einsum(
            "nij,njk->nik", node_global[parents], node_local[start:end]
        )
        node_global = jnp.concatenate(
            [node_global[:start], composed, node_global[end:]], axis=0
        )
    return node_global


def vertex_world_transform(positions, normals, tangents, vertex_matrix):
    """Transform vertices to world space with per-vertex model matrices.

    vertex_matrix: (V,4,4) — the node global transform gathered per vertex.
    Normal/tangent use the rotation block directly, matching the reference
    vertex shader's mat3(model) (vertex.glsl:26-31, orthogonal assumption).
    """
    rot = vertex_matrix[:, :3, :3]
    world_pos = (
        jnp.einsum("vij,vj->vi", rot, positions) + vertex_matrix[:, :3, 3]
    )
    world_normal = jnp.einsum("vij,vj->vi", rot, normals)
    world_tangent_xyz = jnp.einsum("vij,vj->vi", rot, tangents[:, :3])
    world_tangent = jnp.concatenate([world_tangent_xyz, tangents[:, 3:4]], axis=-1)
    return world_pos, world_normal, world_tangent


def clip_transform(world_pos, view_projection):
    """world -> clip: (V,4) = VP @ (world, 1) (vertex.glsl:34)."""
    return (
        jnp.einsum("ij,vj->vi", view_projection[:, :3], world_pos)
        + view_projection[:, 3][None, :]
    )


def triangle_setup(clip, indices, width: int, height: int):
    """Per-triangle homogeneous raster setup, ANCHORED at the bbox corner.

    clip: (V,4) clip coords; indices: (T,3) int32.

    Every per-triangle linear function f(s) = a*sx + b*sy + c is stored as
    (a, b, f(anchor)) with anchor = the triangle's clipped bbox corner, and
    MUST be evaluated as f(s) = a*(sx - ax) + b*(sy - ay) + f_anchor.
    Raw cofactor constants reach ~1e8 at 1080p while the evaluated values
    are O(1): absolute-coordinate evaluation loses ~8 digits to f32
    cancellation, which produced per-pixel coverage/depth/attribute noise
    ("torn-paper" speckles) on small or distant triangles. The anchored
    constants are computed cancellation-free through vertex 0, where each
    function's value is known in closed form (e_i(s_0) = det/w_0 * [i==0],
    depth(s_0) = z_ndc_0, w_recip(s_0) = det/w_0), plus a gradient step of
    at most the bbox extent.

    Returns a dict of per-triangle arrays:
      edge:   (T,3,3); edge[t,i] = (a, b, e_i(anchor)).
      zw:     (T,2,3); zw[t,0] = depth plane (a, b, depth(anchor)) — FINAL
              values (inv_det folded in); zw[t,1] = w_recip plane
              (a, b, w_recip(anchor)), positive inside w > 0.
      anchor: (T,2) f32 anchor (ax, ay) = bbox corner.
      inv_det:(T,) reciprocal of the homogeneous determinant.
      valid:  (T,) front-facing & non-degenerate mask (back-face culling —
              the analogue of cullMode=back/CCW, graphics_pipeline.cppm:212-216).
      bbox:   (T,4) conservative pixel bbox (x0, y0, x1, y1) inclusive-exclusive,
              full-screen for triangles touching w<=0.
    """
    tri = clip[indices]  # (T,3,4)
    x, y, z, w = tri[..., 0], tri[..., 1], tri[..., 2], tri[..., 3]
    # Homogeneous pixel-space coords: x'/w = (x/w+1)/2*W  =>  x' linear in clip.
    xs = (x + w) * (0.5 * width)
    ys = (y + w) * (0.5 * height)
    rows = jnp.stack([xs, ys, w], axis=-1)  # (T,3,3): rows r_i per vertex

    r0, r1, r2 = rows[:, 0], rows[:, 1], rows[:, 2]
    # Sign convention: with the Vulkan y-flip projection and y-down pixel
    # coords, CCW-wound front faces produce a negative homogeneous
    # determinant; negate cofactors+det so front faces have det > 0 and
    # interior pixels satisfy e_i >= 0.
    cof0 = jnp.cross(r2, r1)  # e_0 coefficients (opposite vertex 0)
    cof1 = jnp.cross(r0, r2)
    cof2 = jnp.cross(r1, r0)
    det = jnp.einsum("ti,ti->t", r0, cof0)

    # Front faces have det > 0 in this convention (validated by golden tests
    # against CCW winding + the Vulkan y-flip projection). Triangles with all
    # vertices behind the eye plane (w <= 0) can never pass the per-pixel
    # w > 0 test, so they are rejected here — crucial for the streaming
    # rasterizer, where their conservative full-screen bboxes would otherwise
    # poison every chunk they sit in (measured 2x frame time at Sponza scale
    # with a camera inside the scene).
    valid = (det > 1e-12) & ~jnp.all(w <= 1e-12, axis=-1)
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)

    # Conservative screen bbox (pixel units). Triangles with any w <= 0
    # project unboundedly: give them the full screen.
    safe_w = jnp.maximum(w, 1e-12)
    px = xs / safe_w
    py = ys / safe_w
    any_behind = jnp.any(w <= 1e-12, axis=-1)
    x0 = jnp.where(any_behind, 0.0, jnp.floor(px.min(axis=-1)))
    y0 = jnp.where(any_behind, 0.0, jnp.floor(py.min(axis=-1)))
    x1 = jnp.where(any_behind, float(width), jnp.ceil(px.max(axis=-1)) + 1.0)
    y1 = jnp.where(any_behind, float(height), jnp.ceil(py.max(axis=-1)) + 1.0)
    bbox = jnp.stack(
        [
            jnp.clip(x0, 0, width),
            jnp.clip(y0, 0, height),
            jnp.clip(x1, 0, width),
            jnp.clip(y1, 0, height),
        ],
        axis=-1,
    ).astype(jnp.int32)
    # Degenerate/back-facing triangles get empty bboxes so binning drops them.
    bbox = jnp.where(valid[:, None], bbox, jnp.zeros_like(bbox))

    # ---- anchored plane constants ------------------------------------------
    anchor = bbox[:, :2].astype(jnp.float32)  # (T,2): (ax, ay)
    # vertex-0 screen position + the function values there (w_0 > 0 for all
    # valid triangles that aren't near-plane crossers)
    sx0 = px[:, 0]
    sy0 = py[:, 0]
    det_w0 = det / safe_w[:, 0]  # e_0(s_0) = w_recip(s_0)
    dx0 = anchor[:, 0] - sx0  # <= bbox extent for non-crossing triangles
    dy0 = anchor[:, 1] - sy0

    def anchored(a, b, c_raw, value_at_v0):
        """(a, b, f(anchor)): via vertex 0 normally; via the raw constant
        for near-plane crossers (their anchor is (0,0), where c_raw is
        exact by definition, so no precision is lost there)."""
        f_anchor = jnp.where(
            any_behind, c_raw, value_at_v0 + a * dx0 + b * dy0
        )
        return jnp.stack([a, b, f_anchor], axis=-1)

    zero = jnp.zeros_like(det)
    edge = jnp.stack(
        [
            anchored(cof0[:, 0], cof0[:, 1], cof0[:, 2], det_w0),
            anchored(cof1[:, 0], cof1[:, 1], cof1[:, 2], zero),
            anchored(cof2[:, 0], cof2[:, 1], cof2[:, 2], zero),
        ],
        axis=1,
    )  # (T,3,3)

    # depth plane (inv_det folded): depth(s_0) = z_ndc_0 exactly
    z_ndc0 = z[:, 0] / safe_w[:, 0]
    za = (cof0[:, 0] * z[:, 0] + cof1[:, 0] * z[:, 1] + cof2[:, 0] * z[:, 2]) * inv_det
    zb = (cof0[:, 1] * z[:, 0] + cof1[:, 1] * z[:, 1] + cof2[:, 1] * z[:, 2]) * inv_det
    zc = (cof0[:, 2] * z[:, 0] + cof1[:, 2] * z[:, 1] + cof2[:, 2] * z[:, 2]) * inv_det
    zplane = anchored(za, zb, zc, z_ndc0)
    # w_recip plane: w_recip(s_0) = det/w_0
    wa = cof0[:, 0] + cof1[:, 0] + cof2[:, 0]
    wb = cof0[:, 1] + cof1[:, 1] + cof2[:, 1]
    wc = cof0[:, 2] + cof1[:, 2] + cof2[:, 2]
    wplane = anchored(wa, wb, wc, det_w0)
    zw = jnp.stack([zplane, wplane], axis=1)

    return {
        "edge": edge,
        "zw": zw,
        "anchor": anchor,
        "inv_det": inv_det,
        "valid": valid,
        "bbox": bbox,
    }

"""Single-kernel deferred shade: XLA row gathers -> ONE Pallas kernel.

Why this shape: the XLA form of the deferred shade (shade_table.
shade_table_layer) is memory-bound, not compute-bound — at 1080p Sponza the
fragment math is a few ms of VPU work, but every fusion boundary between
the row gathers and the final RGB rematerializes (N, 128)-row or (N,)
intermediates in HBM (the window fold alone measured ~14 ms, the second
mip's filter pipeline ~16 ms of a ~74 ms stage; tools/microbench8/9).

Round 1 already tried "Pallas shade kernels" and measured them 10 ms
SLOWER — but that attempt SPLIT the stage into several kernels with XLA
gathers between them, serializing gather latency against VPU math and
rematerializing every phase boundary. This module keeps exactly three XLA
ops in the chain per chunk — the shade-table row gather and the two
texture-pool block-row gathers (XLA's native vectorized gather is the only
efficient gather on TPU; a Pallas per-row DMA loop would need millions of
descriptors) — and runs EVERYTHING else in one Pallas kernel per block:
f32 column reconstruction, texture addressing, the 2x2-window fold (as
per-tap lane selects, free in VMEM — no (N,128) roll materialization),
bilinear + sRGB filtering, mip lerp, TBN, BRDF, alpha-mode resolution.
All shading math is the SAME single-source accessor-form code as the XLA
path (shade_table.shade_gathered with (1, block) accessors), so results
are bit-identical between impls.

The fragment-stage parity target is the reference fragment shader
(src/game/shaders/fragment.glsl) via shade_table/shade_cf's cited
formulas; this module adds no new math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vktf_tpu.ops.shade_table import (
    ROW,
    gather_rows,
    pool_row_indices,
    pool_window_addr,
    shade_gathered,
)


def _shade_layer_kernel(
    trow_ref, q0_ref, q1_ref, tri_ref, sx_ref, sy_ref, cam_ref, lights_ref,
    out_ref, *, max_anisotropy: float, num_lights: int,
):
    """One block of samples: gathered rows in, composited-ready RGBA out.

    trow: (B, 2*ROW) u16 shade-table rows; q0/q1: (B, 128) u16 pool block
    rows (mip l0/l1); tri/sx/sy: (1, B); cam: (1, 4) f32; lights:
    (num_lights, 8) f32. out: (4, B) f32 = (rgb linear, effective alpha).
    """
    trow = trow_ref[...]
    hi = trow[:, :ROW].astype(jnp.uint32) << 16
    lo = trow[:, ROW:].astype(jnp.uint32)
    colsT = jax.lax.bitcast_convert_type(hi | lo, jnp.float32)  # (B, ROW)
    cols = colsT.T  # (ROW, B) — one in-VMEM transpose per block

    def col(c):
        return cols[c:c + 1, :]  # (1, B)

    sx = sx_ref[...]
    sy = sy_ref[...]
    covered = tri_ref[...] >= 0

    # component-major pool rows; u16 -> i32 zero-extend (taps shift/mask)
    q0t = q0_ref[...].astype(jnp.int32).T  # (128, B)
    q1t = q1_ref[...].astype(jnp.int32).T

    # in-block window addressing (recomputes the row indices the host used
    # for the gathers; only (cx, cy) are consumed here)
    a0, a1 = pool_window_addr(col, sx, sy, max_anisotropy, slot=0)

    def make_quad(qt, cx, cy):
        """Folded-row accessor: the 2x2 window select happens PER TAP as
        static-lane selects (x stride 2 u16 lanes, y stride 8) — in VMEM
        this is four (1, B) reads + three selects, with no materialized
        roll (the XLA path's fold_window exists to avoid rematerializing
        128-lane rows in HBM; in VMEM that cost vanishes)."""
        cxb = cx == 1
        cyb = cy == 1

        def quad(slot, k):
            a = qt[k:k + 1, :]
            b = qt[k + 2:k + 3, :]
            c = qt[k + 8:k + 9, :]
            d = qt[k + 10:k + 11, :]
            return jnp.where(cyb, jnp.where(cxb, d, c),
                             jnp.where(cxb, b, a))

        return quad

    quad0 = make_quad(q0t, a0[3], a0[4])
    quad1 = make_quad(q1t, a1[3], a1[4])

    cam3 = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    # static light unroll from scalar reads (the light-count specialization
    # constant analogue, graphics_pipeline.cppm:148-155)
    lights = [
        tuple(lights_ref[i, j] for j in range(8)) for i in range(num_lights)
    ]

    rgb, alpha = shade_gathered(
        col, sx, sy, quad0, quad1, cam3, lights, max_anisotropy, covered,
    )
    out_ref[0:1, :] = rgb[0]
    out_ref[1:2, :] = rgb[1]
    out_ref[2:3, :] = rgb[2]
    out_ref[3:4, :] = alpha


def shade_addr_chunk(tri_id, sx, sy, table, max_anisotropy: float = 1.0):
    """Phase A of the two-phase deferred shade: table gather + addressing.

    Gathers each sample's shade-table row and computes the two texture-pool
    block-row indices (mip l0/l1). Returns (trow (N, 2*ROW) u16, r0, r1).

    Why a separate phase: both the shade table (~67 MB at Sponza scale) and
    the quad pool (~95 MB) are per-pixel gather operands, but only ONE fits
    in VMEM at a time — XLA stages a gather operand into VMEM when the
    program's scoped budget allows, and VMEM row gathers measured ~6.6x
    faster than HBM row gathers (fusion trace: pool-from-VMEM 1.0 ms vs
    table-from-HBM 6.6 ms per 524k rows). Splitting the shade into two JIT
    programs lets phase A stage the TABLE and phase B stage the POOL; the
    phase boundary (trow) is sequential HBM traffic at full bandwidth,
    which is cheap next to 2M random row reads.
    """
    t = jnp.maximum(tri_id, 0)
    trow = gather_rows(table, t)  # (N, 2*ROW) u16

    def colx(c):
        # narrow per-column f32 reconstruction for the addressing math that
        # must run host-of-kernel to issue the pool gathers (fuses into the
        # consumer)
        chi = trow[:, c].astype(jnp.uint32) << 16
        clo = trow[:, ROW + c].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(chi | clo, jnp.float32)

    r0, r1 = pool_row_indices(colx, sx, sy, max_anisotropy, slot=0)
    return trow, r0, r1


def shade_final_chunk(
    trow,
    r0,
    r1,
    tri_id,
    sx,
    sy,
    quad_pool,
    camera_position,
    lights,
    max_anisotropy: float = 1.0,
    interpret: bool = False,
    block: int = 1024,
):
    """Phase B of the two-phase deferred shade: pool gathers + the kernel.

    Same math as shade_table_layer_kernel (bit-identical); consumes phase
    A's gathered table rows + pool row indices so this program's only
    gather operand is the quad pool (staged into VMEM by XLA).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = tri_id.shape[0]
    covered = tri_id >= 0
    q0 = gather_rows(quad_pool, r0)  # (N, 128) u16
    q1 = gather_rows(quad_pool, r1)

    n_pad = -(-n // block) * block
    pad = n_pad - n

    def pad0(x):
        if pad:
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    lights = jnp.asarray(lights, jnp.float32).reshape(-1, 8)
    num_lights = lights.shape[0]
    cam = jnp.zeros((1, 4), jnp.float32).at[0, :3].set(camera_position)

    grid = (n_pad // block,)
    kernel = functools.partial(
        _shade_layer_kernel,
        max_anisotropy=max_anisotropy,
        num_lights=num_lights,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 2 * ROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_lights, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
        interpret=interpret,
    )(
        pad0(trow), pad0(q0), pad0(q1),
        pad0(tri_id)[None], pad0(sx)[None], pad0(sy)[None],
        cam, lights,
    )
    rgb = out[:3, :n]
    alpha = out[3, :n]
    return rgb, alpha, covered


def shade_table_layer_kernel(
    tri_id,
    sx,
    sy,
    table,
    quad_pool,
    camera_position,
    lights,
    max_anisotropy: float = 1.0,
    per_slot_samplers: bool = False,
    interpret: bool = False,
    block: int = 1024,
):
    """shade_table.shade_table_layer with the post-gather work in one Pallas
    kernel; same signature + returns, bit-identical math. Single-program
    form of (shade_addr_chunk; shade_final_chunk) — the fused render_frame
    path and small-scene chunked path use this; the split-stage production
    frame runs the two phases as separate programs for VMEM gather staging
    (see shade_addr_chunk docstring).

    per_slot_samplers is not kernelized (3x the gather inputs for a rare
    scene property) — callers route mixed-sampler scenes to the XLA impl.
    """
    if per_slot_samplers:
        raise ValueError("mixed-sampler scenes use the XLA shade impl")
    trow, r0, r1 = shade_addr_chunk(tri_id, sx, sy, table, max_anisotropy)
    return shade_final_chunk(
        trow, r0, r1, tri_id, sx, sy, quad_pool, camera_position, lights,
        max_anisotropy=max_anisotropy, interpret=interpret, block=block,
    )

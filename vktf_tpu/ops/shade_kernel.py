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
    ATTR_PAD,
    ATTR_ROWS,
    A_CX0,
    A_CY0,
    A_CX1,
    A_CY1,
    ROW,
    compute_fragment_attrs,
    fused_window_addr,
    gather_rows,
    pool_row_indices,
    pool_window_addr,
    shade_from_attrs,
    shade_gathered,
)
from vktf_tpu.ops.texture_pack import SLOT_B_U16


def _shade_block_body(
    cols_ref, q0_ref, q1_ref, tri_ref, sx_ref, sy_ref, cam_ref, lights_ref,
    *, max_anisotropy: float, num_lights: int, pool_rowmajor: bool = False,
    fused_pool: bool = False, aniso_taps: int = 1,
):
    """One block of samples: gathered rows in, (rgb 3-tuple, alpha) out.

    All inputs arrive PRE-TRANSPOSED to component-major (the host pays two
    sequential-bandwidth transposes; see shade_final_chunk), so every
    accessor yields a dense (8, 128) tile — full (8, 128)-vreg VPU
    utilization. The first version of this kernel worked on (1, B) row
    slices of in-kernel transposes, which occupy one sublane of each vreg:
    1/8 of the VPU for the entire fragment-math body.

    cols: (2*ROW, 8, 128) u16 table columns as hi/lo halves (combined to
    f32 here — 3 VPU ops on a dense tile); q0/q1: (128, 8, 128) u16 pool
    block rows (mip l0/l1), lane-major; tri/sx/sy: (8, 128); cam: (1, 4)
    f32 (row 0 = camera xyz); lights: (num_lights, 8) f32.

    fused_pool: the ONE-gather trilinear path (repeat/clamp scenes with
    identical per-slot samplers): q1_ref is None and the mip-l1 taps come
    from the SAME gathered row's slot B (texture_pack fused-mip layout) —
    or from slot A again where l1 == l0 (chain top), reproducing the
    classic path's degenerate lerp bit-for-bit.
    """

    def col(c):
        hi = cols_ref[c].astype(jnp.uint32) << 16
        lo = cols_ref[ROW + c].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)  # (8, 128)

    sx = sx_ref[...]
    sy = sy_ref[...]
    covered = tri_ref[...] >= 0

    if pool_rowmajor:
        # The gathered pool rows arrive ROW-MAJOR ((block, qw) u16, the
        # gather's natural layout) and are transposed HERE, in VMEM —
        # cheaper than XLA's phase-boundary HBM relayout copy (measured
        # 1.76 ms/tensor at 2.09M rows, tools/relayout_ab.py; in-kernel
        # u16 transpose wins the end-to-end A/B by ~0.8 ms/tensor,
        # tools/inkernel_transpose_ab.py — u32-pair transposes are 4x
        # worse, form c there).
        def relayout(q):
            qw = q.shape[1]
            return q[...].T.reshape(qw, *sx.shape)

        if isinstance(q0_ref, (tuple, list)):
            q0_ref = tuple(relayout(q) for q in q0_ref)
        else:
            q0_ref = relayout(q0_ref)
        if q1_ref is not None:
            q1_ref = relayout(q1_ref)

    def make_quad(q_ref, cx, cy, base: int = 0):
        """Folded-row accessor: the 2x2 window select happens PER TAP as
        static-lane selects (x stride 2 u16 lanes, y stride 6 in the 3x3
        slot layout) — in VMEM this is four (8, 128) tile reads + three
        selects, with no materialized roll. base selects the level slot
        (0 = slot A, SLOT_B_U16 = slot B of the fused-mip row). u16 -> i32
        zero-extend per tap (only the touched lanes convert, not all 128).

        A bf16-stored pool is also accepted (bitcast back to u16 here in
        VMEM, inside the kernel where XLA cannot commute it onto the gather
        operand — distinct from the tools/shade_bf16_ab dead end). MEASURED
        AND REJECTED (tools/pool_bf16_store_ab): a wash on time (~16.0 vs
        ~16.9 ms phase B, within tunnel noise) and NOT bit-identical —
        arbitrary u16 halves viewed as bf16 include NaN payloads that XLA
        may canonicalize in value-level copies outside the kernel. The
        production pool stays u16; this branch exists so the negative-result
        A/B stays runnable."""
        cxb = cx == 1
        cyb = cy == 1
        bf16 = q_ref.dtype == jnp.bfloat16

        def lane(k):
            t = q_ref[k]
            if bf16:
                t = jax.lax.bitcast_convert_type(t, jnp.uint16)
            return t.astype(jnp.int32)

        def quad(slot, k):
            a = lane(base + k)
            b = lane(base + k + 2)
            c = lane(base + k + 6)
            d = lane(base + k + 8)
            return jnp.where(cyb, jnp.where(cxb, d, c),
                             jnp.where(cxb, b, a))

        return quad

    cam3_early = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    if fused_pool and aniso_taps > 1:
        # TRUE multi-tap anisotropy, kernel-native (fused-pool scenes):
        # each tap has its own gathered fused row (q0_ref is a tuple) and
        # its own tap-shifted addressing; texture samples averaged before
        # the BRDF — same expression order as the XLA multi-tap path
        # (shade_table.shade_table_layer), so interpret-mode bit-equal.
        from vktf_tpu.ops.shade_table import (
            _fragment_from_slot_tex,
            _slot_tex_from_quads,
        )

        shifts = [(i + 0.5) / aniso_taps - 0.5 for i in range(aniso_taps)]
        acc = None
        for t, f in enumerate(shifts):
            a0, (_fx1, _fy1, dx1, dy1, l1_eq) = fused_window_addr(
                col, sx, sy, max_anisotropy, tap_shift=f
            )
            quad0_t = make_quad(q0_ref[t], a0[3], a0[4])
            quad_b_t = make_quad(q0_ref[t], dx1, dy1, base=SLOT_B_U16)

            def quad1_t(slot, k, _q0=quad0_t, _qb=quad_b_t, _eq=l1_eq):
                return jnp.where(_eq, _q0(slot, k), _qb(slot, k))

            st = _slot_tex_from_quads(col, sx, sy, quad0_t, quad1_t,
                                      max_anisotropy, tap_shift=f)
            acc = st if acc is None else [
                tuple(a + b for a, b in zip(sa, sb))
                for sa, sb in zip(acc, st)
            ]
        inv = 1.0 / aniso_taps
        slot_tex = [tuple(c * inv for c in st) for st in acc]
        lights = [
            tuple(lights_ref[i, j] for j in range(8))
            for i in range(num_lights)
        ]
        return _fragment_from_slot_tex(col, sx, sy, slot_tex, cam3_early,
                                       lights, covered)
    if fused_pool:
        a0, (_fx1, _fy1, dx1, dy1, l1_eq) = fused_window_addr(
            col, sx, sy, max_anisotropy
        )
        quad0 = make_quad(q0_ref, a0[3], a0[4])
        quad_b = make_quad(q0_ref, dx1, dy1, base=SLOT_B_U16)

        def quad1(slot, k):
            # l1 == l0 (lod at the chain top): slot A with the l0 fold case
            # IS the l1 footprint (fx1 == fx0 there), so the mip lerp
            # degenerates exactly as in the classic two-gather path
            return jnp.where(l1_eq, quad0(slot, k), quad_b(slot, k))
    else:
        # in-block window addressing (recomputes the row indices the host
        # used for the gathers; only (cx, cy) are consumed here)
        a0, a1 = pool_window_addr(col, sx, sy, max_anisotropy, slot=0)
        quad0 = make_quad(q0_ref, a0[3], a0[4])
        quad1 = make_quad(q1_ref, a1[3], a1[4])

    cam3 = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    # static light unroll from scalar reads (the light-count specialization
    # constant analogue, graphics_pipeline.cppm:148-155)
    lights = [
        tuple(lights_ref[i, j] for j in range(8)) for i in range(num_lights)
    ]

    return shade_gathered(
        col, sx, sy, quad0, quad1, cam3, lights, max_anisotropy, covered,
    )


def _shade_layer_kernel(
    cols_ref, *refs, max_anisotropy: float, num_lights: int,
    pool_rowmajor: bool = False, fused_pool: bool = False,
    aniso_taps: int = 1,
):
    """Layer form: out (4, 8, 128) f32 = (rgb linear, effective alpha) for
    the host-side K-layer composite (pallas_shade_final_tiled layers > 1).
    fused_pool drops the q1 ref (one pool gather serves both mips);
    aniso_taps > 1 (fused only) carries one q ref PER TAP."""
    if fused_pool:
        q_refs = refs[:aniso_taps]
        tri_ref, sx_ref, sy_ref, cam_ref, lights_ref, out_ref = \
            refs[aniso_taps:]
        q0_ref = q_refs[0] if aniso_taps == 1 else tuple(q_refs)
        q1_ref = None
    else:
        (q0_ref, q1_ref, tri_ref, sx_ref, sy_ref, cam_ref, lights_ref,
         out_ref) = refs
    rgb, alpha = _shade_block_body(
        cols_ref, q0_ref, q1_ref, tri_ref, sx_ref, sy_ref, cam_ref,
        lights_ref, max_anisotropy=max_anisotropy, num_lights=num_lights,
        pool_rowmajor=pool_rowmajor, fused_pool=fused_pool,
        aniso_taps=aniso_taps,
    )
    out_ref[0] = rgb[0]
    out_ref[1] = rgb[1]
    out_ref[2] = rgb[2]
    out_ref[3] = alpha


def _resolve_pack(rgb, alpha, frac, cam_ref, tri_i32):
    """Composite over the background, MSAA-coverage resolve, sRGB encode,
    and u8 quantization on in-VMEM tiles; returns packed i32 r|g<<8|b<<16.
    Formula order matches pallas_shade_final_tiled's XLA tail exactly
    (composite over background, then frac resolve, then
    pipeline.linear_to_srgb_u8's encode). cam row 1 carries the background
    RGB."""
    packed = jnp.zeros_like(tri_i32)
    for c in range(3):
        bg = cam_ref[1, c]
        comp = rgb[c] * alpha + bg * (1.0 - alpha)
        resolved = comp * frac + bg * (1.0 - frac)
        # linear_to_srgb_u8, minus the u8 cast (packed into i32 bytes)
        v = jnp.clip(resolved, 0.0, 1.0)
        srgb = jnp.where(v <= 0.0031308, v * 12.92,
                         1.055 * jnp.power(v, 1.0 / 2.4) - 0.055)
        u8 = (srgb * 255.0 + 0.5).astype(jnp.int32)
        packed = packed | (u8 << (8 * c))
    return packed


def _shade_resolve_kernel(
    cols_ref, *refs, max_anisotropy: float, num_lights: int,
    pool_rowmajor: bool = False, fused_pool: bool = False,
    aniso_taps: int = 1,
):
    """Single-layer form: the _resolve_pack tail runs INSIDE the kernel;
    out is (1, 8, 128) i32 packed bytes.

    Exists because the layers==1 tail (composite + frac resolve + sRGB +
    quantize) as XLA ops costs a measured ~1.5 ms of pure HBM passes over
    (4, n_px) f32 intermediates (tools/shade_phase_probe) — here the same
    formulas run on the (8, 128) VMEM tiles the fragment math already
    holds, and the phase-B output shrinks 33 MB f32 -> 8 MB i32.
    fused_pool drops the q1 ref (one pool gather serves both mips);
    aniso_taps > 1 (fused only) carries one q ref PER TAP.
    """
    if fused_pool:
        q_refs = refs[:aniso_taps]
        (tri_ref, sx_ref, sy_ref, frac_ref, cam_ref, lights_ref,
         out_ref) = refs[aniso_taps:]
        q0_ref = q_refs[0] if aniso_taps == 1 else tuple(q_refs)
        q1_ref = None
    else:
        (q0_ref, q1_ref, tri_ref, sx_ref, sy_ref, frac_ref, cam_ref,
         lights_ref, out_ref) = refs
    rgb, alpha = _shade_block_body(
        cols_ref, q0_ref, q1_ref, tri_ref, sx_ref, sy_ref, cam_ref,
        lights_ref, max_anisotropy=max_anisotropy, num_lights=num_lights,
        pool_rowmajor=pool_rowmajor, fused_pool=fused_pool,
        aniso_taps=aniso_taps,
    )
    out_ref[0] = _resolve_pack(rgb, alpha, frac_ref[...], cam_ref,
                               tri_ref[...])


def _attrs_block_body(
    attrs_ref, q0_ref, q1_ref, tri_ref, cam_ref, lights_ref,
    *, num_lights: int, pool_rowmajor: bool = False,
):
    """Attrs-boundary block body: per-pixel interpolated attr rows arrive
    as (ATTR_PAD, 8, 128) f32 (shade_table.compute_fragment_attrs ran in
    phase A), so this kernel does NO table-column reconstruction, plane
    evaluation, or pool addressing — just the window fold, filtering, and
    the BRDF (shade_table.shade_from_attrs). Pool-row handling matches
    _shade_block_body."""
    def arow(i):
        return attrs_ref[i]  # (8, 128) f32

    covered = tri_ref[...] >= 0
    if pool_rowmajor:
        qw = q0_ref.shape[1]
        q0_ref = q0_ref[...].T.reshape(qw, *covered.shape)
        q1_ref = q1_ref[...].T.reshape(qw, *covered.shape)

    def make_quad(q_ref, cxb, cyb):
        def quad(slot, k):
            a = q_ref[k].astype(jnp.int32)
            b = q_ref[k + 2].astype(jnp.int32)
            c = q_ref[k + 6].astype(jnp.int32)
            d = q_ref[k + 8].astype(jnp.int32)
            return jnp.where(cyb, jnp.where(cxb, d, c),
                             jnp.where(cxb, b, a))

        return quad

    quad0 = make_quad(q0_ref, arow(A_CX0) != 0.0, arow(A_CY0) != 0.0)
    quad1 = make_quad(q1_ref, arow(A_CX1) != 0.0, arow(A_CY1) != 0.0)
    cam3 = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    lights = [
        tuple(lights_ref[i, j] for j in range(8)) for i in range(num_lights)
    ]
    return shade_from_attrs(arow, quad0, quad1, cam3, lights, covered)


def _attrs_layer_kernel(
    attrs_ref, q0_ref, q1_ref, tri_ref, cam_ref, lights_ref, out_ref,
    *, num_lights: int, pool_rowmajor: bool = False,
):
    rgb, alpha = _attrs_block_body(
        attrs_ref, q0_ref, q1_ref, tri_ref, cam_ref, lights_ref,
        num_lights=num_lights, pool_rowmajor=pool_rowmajor,
    )
    out_ref[0] = rgb[0]
    out_ref[1] = rgb[1]
    out_ref[2] = rgb[2]
    out_ref[3] = alpha


def _attrs_resolve_kernel(
    attrs_ref, q0_ref, q1_ref, tri_ref, frac_ref, cam_ref, lights_ref,
    out_ref, *, num_lights: int, pool_rowmajor: bool = False,
):
    rgb, alpha = _attrs_block_body(
        attrs_ref, q0_ref, q1_ref, tri_ref, cam_ref, lights_ref,
        num_lights=num_lights, pool_rowmajor=pool_rowmajor,
    )
    out_ref[0] = _resolve_pack(rgb, alpha, frac_ref[...], cam_ref,
                               tri_ref[...])


def pair_gather_rowsT(table, t, cap_frac: int = 8):
    """Pair-coherent shade-table row gather: BIT-IDENTICAL to
    ``gather_rows(table, t).T`` for even-length ``t``, issuing ~56% of the
    gather indices on coherent streams (VERDICT r3 #1).

    MEASURED NEGATIVE — do not enable in production. On the chip at the
    real 2.09M-pixel Sponza stream (tools/pair_gather_probe.py, 3
    interleaved reps): full production gather 6.8 ms; the stride-2 HALF
    gather alone 9.6-11.1 ms (a strided-index gather of half the count is
    SLOWER than the full contiguous-count gather); the structured
    expansion (two (128, M) u16 selects + lane interleave) 27 ms; the
    complete bit-exact candidate 31-36 ms — 4.6x the gather it replaces.
    The lane-dim select/interleave ops move far more than their
    theoretical bytes, and top_k compaction alone costs 17 ms. Kept (flag
    default off, bit-exactness pinned by tests/test_pallas_pipeline.py)
    as the record of the dead end, like gather_rows' bf16_view.

    Adjacent pixels in the block-layout shade order overwhelmingly share
    the winning triangle (tools/pair_coherence_stats.py: odd==left 82-87%,
    odd==right 10-12%, residual 3.4-6.1% at Sponza 1080p), and the
    measured per-index gather issue rate is FLAT vs coherence
    (tools/gather_scale_ab.py) — so the only winning form gathers FEWER
    indices and expands structurally:

      even positions: one stride-2 row gather (N/2 indices)
      odd == left id: reuse the even row (select — no gather)
      odd == right id (a run starting on the odd pixel): the NEXT even
        row (shift + select — no gather)
      residual odd (1-px runs): a capped fix-up gather (cumsum-compacted
        positions, OOB-dropped column scatter); if residuals exceed the
        static cap (C = max(1024, N/2 / cap_frac) — bench-camera worst is
        6.1% of odd vs the 12.5% default cap), a lax.cond falls back to
        the full odd gather, preserving exactness on ANY input at a
        bounded (~baseline + expansion overhead) cost.

    Primitive A/B on the chip: tools/pair_gather_probe.py (bit-equality
    asserted against the production gather on the real winner stream).
    """
    n = t.shape[0]
    assert n % 2 == 0, n
    m = n // 2
    cap = max(1024, m // cap_frac)
    e, o = t[0::2], t[1::2]
    rowsT = gather_rows(table, e).T  # (2*ROW, M) u16
    right = jnp.concatenate([rowsT[:, 1:], rowsT[:, -1:]], axis=1)
    use_l = (o == e)[None, :]
    odd = jnp.where(use_l, rowsT, right)
    id_r = jnp.concatenate([e[1:], e[-1:]])
    resid = (o != e) & (o != id_r)
    n_resid = jnp.sum(resid.astype(jnp.int32))

    def capped(odd):
        cnt = jnp.cumsum(resid.astype(jnp.int32)) - 1
        slot = jnp.where(resid, cnt, cap)  # OOB slots dropped
        pos = jnp.full((cap,), -1, jnp.int32).at[slot].set(
            jnp.arange(m, dtype=jnp.int32), mode="drop")
        fixed = gather_rows(table, o[jnp.maximum(pos, 0)]).T
        tgt = jnp.where(pos >= 0, pos, m)  # pads scatter OOB -> dropped
        return odd.at[:, tgt].set(fixed, mode="drop")

    def fallback(_odd):
        return gather_rows(table, o).T

    odd = jax.lax.cond(n_resid <= cap, capped, fallback, odd)
    return jnp.stack([rowsT, odd], axis=2).reshape(rowsT.shape[0], n)


def shade_addr_chunk(tri_id, sx, sy, table, max_anisotropy: float = 1.0,
                     fused_pool: bool = False, pair_gather: bool = False,
                     aniso_taps: int = 1):
    """Phase A of the two-phase deferred shade: table gather + addressing.

    Gathers each sample's shade-table row and computes the two texture-pool
    block-row indices (mip l0/l1) — or only r0 with r1=None when fused_pool
    (the fused-mip row serves both levels; the l1 addressing is dead code
    XLA eliminates). Returns (colsT (2*ROW, N) u16, r0, r1)
    — the table rows cross the phase boundary TRANSPOSED to component-major
    but still as u16 hi/lo halves; the shade kernel reads dense (8, 128)
    tiles and does the f32 combine on them in VMEM (3 VPU ops per column).

    Why transposed-u16 and not combined-f32: XLA fuses the transpose INTO
    the row gather (microbench15: gather 9.5 ms, gather+transpose 11.1 ms
    at 2M rows), and the transposed (64, N) form is DENSE — N rides the
    128-lane dim. Every row-major alternative materializes lane-padded
    intermediates: (N, 64) u16 pads 2x, a combined (N, 32) f32 pads 4x
    (~1 GB at 2M samples), and the addressing math's per-column reads then
    re-read those padded tiles — measured as phase A costing ~40 ms against
    a ~11 ms gather+transpose floor.

    Why a separate phase: both the shade table (~67 MB at Sponza scale) and
    the quad pool (~95 MB) are per-pixel gather operands, but only ONE fits
    in VMEM at a time — XLA stages a gather operand into VMEM when the
    program's scoped budget allows, and VMEM row gathers measured ~6.6x
    faster than HBM row gathers (fusion trace: pool-from-VMEM 1.0 ms vs
    table-from-HBM 6.6 ms per 524k rows). Splitting the shade into two JIT
    programs lets phase A stage the TABLE and phase B stage the POOL; the
    phase boundary (colsT) is sequential HBM traffic at full bandwidth,
    which is cheap next to 2M random row reads.
    """
    t = jnp.maximum(tri_id, 0)
    if pair_gather and t.shape[0] % 2 == 0:
        trowT = pair_gather_rowsT(table, t)  # bit-identical, fewer indices
    else:
        trow = gather_rows(table, t)  # (N, 2*ROW) u16
        trowT = trow.T  # (2*ROW, N) u16 — dense; fuses into the gather

    def colx(c):
        hi = trowT[c].astype(jnp.uint32) << 16
        lo = trowT[ROW + c].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)  # (N,)

    if fused_pool and aniso_taps > 1:
        # multi-tap anisotropy: one fused pool row per tap (the kernel
        # re-derives each tap's in-block fold cases from the same shifts)
        shifts = [(i + 0.5) / aniso_taps - 0.5 for i in range(aniso_taps)]
        r0s = tuple(
            pool_row_indices(colx, sx, sy, max_anisotropy, slot=0,
                             tap_shift=f)[0]
            for f in shifts
        )
        return trowT, r0s, None
    r0, r1 = pool_row_indices(colx, sx, sy, max_anisotropy, slot=0)
    if fused_pool:
        return trowT, r0, None
    return trowT, r0, r1


def shade_attrs_chunk(tri_id, sx, sy, table, max_anisotropy: float = 1.0):
    """Phase A of the ATTRS-boundary two-phase shade: table gather +
    addressing + full per-pixel interpolation.

    Like shade_addr_chunk (same table row gather, staged in VMEM by this
    program), but instead of shipping the raw transposed table columns
    across the phase boundary it evaluates EVERYTHING phase B needs per
    pixel (shade_table.compute_fragment_attrs): footprint fractions, window
    fold cases, mip lerp, interpolated world pos / normal / tangent, and
    the material factors. The boundary shrinks (2*ROW, N) u16 = 256 B/px
    -> (ATTR_PAD, N) f32 = 128 B/px, and the phase-B kernel loses all
    plane/addressing math. Per-pixel values are computed by the SAME
    helper expressions as the column path, so downstream results are
    bit-identical (pinned by tests).
    """
    t = jnp.maximum(tri_id, 0)
    trow = gather_rows(table, t)  # (N, 2*ROW) u16
    trowT = trow.T  # fuses into the gather (shade_addr_chunk docstring)

    def colx(c):
        hi = trowT[c].astype(jnp.uint32) << 16
        lo = trowT[ROW + c].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)  # (N,)

    rows, r0, r1 = compute_fragment_attrs(colx, sx, sy, max_anisotropy)
    rows += [jnp.zeros_like(rows[0])] * (ATTR_PAD - ATTR_ROWS)
    return jnp.stack(rows, axis=0), r0, r1  # (ATTR_PAD, N) f32


def _shade_final_call(
    lead,
    lead_rows,
    px_extra,
    kernels,
    kernel_kwargs,
    r0,
    r1,
    tri_id,
    quad_pool,
    camera_position,
    lights,
    interpret,
    block,
    frac,
    background,
    pool_rowmajor,
    fused_pool: bool = False,
):
    """Shared phase-B scaffolding for the two boundary forms.

    Everything except the leading component-major tensor (u16 table
    columns vs f32 interpolated attrs), the per-pixel extras (sx/sy for
    the cols form), and the kernel pair is identical between
    shade_final_chunk and shade_final_attrs_chunk: pool row gathers,
    padding/blocking, BlockSpec plumbing, the resolve-vs-layer dispatch,
    and the output slicing. One builder so a spec/padding fix cannot
    silently miss one of the two (code-review r2s4).

    fused_pool (cols form only): ONE pool gather — the fused-mip row at r0
    carries both trilinear levels (r1 is None and no q1 tensor exists).
    Multi-tap anisotropy (fused only): r0 is a TUPLE of per-tap row
    vectors — one pool gather and one kernel q ref per tap.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = tri_id.shape[0]
    covered = tri_id >= 0
    r0s = r0 if isinstance(r0, tuple) else (r0,)
    # (N, W) u16 each; 108 live of W=128 lanes
    q0s = [gather_rows(quad_pool, r) for r in r0s]
    q1 = None if fused_pool else gather_rows(quad_pool, r1)
    qw = quad_pool.shape[1]

    n_pad = -(-n // block) * block
    pad = n_pad - n

    def pad_last(x):
        if pad:
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
        return x

    def pad_first(x):
        if pad:
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    lights = jnp.asarray(lights, jnp.float32).reshape(-1, 8)
    num_lights = lights.shape[0]
    cam = jnp.zeros((2, 4), jnp.float32).at[0, :3].set(camera_position)
    if background is not None:
        cam = cam.at[1, :3].set(jnp.asarray(background, jnp.float32)[:3])

    nb = n_pad // 128
    leadb = pad_last(lead).reshape(lead_rows, nb, 128)
    if pool_rowmajor:
        # keep the gather's natural (N, qw) layout; the kernel transposes
        # per block in VMEM (see _shade_block_body) instead of XLA paying
        # an HBM relayout copy per tensor (tools/relayout_ab.py)
        q0bs = [pad_first(q) for q in q0s]
        q1b = None if fused_pool else pad_first(q1)
    else:
        q0bs = [pad_first(q).T.reshape(qw, nb, 128) for q in q0s]
        q1b = None if fused_pool else pad_first(q1).T.reshape(qw, nb, 128)

    grid = (n_pad // block,)
    bb = block // 128  # (8) pixel rows of 128 lanes per kernel block

    def px_spec():
        return pl.BlockSpec((bb, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    resolve = frac is not None
    kernel = functools.partial(
        kernels[1] if resolve else kernels[0],
        num_lights=num_lights,
        pool_rowmajor=pool_rowmajor,
        **kernel_kwargs,
    )
    if pool_rowmajor:
        pool_spec = pl.BlockSpec((block, qw), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        pool_spec = pl.BlockSpec((qw, bb, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((lead_rows, bb, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [leadb]
    for q0b in q0bs:
        in_specs.append(pool_spec)
        args.append(q0b)
    if not fused_pool:
        in_specs.append(pool_spec)
        args.append(q1b)
    in_specs.append(px_spec())
    args.append(pad_first(tri_id).reshape(nb, 128))
    for x in px_extra:
        in_specs.append(px_spec())
        args.append(pad_first(x).reshape(nb, 128))
    if resolve:
        in_specs.append(px_spec())
        args.append(pad_first(frac).reshape(nb, 128))
    in_specs += [
        pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_lights, 8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [cam, lights]

    out_ch = 1 if resolve else 4
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_ch, bb, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (out_ch, nb, 128), jnp.int32 if resolve else jnp.float32),
        interpret=interpret,
    )(*args)
    if resolve:
        return out.reshape(n_pad)[:n]
    out = out.reshape(4, n_pad)
    rgb = out[:3, :n]
    alpha = out[3, :n]
    return rgb, alpha, covered


def shade_final_attrs_chunk(
    attrs,
    r0,
    r1,
    tri_id,
    quad_pool,
    camera_position,
    lights,
    interpret: bool = False,
    block: int = 1024,
    frac=None,
    background=None,
    pool_rowmajor: bool = False,
):
    """Phase B of the ATTRS-boundary two-phase shade: pool gathers + the
    attrs fragment kernel. Mirrors shade_final_chunk (same output forms,
    same pool staging) minus the table columns and sx/sy — the attrs rows
    carry everything else."""
    return _shade_final_call(
        attrs, ATTR_PAD, (),
        (_attrs_layer_kernel, _attrs_resolve_kernel), {},
        r0, r1, tri_id, quad_pool, camera_position, lights,
        interpret, block, frac, background, pool_rowmajor,
    )


def shade_final_chunk(
    cols,
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
    frac=None,
    background=None,
    pool_rowmajor: bool = False,
    fused_pool: bool = False,
    aniso_taps: int = 1,
):
    """Phase B of the two-phase deferred shade: pool gathers + the kernel.

    Same math as shade_table_layer_kernel (bit-identical); consumes phase
    A's transposed table rows (cols (2*ROW, N) u16) + pool row indices so
    this program's only gather operand is the quad pool (staged into VMEM
    by XLA). The gathered pool rows are transposed host-side to lane-major
    (XLA fuses the transpose into the gather) — so the kernel reads dense
    (8, 128) tiles for every accessor (see _shade_block_body).

    fused_pool: ONE pool gather per pixel — the fused-mip row at r0
    carries both trilinear levels (r1 ignored). Exact for repeat/clamp
    scenes with identical per-slot samplers (texture_pack docstring);
    callers gate on SceneMeta.mirror_wrap / mixed_samplers.

    Two output forms:
      * frac is None (K-layer): returns (rgb (3, n), alpha (n,), covered)
        f32 for the host-side peel composite.
      * frac given (single layer): the composite over `background`, the
        coverage resolve, and the sRGB u8 encode all run IN the kernel
        (_shade_resolve_kernel); returns packed (n,) i32 r|g<<8|b<<16.
    """
    return _shade_final_call(
        cols, 2 * ROW, (sx, sy),
        (_shade_layer_kernel, _shade_resolve_kernel),
        {"max_anisotropy": max_anisotropy, "fused_pool": fused_pool,
         "aniso_taps": aniso_taps},
        r0, r1, tri_id, quad_pool, camera_position, lights,
        interpret, block, frac, background, pool_rowmajor,
        fused_pool=fused_pool,
    )


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
    fused_pool: bool = False,
):
    """shade_table.shade_table_layer with the post-gather work in one Pallas
    kernel; same signature + returns, bit-identical math. Single-program
    form of (shade_addr_chunk; shade_final_chunk) — the fused render_frame
    path and small-scene chunked path use this; the split-stage production
    frame runs the two phases as separate programs for VMEM gather staging
    (see shade_addr_chunk docstring).

    per_slot_samplers is not kernelized (3x the gather inputs for a rare
    scene property) — callers route mixed-sampler scenes to the XLA impl.
    fused_pool: one pool gather serves both mips (shade_final_chunk).
    """
    if per_slot_samplers:
        raise ValueError("mixed-sampler scenes use the XLA shade impl")
    trow, r0, r1 = shade_addr_chunk(tri_id, sx, sy, table, max_anisotropy,
                                    fused_pool=fused_pool)
    return shade_final_chunk(
        trow, r0, r1, tri_id, sx, sy, quad_pool, camera_position, lights,
        max_anisotropy=max_anisotropy, interpret=interpret, block=block,
        fused_pool=fused_pool,
    )

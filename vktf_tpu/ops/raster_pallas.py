"""Pallas TPU visibility rasterizer.

The hot half of the reference's fixed-function raster pipeline
(graphics_pipeline.cppm:205-234: triangle list, back-face cull, depth Less,
MSAA) as one hand-written TPU kernel, replacing the XLA tile-loop path
(ops.raster_tiled) whose per-chunk gathers and loop overheads measured
~1000x off speed-of-light on a v5e.

Design (measured constraints, see git history):
  * XLA gathers cost ~9ns/index — per-sample or per-bin gathers are the
    enemy. This kernel does ZERO gathers: triangles stream through every
    tile in global draw order as contiguous chunks (HBM -> SMEM DMA), with
    a per-chunk screen-bbox prefilter (scalar-prefetched) that skips
    non-overlapping chunks, and a per-triangle bbox skip inside the chunk.
    Meshes are spatially coherent, so chunk bboxes are tight and most
    chunks skip most tiles.
  * Streaming in global order makes the depth rule exactly the single-chip
    semantic: strict less-than keeps the earliest triangle on ties
    (lexicographic (depth, draw-order) — same as ops.raster_tiled).
  * Sample layout is (S*th, tw) f32 per tile — every buffer is an exact
    multiple of the (8,128) f32 tile, no padding waste.

Outputs per framebuffer tile: winning triangle id (int32, -1 background)
and depth (f32, 1.0 clear) per MSAA sample.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vktf_tpu.ops.raster_xla import BACKGROUND, SAMPLE_OFFSETS

# tri_data row layout (component-major, (ROWS, T_pad) f32). All plane rows
# are ANCHORED at the triangle's bbox corner (triangle_setup): constant = the
# plane's value at the corner, evaluated as a*(sx-ax) + b*(sy-ay) + const.
#   0..8  edge planes e_i = (a, b, e_i(anchor)), i = 0,1,2
#   9..11 depth plane (a, b, depth(anchor))  [inv_det folded]
#  12..14 w-recip plane (a, b, w_recip(anchor))  [positive inside w > 0]
#  15     original triangle id (f32-exact for T < 2^24), -1 for invalid
#  16..18 top/left fill thresholds per edge as f32 -1.0 (tl) or 0.0,
#         int-converted in-kernel (scalar f32<->i32 BITCASTS are illegal in
#         Mosaic; converts are fine). Precomputed because deriving the flag
#         in-kernel cost ~6 scalar-unit ops per (edge, triangle, window) —
#         measured HALF the kernel time (the scalar unit, not the VPU, was
#         the bottleneck).
#  19     per-GROUP slim-body flag (1.0 = every group member's per-sample
#         w_recip/depth-range tests provably pass inside the triangle —
#         vertex.py triangle-setup "safe" — so the kernel's slim window
#         body drops them; reduced group-uniform in rasterize_pallas)
#  20..23 zero padding (HBM->SMEM DMA slices need 8-aligned row counts)
TRI_ROWS = 24


def pack_tri_data(setup, perm=None, id_base=0):
    """Pack triangle_setup outputs into the kernel stream layouts.

    perm optionally reorders the stream (screen-space Morton order); row 15
    carries the ORIGINAL draw-order id (offset by id_base for gp-sharded
    triangle blocks) so depth ties stay exact.
    """
    edge, zw, inv_det, valid = (
        # coverage uses the screen-space raster planes when the setup
        # provides them (needle-free for slivers; ops/vertex.py)
        setup.get("edge_raster", setup["edge"]),
        setup["zw"],
        setup["inv_det"],
        setup["valid"],
    )
    num_tris = edge.shape[0]
    tri_ids = jnp.arange(num_tris, dtype=jnp.float32) + jnp.asarray(
        id_base, jnp.float32
    )
    # all plane rows are ANCHORED at the bbox corner (triangle_setup): the
    # kernel evaluates with (s - bbox_corner) deltas, reading the anchor from
    # the bbox stream rows 0/1
    def no_negzero(c):
        # Force exact-zero plane constants to +0.0: the kernel tests the
        # evaluated planes with integer-bitcast compares (raster docstring),
        # which order -0.0 below +0.0. With all constants +0, an exactly-zero
        # plane evaluation is always +0 (IEEE round-to-nearest sums of
        # cancelling terms yield +0), keeping the int compares equivalent to
        # the float fill rule.
        return jnp.where(c == 0.0, jnp.float32(0.0), c)

    rows = [
        no_negzero(edge[:, i, c]) if c == 2 else edge[:, i, c]
        for i in range(3)
        for c in range(3)
    ]
    rows += [no_negzero(zw[:, 0, c]) if c == 2 else zw[:, 0, c] for c in range(3)]
    rows += [no_negzero(zw[:, 1, c]) if c == 2 else zw[:, 1, c] for c in range(3)]
    rows += [jnp.where(valid, tri_ids, -1.0)]
    for i in range(3):  # rows 16..18: edge fill thresholds as -1.0 / 0.0
        a, b = edge[:, i, 0], edge[:, i, 1]
        tl = (a > 0.0) | ((a == 0.0) & (b > 0.0))
        rows.append(jnp.where(tl, -1.0, 0.0))
    # row 19: slim-body safety (vertex.py triangle setup "safe": the
    # per-sample w/depth-range tests provably cannot fire). Invalid
    # triangles don't constrain their group (they never pass the hit test),
    # so they read as safe. rasterize_pallas reduces this to a per-GROUP
    # flag after the stream permutation.
    safe = setup.get("safe") if _SAFE_SLIM else None
    if safe is None:
        rows.append(jnp.zeros_like(rows[0]))  # no flag -> full-test body
    else:
        rows.append(jnp.where(safe | ~valid, 1.0, 0.0))
    zero = jnp.zeros_like(rows[0])
    while len(rows) < TRI_ROWS:
        rows.append(zero)
    tri_data = jnp.stack(rows, axis=0)  # (TRI_ROWS, T)
    if perm is not None:
        tri_data = tri_data[:, perm]
    return tri_data


# Row-stack form for the packed prepare outputs (pack_tri_rows):
# "concat" assembles (C, T) via 1-D concatenate + reshape, so every
# fusion output stays a DENSE (T,) vector; "stack" (jnp.stack) feeds the
# concat with rank-2 (1, T) pieces, which tile-pad 8x in the sublane dim
# and re-inflate the elementwise pipeline's HBM traffic
# (tools/prepare_anatomy2.py: the stacked form's fusions all emit
# f32[1,T] outputs). Values are identical (stack == concat + reshape).
_ROW_STACK_FORM = "concat"


def _stack_rows(rows):
    if _ROW_STACK_FORM == "concat":
        return jnp.concatenate(rows).reshape(len(rows), rows[0].shape[0])
    return jnp.stack(rows, axis=0)


def pack_tri_rows(flat, extra_valid=None, id_base=0):
    """pack_tri_data + the binning bbox rows + the shade-table-build inputs,
    built straight from the FLAT triangle-setup components
    (vertex.py flat_out=True).

    Rationale (round 5, tools/prepare_anatomy.py): the legacy prepare
    program's 3.5 ms was XLA fusions over lane-padded (T,3,3)/(T,2,3)
    intermediates (f32[T,1]/f32[T,1,3] fusion operands, 128x lane waste);
    here every value is a (T,) vector stacked once into dense (C, T)
    stream rows, and the padded shapes never exist. Row semantics are
    IDENTICAL to pack_tri_data + rasterize_pallas's bbox_rows (same
    expressions on the same values), so downstream results are bit-equal.

    Returns the PACKED setup dict consumed by rasterize_pallas /
    build_shade_table_pallas / stream_perm:
      tri_data  (TRI_ROWS, T) f32 — the raster kernel stream
      bbox_rows (4, T) f32 valid-masked binning bboxes
      edge9     (9, T) f32 cofactor planes (table build)
      anchor2   (2, T) f32
      valid     (T,) bool (final: setup validity AND extra_valid)
    """
    valid = _packed_valid(flat, extra_valid)
    num_tris = valid.shape[0]
    tri_ids = jnp.arange(num_tris, dtype=jnp.float32) + jnp.asarray(
        id_base, jnp.float32
    )
    td, br, e9, a2 = packed_row_lists(flat, valid, tri_ids)
    return dict(tri_data=_stack_rows(td), bbox_rows=_stack_rows(br),
                edge9=_stack_rows(e9), anchor2=_stack_rows(a2),
                valid=valid)


def _packed_valid(flat, extra_valid=None):
    """The packed path's validity rule: setup validity AND a non-empty
    clamped screen bbox (PER-TRIANGLE screen cull).

    This replaces the legacy per-instance frustum-cull gather
    (visible[tri_instance] — measured 1.5-1.9 ms/frame at 262k triangles,
    the single hottest op of the prepare stage: I~200-element BOOL table
    gathers run at ~6-7 ns/idx, tools/vis_gather_probe.py /
    prepare_profile.py). Frame output is IDENTICAL: an instance-culled
    triangle lies entirely outside the frustum, where no sample can pass
    the kernel's exact inside/0<=depth<=1/w>0 tests, and its clamped
    bbox is empty so the raster never visits it — while a triangle this
    rule culls (empty clamped bbox) could never produce a sample either.
    extra_valid carries the sharded path's is_real padding mask."""
    b0, b1, b2, b3 = flat["bbox_cols"]
    valid = flat["valid"] & (b2 > b0) & (b3 > b1)
    if extra_valid is not None:
        valid = valid & extra_valid
    return valid


def packed_row_lists(flat, valid, tri_ids):
    """The packed-setup ROW LISTS (tri_data, bbox_rows, edge9, anchor2)
    as per-row arrays of whatever shape the flat components carry — the
    SINGLE SOURCE of the row semantics, shared by the XLA pack
    (pack_tri_rows stacks them) and the Mosaic setup kernel
    (ops/setup_kernel.py writes them to its output refs row by row)."""
    er = flat["edges_raster"]
    zp, wp = flat["zplane"], flat["wplane"]

    def no_negzero(c):  # see pack_tri_data
        return jnp.where(c == 0.0, jnp.float32(0.0), c)

    rows = []
    for e in er:
        rows += [e[0], e[1], no_negzero(e[2])]
    rows += [zp[0], zp[1], no_negzero(zp[2])]
    rows += [wp[0], wp[1], no_negzero(wp[2])]
    rows += [jnp.where(valid, tri_ids, -1.0)]
    for e in er:  # rows 16..18: edge fill thresholds as -1.0 / 0.0
        tl = (e[0] > 0.0) | ((e[0] == 0.0) & (e[1] > 0.0))
        rows.append(jnp.where(tl, -1.0, 0.0))
    safe = flat.get("safe") if _SAFE_SLIM else None
    if safe is None:
        rows.append(jnp.zeros_like(rows[0]))
    else:
        rows.append(jnp.where(safe | ~valid, 1.0, 0.0))
    zero = jnp.zeros_like(rows[0])
    while len(rows) < TRI_ROWS:
        rows.append(zero)

    b0, b1, b2, b3 = flat["bbox_cols"]
    bbox_rows = [
        jnp.where(valid, b0, 2**30).astype(jnp.float32),
        jnp.where(valid, b1, 2**30).astype(jnp.float32),
        jnp.where(valid, b2, -(2**30)).astype(jnp.float32),
        jnp.where(valid, b3, -(2**30)).astype(jnp.float32),
    ]
    edge9 = [c for e in flat["edges"] for c in e]
    anchor2 = [flat["anchor_x"], flat["anchor_y"]]
    return rows, bbox_rows, edge9, anchor2


def _part1by1(x):
    """Spread the low 16 bits of x to even bit positions."""
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton_order(setup, granularity: int = 32):
    """Screen-space Morton permutation of the triangles.

    Sorting the stream by the Morton code of each triangle's screen bbox
    center makes consecutive stream chunks screen-local, so the kernel's
    per-chunk bbox prefilter skips nearly everything per tile. Invalid
    triangles sort to the end.
    """
    bbox = setup["bbox"]
    cx = jnp.clip((bbox[:, 0] + bbox[:, 2]) // (2 * granularity), 0, 1023)
    cy = jnp.clip((bbox[:, 1] + bbox[:, 3]) // (2 * granularity), 0, 1023)
    key = _part1by1(cx) | (_part1by1(cy) << 1)
    key = jnp.where(setup["valid"], key, jnp.int32(2**31 - 1))
    return jnp.argsort(key)


def _pad_cols(x, multiple, fill=0.0):
    n = x.shape[-1]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=fill)


def stream_perm(setup, chunk: int = 256, granularity: int = 16):
    """The screen-Morton stream permutation as a standalone (t_pad,) array.

    Exactly the permutation rasterize_pallas(sort="morton") computes
    internally (invalid + padding keyed to INT_MAX -> stream tail), split
    out so the split-stage frame program can CACHE it across frames: the
    argsort costs ~9 ms/frame at 262k triangles, but the sort only affects
    raster locality, never output (lexicographic depth ties use original
    ids), so a slightly stale permutation — re-sorted only when the camera
    moves past RenderConfig.resort_threshold — is exact.
    """
    valid = setup["valid"]
    t = valid.shape[0]
    t_pad = -(-t // chunk) * chunk
    g = granularity
    if "bbox_rows" in setup:  # packed setup (pack_tri_rows)
        br = setup["bbox_rows"]
        cx = jnp.clip((br[0] + br[2]).astype(jnp.int32) // (2 * g), 0, 1023)
        cy = jnp.clip((br[1] + br[3]).astype(jnp.int32) // (2 * g), 0, 1023)
    else:
        bbox = setup["bbox"]
        cx = jnp.clip((bbox[:, 0] + bbox[:, 2]) // (2 * g), 0, 1023)
        cy = jnp.clip((bbox[:, 1] + bbox[:, 3]) // (2 * g), 0, 1023)
    key = _part1by1(cx) | (_part1by1(cy) << 1)
    key = jnp.where(valid, key, jnp.int32(2**31 - 1))
    if t_pad != t:
        key = jnp.pad(key, (0, t_pad - t), constant_values=jnp.int32(2**31 - 1))
    return jnp.argsort(key)


WINDOW_ROWS = 32  # sublane rows rasterized per triangle window step

# Cap on ONE column-segment accumulator buffer (id + depth x layers).
# Mosaic double-buffers output blocks against a 16 MB scoped-VMEM stack
# (measured: 4K layers=1 full columns allocate 2 x 8.9 MB and fail to
# compile), so a single buffer stays under 7 MB. Module-level so tests can
# shrink it to exercise the segmented (1 < bands < tiles_y) path on small
# framebuffers.
_ACC_VMEM_BUDGET = 7 << 20

# Trace-time diagnostic knob (tools/raster_bound_probe.py,
# tools/raster_skeleton_probe.py): "full" = the production kernel;
# "one_edge" = per-triangle body reduced to a single edge eval + select
# (isolates VPU work); "empty" = window loop runs but accumulators pass
# through untouched (loop/DMA/scalar skeleton only). Round-5 skeleton
# DECOMPOSITION modes (VERDICT r4 #2 — split the 8.15 ms empty skeleton
# into hardware-attributable parts): "init_only" = accumulator init +
# output copy-out, no visit loop; "dma_tiny" = the visit/DMA chain with
# 1-row (chunk,) copies (issue+wait latency, negligible bytes);
# "dma_only" = full-size DMAs, no group work (adds the transfer bytes);
# "groups_only" = + per-group scalar bbox/safe tests, window loops never
# entered. Output is WRONG for anything but "full" — never set elsewhere.
_PROBE_BODY = "full"

# Trace-time A/B switch (tools/raster_winskip_ab.py): skip the entire
# vector window body (incl. accumulator read/write) when no group member's
# scalar hit test passes — 15.6% of group-window visits at 1080p Sponza
# are all-miss. MEASURED A WASH (28.9 skip vs 28.1 plain, bit-identical):
# like the per-triangle conds of round 1 and the lexmin tree, the
# window-loop pipelining already hides the skippable work and the cond
# disrupts as much as it saves. Default off; kept for re-measurement.
_SKIP_EMPTY_WINDOWS = False

# Trace-time A/B switch (tools/raster_safe_ab.py): route setup's "safe"
# flag into stream row 19 so groups of statically-proven triangles take the
# slim window body (no per-sample w/depth-range tests). False forces the
# full-test body everywhere (row 19 = 0). Output is bit-identical either
# way; default on (measured win, see config.py raster notes).
_SAFE_SLIM = True

# Trace-time A/B switch (tools/raster_unroll_ab.py): unroll factor for the
# per-chunk GROUP fori_loop. The round-3 bound probe measured the empty
# skeleton at 8.15 ms ≈ 300 ns per group-loop iteration (27k iterations/
# frame at 1080p Sponza) — loop control, not work. Unrolling trades code
# size for loop overhead; output is identical (the loop body is
# iteration-independent up to the accumulator chain).
_GROUP_UNROLL = 1

# Trace-time diagnostic knob (tools/raster_prologue_probe.py): return the
# four kernel operands (hit_counts, hit_list, tri_data, tri_bbox) INSTEAD
# of calling the kernel — times the raster program's XLA prologue (perm
# gathers, group reductions, chunk bboxes, binning) in isolation. The
# round-5 skeleton probes folded this prologue into "init_only", which a
# synthetic re-measurement (tools/copyout_layout_probe.py: identical init
# work alone ~1 ms, not 5.5) showed was a misattribution. Output has the
# wrong type for every consumer — never set outside probes.
_RETURN_KERNEL_INPUTS = False

# Trace-time A/B switch (tools/binning_frame_ab.py): the keyed-sort
# hit-list construction (sort(where(hit, chunk_id, INT_MAX)) — half the
# sort payload of the stable bool argsort) won standalone (4.9 vs 6.6 ms,
# tools/binning_ab.py) but LOST at raster-stage level (median 29.9 vs
# 24.7 ms, argsort faster in 5/6 interleaved reps, bit-equal outputs):
# inside the fused stage XLA treats the bool-keyed stable argsort better
# than the i32 sort. Default stays argsort; flip for re-measurement.
_BIN_ARGSORT_FORM = True


def _raster_kernel(
    # scalar prefetch
    hit_counts_ref,  # (num_tiles,) i32 in SMEM
    params_ref,  # (1,) i32 in SMEM: [0] = framebuffer y offset (sp bands)
    # inputs
    hit_list_ref,  # (8, n_chunks_pad) i32 in SMEM — 8 tiles' hit chunks
    tri_data_hbm,  # (16, T_pad) f32 in ANY/HBM
    tri_bbox_hbm,  # (4, T_pad) f32 in ANY/HBM
    # outputs (blocked per tile): per layer (id, depth) pairs, then scratch
    *outs_and_scratch,
    # out_id_ref[l],  (1, S*th, tw) i32 VMEM — row = y*S + s (y-major)
    # out_depth_ref[l],  (1, S*th, tw) f32 VMEM
    # data_smem: (2, 16, CHUNK) f32 SMEM (double-buffered chunk stream)
    # bbox_smem: (2, 8, CHUNK) f32 SMEM (rows 4-7 = group bboxes)
    # data_sem, bbox_sem: DMA (2,)
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_chunks: int,
    sample_offsets: tuple,
    layers: int,
    window_rows: int,
    group_size: int,
    interleave: int,
    bands: int = 1,
):
    """Streaming raster kernel, y-major sample interleave + row windows.

    bands > 1 is COLUMN-SUPERTILE mode: one grid program rasterizes a
    column SEGMENT of `bands` vertically-stacked (tile_h, tile_w) tiles
    (the whole column when the accumulator block fits _ACC_VMEM_BUDGET) —
    output refs gain a leading band dim ((bands, 1, rows, tw) blocks of
    the 4-D x-major (tiles_y, tiles_x, rows, tw) output, a pure reshape
    away from the (num_tiles, rows, tw) layout every consumer reads). The
    point:
    chunk hit lists, chunk DMAs, and the per-group scalar hoists amortize
    over the column instead of replaying per tile (a chunk spanning k
    column tiles was DMA'd and group-tested k times; visits measured ~2.7x
    the chunk count at 1080p Sponza). Per-sample math, visit order within
    a (band, window), and the lexicographic depth-tie rule are unchanged,
    so output is bit-identical to bands=1.

    Output rows are ordered row = y*S + s (samples of one pixel row are
    adjacent), so a triangle's screen-space y range maps to ONE contiguous
    row window. Each triangle then only evaluates WINDOW_ROWS-row slices
    covering its bbox instead of the whole (S*th, tw) tile — the dominant
    round-1 cost (a ~10px triangle paid 128 rows of edge evaluation; now it
    pays 32). Windows are aligned to the window stride so successive
    windows of one group are DISJOINT ref slices: Mosaic pipelines the
    window fori_loop and cannot prove dynamic accumulator slices alias, so
    any overlap (the old clamped last window) raced the previous
    iteration's write — wrong samples on real hardware, clean in interpret
    mode. With disjoint windows every window_rows size is bit-identical on
    hardware in the VISIBLE region (verified at 1080p Sponza,
    tools/wr_diff_probe.py; framebuffer padding rows below the bbox clip
    height can legitimately differ — they are cropped before present).
    This invariance additionally requires the screen-space coverage planes
    of ops/vertex.py: cofactor-plane sliver needles used to paint samples
    far outside their triangle's bbox wherever window slop reached.

    interleave = m > 1 REPACKS the window footprint to match small-triangle
    bboxes: lane = (sample_row % m) * (128/m) + (x % (128/m)), buffer row =
    strip * (rows/m) + sample_row // m with strip = x // (128/m). One
    (8, 128) vreg then covers 8m sample rows x 128/m px columns (e.g. m=4
    at 4x MSAA: 8x32 px instead of 2x128 px), so a ~9px-wide Sponza
    triangle stops paying 128-lane-wide edge evaluations — the measured
    round-2 residual waste (tools/raster_patch_sim.py: 2.3x fewer vreg
    evals at m=4/8 for ~1.1x more window visits). Windows then tile in 2-D:
    an outer strip loop (x) around the y window loop. m = 1 is EXACTLY the
    original layout (strip loop elided at trace time). Output semantics are
    identical in every mode; only the in-buffer sample order changes
    (consumers un-map it with pure reshapes — raster_block_pixel_view).

    With layers=K (2..8) the kernel depth-peels: it keeps the K
    lexicographically nearest (depth, draw-order) fragments per sample via a
    branchless sorted-list insertion, which alpha MASK/BLEND compositing
    consumes downstream (the reference's fixed blend state,
    graphics_pipeline.cppm:226-234, resolved against the next-nearest
    surfaces instead of draw-order framebuffer contents).
    """
    out_refs = outs_and_scratch[: 2 * layers]
    id_refs = [out_refs[2 * l] for l in range(layers)]
    depth_refs = [out_refs[2 * l + 1] for l in range(layers)]
    data_smem, bbox_smem, data_sem, bbox_sem = outs_and_scratch[2 * layers:]
    tile_idx = pl.program_id(0)
    s_count = len(sample_offsets)
    log2s = {1: 0, 2: 1, 4: 2, 8: 3}[s_count]
    rows = s_count * tile_h
    m = interleave
    log2m = {1: 0, 2: 1, 4: 2, 8: 3, 16: 4}[m]
    cols = tile_w // m  # px columns per lane row (one x strip)
    rows_per_strip = rows // m
    win = min(window_rows, rows_per_strip)

    # program = one column segment of `bands` tiles (bands == 1: one tile)
    tile_x0_i = tile_idx % tiles_x * tile_w
    tile_y0_i = tile_idx // tiles_x * (bands * tile_h) + params_ref[0]
    tile_x0 = tile_x0_i.astype(jnp.float32)
    tile_y0 = tile_y0_i.astype(jnp.float32)
    tile_x1 = tile_x0 + float(tile_w)
    # tile_y1 spans the whole program footprint (one tile, or the column)
    tile_y1 = tile_y0 + float(bands * tile_h)

    # static per-window sample patterns. sample_row = buffer_row * m + ym
    # with ym = lane // cols; the sample-offset / y patterns are valid
    # because window starts rs are win-aligned and win*m is a multiple of S
    # (win >= 8, all pow2), so (rs*m) % S == 0 and shifts distribute.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (win, tile_w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (win, tile_w), 1)
    xl_ids = col_ids & (cols - 1)
    sr_pat = row_ids * m + (col_ids >> int(np.log2(cols)))
    y_pat = (sr_pat >> log2s).astype(jnp.float32)
    off_x = jnp.zeros((win, tile_w), jnp.float32)
    off_y = jnp.zeros((win, tile_w), jnp.float32)
    for s, (ox, oy) in enumerate(sample_offsets):
        in_row = (sr_pat & (s_count - 1)) == s
        off_x = jnp.where(in_row, float(ox), off_x)
        off_y = jnp.where(in_row, float(oy), off_y)
    sxx_pat = xl_ids.astype(jnp.float32) + off_x  # + strip x0 per strip
    syy_pat = y_pat + off_y  # + tile_y0 + (rs_local*m)/S per window

    def init_rows(r, _):
        bg = jnp.full((win, tile_w), int(BACKGROUND), jnp.int32)
        one = jnp.ones((win, tile_w), jnp.float32)
        if bands == 1:
            for l in range(layers):
                id_refs[l][0, pl.ds(r * win, win)] = bg
                depth_refs[l][0, pl.ds(r * win, win)] = one
        else:
            b = r // (rows // win)
            rr = r % (rows // win)
            for l in range(layers):
                id_refs[l][b, 0, pl.ds(rr * win, win)] = bg
                depth_refs[l][b, 0, pl.ds(rr * win, win)] = one
        return 0

    jax.lax.fori_loop(0, bands * (rows // win), init_rows, 0, unroll=False)

    count = hit_counts_ref[tile_idx]
    list_row = tile_idx % 8

    def make_dmas(i, slot):
        col = hit_list_ref[list_row, i] * chunk
        if _PROBE_BODY == "dma_tiny":
            # 8-row copies (Mosaic's HBM slice alignment floor): same
            # issue/wait chain, 1/3 of the data bytes
            data_dma = pltpu.make_async_copy(
                tri_data_hbm.at[pl.ds(0, 8), pl.ds(col, chunk)],
                data_smem.at[slot, pl.ds(0, 8)], data_sem.at[slot],
            )
            bbox_dma = pltpu.make_async_copy(
                tri_bbox_hbm.at[:, pl.ds(col, chunk)],
                bbox_smem.at[slot], bbox_sem.at[slot],
            )
            return data_dma, bbox_dma
        data_dma = pltpu.make_async_copy(
            tri_data_hbm.at[:, pl.ds(col, chunk)], data_smem.at[slot],
            data_sem.at[slot],
        )
        bbox_dma = pltpu.make_async_copy(
            tri_bbox_hbm.at[:, pl.ds(col, chunk)], bbox_smem.at[slot],
            bbox_sem.at[slot],
        )
        return data_dma, bbox_dma

    if _PROBE_BODY != "init_only":
        @pl.when(count > 0)
        def _():
            for dma in make_dmas(0, 0):
                dma.start()

    def visit(i, _):
        slot = i % 2

        @pl.when(i + 1 < count)  # prefetch the next hit chunk
        def _():
            for dma in make_dmas(i + 1, (i + 1) % 2):
                dma.start()

        for dma in make_dmas(i, slot):
            dma.wait()

        if _PROBE_BODY in ("dma_only", "dma_tiny"):
            return 0

        def per_group(g, _):
            # rows 4..7 carry the group_size-triangle group bbox (precomputed).
            # Loop order is (group -> window -> triangle) with the window's
            # depth/id accumulators CARRIED through the triangle loop: one
            # VMEM read + one write per (group, window) instead of a
            # read-modify-write per triangle — the per-triangle VMEM
            # dependency chain was the round-1 kernel's real bottleneck
            # (windowing alone made it slower, not faster).
            k0 = g * group_size
            gy0 = bbox_smem[slot, 5, k0]
            gy1 = bbox_smem[slot, 7, k0]
            group_hit = (
                (bbox_smem[slot, 4, k0] < tile_x1)
                & (bbox_smem[slot, 6, k0] > tile_x0)
                & (gy0 < tile_y1)
                & (gy1 > tile_y0)
            )

            # slim-body flag (stream row 19, group-uniform): every member's
            # per-sample w_recip/depth-range tests provably pass inside the
            # triangle (vertex.py "safe"), so the window body drops them —
            # ~20% fewer vector ops on the overwhelmingly-common path, bit-
            # identical output. Two pl.when branches trace two bodies; only
            # one executes per group visit.
            gsafe = data_smem[slot, 19, k0] > 0.0

            if _PROBE_BODY == "groups_only":
                # keep the group scalar tests + both branch predicates
                # live, never enter a window loop (the runtime-false term
                # rides the y-offset scalar, so nothing folds at trace
                # time)
                never = params_ref[0] < jnp.int32(-(1 << 30))

                @pl.when(group_hit & gsafe & never)
                def _():
                    data_smem[slot, 0, 0] = tile_x0

                @pl.when(group_hit & jnp.logical_not(gsafe) & never)
                def _():
                    data_smem[slot, 0, 0] = tile_y0

                return 0

            def run_group(slim):
                # band range of the group within this program's footprint
                # (bands == 1: the single tile). A band is hit iff
                # gy0 < band_y1 and gy1 > band_y0 (strict, matching
                # group_hit); ceil(gy1) - 1 is the last strictly-covered
                # integer row for both integral and fractional gy1.
                if bands > 1:
                    cy0 = jnp.maximum(gy0, tile_y0)
                    band0 = jnp.clip(
                        (cy0.astype(jnp.int32) - tile_y0_i) // tile_h,
                        0, bands - 1,
                    )
                    cy1 = jnp.minimum(gy1, tile_y1)
                    band_last = jnp.clip(
                        (jnp.ceil(cy1).astype(jnp.int32) - 1 - tile_y0_i)
                        // tile_h,
                        0, bands - 1,
                    )
                if m > 1:
                    # x strip range of the group within this tile
                    gx0 = bbox_smem[slot, 4, k0]
                    gx1 = bbox_smem[slot, 6, k0]
                    sx0c = jnp.clip(
                        jnp.maximum(gx0, tile_x0).astype(jnp.int32)
                        - tile_x0_i, 0, tile_w - 1)
                    sx1c = jnp.clip(
                        jnp.minimum(gx1, tile_x1).astype(jnp.int32)
                        - tile_x0_i, 0, tile_w - 1)
                    strip0 = sx0c >> int(np.log2(cols))
                    ns = (sx1c >> int(np.log2(cols))) - strip0 + 1

                # Hoist all window/strip-invariant per-triangle scalars
                # (SMEM reads + validity) out of the loops — the scalar
                # unit, not the VPU, bounds this kernel, and these replayed
                # per (triangle, window).
                tris = []
                for k in range(group_size):
                    kk = k0 + k
                    tx0 = bbox_smem[slot, 0, kk]
                    tx1 = bbox_smem[slot, 2, kk]
                    ty0 = bbox_smem[slot, 1, kk]
                    ty1 = bbox_smem[slot, 3, kk]
                    vld = data_smem[slot, 15, kk] >= 0.0
                    consts = (
                        tx0, tx1, ty0, ty1, vld,
                        [data_smem[slot, r, kk] for r in range(9)],
                        # slim body needs only the depth plane (rows 9-11);
                        # skipping the w-plane SMEM reads saves 3 scalar
                        # loads per (triangle, group visit)
                        [
                            data_smem[slot, r, kk]
                            for r in range(9, 12 if slim else 15)
                        ],
                        data_smem[slot, 15, kk].astype(jnp.int32),
                        [
                            data_smem[slot, r, kk].astype(jnp.int32)
                            for r in range(16, 19)
                        ],
                    )
                    tris.append(consts)

                def do_strip(strip_i):
                    if m == 1:
                        strip_x0, strip_x1 = tile_x0, tile_x1
                        acc_base = 0
                    else:
                        strip = strip0 + strip_i
                        strip_x0 = tile_x0 + (strip * cols).astype(
                            jnp.float32)
                        strip_x1 = strip_x0 + float(cols)
                        acc_base = strip * rows_per_strip
                    # x/validity half of the bbox test, per strip (the x
                    # span a window actually evaluates)
                    xhits = [
                        (t[0] < strip_x1) & (t[1] > strip_x0) & t[4]
                        for t in tris
                    ]
                    sxx = strip_x0 + sxx_pat  # (win, tw), window-invariant

                    def do_band(b, band_y0_i):
                        # window range covering the group's y span within
                        # this band (bands == 1: the tile). y1c is the
                        # INCLUSIVE index of the last touched pixel row
                        # (samples inside row y1c can still be < gy1), so
                        # the exclusive sample-row end is (y1c + 1) <<
                        # log2s; buffer rows divide sample rows by the lane
                        # interleave m.
                        band_y0 = band_y0_i.astype(jnp.float32)
                        band_y1 = band_y0 + float(tile_h)
                        y0c = (
                            jnp.maximum(gy0, band_y0).astype(jnp.int32)
                            - band_y0_i
                        )
                        y1c = jnp.minimum(
                            jnp.minimum(gy1, band_y1).astype(jnp.int32)
                            - band_y0_i,
                            tile_h - 1,
                        )
                        # r0 aligns DOWN to the window stride so successive
                        # windows are DISJOINT slices [r0 + w*win, r0 +
                        # (w+1)*win) that never need end-clamping (win
                        # divides rows_per_strip). The previous 8-row
                        # alignment let the last window clamp back over its
                        # predecessor's rows; Mosaic pipelines the
                        # fori_loop and cannot see that the dynamic
                        # accumulator slices alias, so the overlapped read
                        # raced the prior write — ~28 wrong samples per
                        # 1080p frame in both directions, worse at smaller
                        # windows (more overlap pairs).
                        r0 = ((y0c << log2s) >> log2m) & ~(win - 1)
                        r_end = (((y1c + 1) << log2s) + (m - 1)) >> log2m
                        nw = jax.lax.max((r_end - r0 + win - 1) // win, 1)

                        def window(w, _):
                            rs_local = r0 + w * win  # disjoint windows
                            rs = pl.multiple_of(acc_base + rs_local, win)
                            y_base = band_y0 + (
                                (rs_local * m) >> log2s).astype(jnp.float32)
                            syy = y_base + syy_pat  # (win, tw)
                            win_y1 = y_base + float((win * m) >> log2s)

                            # all-scalar per-triangle window hit tests
                            # (hoisted; also feed the optional all-miss
                            # window skip, a measured wash — see
                            # _SKIP_EMPTY_WINDOWS)
                            hits = [
                                xhit & (t[2] < win_y1) & (t[3] > y_base)
                                for t, xhit in zip(tris, xhits)
                            ]
                            if _SKIP_EMPTY_WINDOWS:
                                any_hit = hits[0]
                                for h in hits[1:]:
                                    any_hit = any_hit | h

                                @pl.when(any_hit)
                                def _():
                                    _window_body(b, rs, sxx, syy, hits)
                            else:
                                _window_body(b, rs, sxx, syy, hits)
                            return 0

                        jax.lax.fori_loop(0, nw, window, 0, unroll=False)
                        return 0

                    if bands == 1:
                        do_band(0, tile_y0_i)
                    else:
                        jax.lax.fori_loop(
                            band0, band_last + 1,
                            lambda b, _: do_band(
                                b, tile_y0_i + b * tile_h
                            ),
                            0, unroll=False,
                        )

                def _window_body(b, rs, sxx, syy, hits):
                    if bands == 1:
                        accs = [
                            (depth_refs[l][0, pl.ds(rs, win)],
                             id_refs[l][0, pl.ds(rs, win)])
                            for l in range(layers)
                        ]
                    else:
                        accs = [
                            (depth_refs[l][b, 0, pl.ds(rs, win)],
                             id_refs[l][b, 0, pl.ds(rs, win)])
                            for l in range(layers)
                        ]

                    # BRANCHLESS, unrolled straight-line block over the
                    # group triangles: per-TRIANGLE branches (pl.when /
                    # lax.cond) defeat Mosaic's software pipelining and cost
                    # more than the vector math they skip; instead the bbox
                    # miss folds into the coverage mask (a scalar bool AND).
                    for (tx0, _tx1, ty0, _ty1, _vld, ed, zw_c, tri_id,
                         thrs), hit in zip(tris, hits):
                        if _PROBE_BODY == "empty":
                            continue
                        if _PROBE_BODY == "one_edge":
                            e = ed[0] * (sxx - tx0) + ed[1] * (syy - ty0) + ed[2]
                            d_l, i_l = accs[0]
                            msk = hit & (e > 0.0)
                            accs[0] = (jnp.where(msk, e, d_l),
                                       jnp.where(msk, tri_id, i_l))
                            continue
                        # plane rows are anchored at the bbox corner
                        # (tx0, ty0) — evaluate with deltas, which keeps f32
                        # magnitudes small (triangle_setup docstring)
                        dxx = sxx - tx0
                        dyy = syy - ty0

                        def edge_pass(a, b, cc, thr):
                            # fill rule: e > 0, or e == 0 on a top/left
                            # edge — ONE integer compare: non-NaN f32 order
                            # matches int32 order for values > -0.0, exact
                            # zeros are always +0 (constants normalized in
                            # pack_tri_data), and the top/left rule is the
                            # PRECOMPUTED scalar threshold of stream rows
                            # 16..18 (int(e) > -1 means e >= +0).
                            e = a * dxx + b * dyy + cc
                            e_i = jax.lax.bitcast_convert_type(e, jnp.int32)
                            return e_i > thr

                        inside = (
                            edge_pass(ed[0], ed[1], ed[2], thrs[0])
                            & edge_pass(ed[3], ed[4], ed[5], thrs[1])
                            & edge_pass(ed[6], ed[7], ed[8], thrs[2])
                        )
                        depth = zw_c[0] * dxx + zw_c[1] * dyy + zw_c[2]
                        if slim:
                            # group-safe: w_recip > 0 and depth-in-[0,1]
                            # hold at every covered sample by the setup's
                            # margin proof (vertex.py "safe") — the tests
                            # are dropped, output unchanged.
                            base_ok = hit & inside
                        else:
                            w_recip = (
                                zw_c[3] * dxx + zw_c[4] * dyy + zw_c[5]
                            )
                            # 0 <= depth <= 1 as ONE unsigned compare:
                            # negative f32 bitcasts above 0x8000_0000, so
                            # u32(depth) <= u32(1.0f) is exactly the float
                            # range test (exact zeros are +0 per
                            # pack_tri_data normalization).
                            depth_u = jax.lax.bitcast_convert_type(
                                depth, jnp.uint32
                            )
                            # lexicographic (depth, draw-order id): the
                            # stream is Morton-reordered, so strict-less
                            # alone would change who wins exact-depth ties
                            base_ok = (
                                hit
                                & inside
                                & (w_recip > 0.0)
                                & (depth_u <= jnp.uint32(0x3F800000))
                            )

                        # depth peel: branchless insertion into the sorted
                        # K-layer list — bubble the candidate down, layers it
                        # displaces continue down in its place (layers == 1
                        # degenerates to the plain depth-test accumulator).
                        # (A pairwise lexmin TREE over the group's masked
                        # candidates — 3-deep instead of this 8-long chain —
                        # was bit-identical and measured EQUAL speed,
                        # tools/raster_tree_ab.py 28.9 vs 28.2 ms: Mosaic
                        # already pipelines across the insertion chain, so
                        # the simpler form stays.)
                        cur_d, cur_i = depth, tri_id
                        for l in range(layers):
                            d_l, i_l = accs[l]
                            swap = base_ok & (
                                (cur_d < d_l)
                                | ((cur_d == d_l) & (cur_i < i_l))
                            )
                            accs[l] = (jnp.where(swap, cur_d, d_l),
                                       jnp.where(swap, cur_i, i_l))
                            if l + 1 < layers:
                                cur_d = jnp.where(swap, d_l, cur_d)
                                cur_i = jnp.where(swap, i_l, cur_i)

                    for l in range(layers):
                        if bands == 1:
                            depth_refs[l][0, pl.ds(rs, win)] = accs[l][0]
                            id_refs[l][0, pl.ds(rs, win)] = accs[l][1]
                        else:
                            depth_refs[l][b, 0, pl.ds(rs, win)] = accs[l][0]
                            id_refs[l][b, 0, pl.ds(rs, win)] = accs[l][1]
                    return 0

                if m == 1:
                    do_strip(0)  # one full-width strip; no x loop
                else:
                    def strip_step(j, _):
                        do_strip(j)
                        return 0

                    jax.lax.fori_loop(0, ns, strip_step, 0, unroll=False)

            @pl.when(group_hit & gsafe)
            def _():
                run_group(True)

            @pl.when(group_hit & jnp.logical_not(gsafe))
            def _():
                run_group(False)

            return 0

        n_groups = chunk // group_size
        u = _GROUP_UNROLL
        if u <= 1:
            jax.lax.fori_loop(0, n_groups, per_group, 0, unroll=False)
        else:
            # manual partial unroll (Mosaic's fori_loop only supports
            # unroll=1 or full): u group bodies per loop iteration
            def per_group_u(q, _):
                for j in range(u):
                    per_group(q * u + j, 0)
                return 0

            jax.lax.fori_loop(0, n_groups // u, per_group_u, 0,
                              unroll=False)
            # tail: groups the unrolled loop doesn't cover when
            # u does not divide n_groups (configurable chunk/group_size)
            for j in range((n_groups // u) * u, n_groups):
                per_group(j, 0)
        return 0

    if _PROBE_BODY != "init_only":
        jax.lax.fori_loop(0, count, visit, 0, unroll=False)


def rasterize_pallas(
    setup,
    height: int,
    width: int,
    *,
    tile_shape: tuple[int, int] = (32, 128),
    msaa_samples: int = 1,
    chunk: int = 256,
    interpret: bool = False,
    sort: str = "morton",
    y_offset=0,
    id_base=0,
    layers: int = 1,
    window_rows: int | None = None,
    assemble: bool = True,
    perm=None,
    group_size: int = 8,
    interleave: int = 1,
    columns: bool | None = None,
):
    """Rasterize via the Pallas streaming kernel.

    Returns (tri_id, depth) of shape (S, H, W) — same contract as
    rasterize_dense / rasterize_tiled — or (layers, S, H, W) each when
    layers > 1 (depth peeling: the lexicographically nearest fragments per
    sample, nearest first). height/width must be tile multiples.
    sort="morton" streams triangles in screen-space Morton order (tight chunk
    bboxes -> effective prefilter); sort="static" assumes the stream was
    already spatially sorted at scene build (flatten_assets world-space
    Morton) and skips the per-frame argsort + permute gather entirely;
    sort="none" keeps draw order. Results are identical in all modes
    (lexicographic depth ties).

    For multi-chip sharding (vktf_tpu.parallel): y_offset (traced scalar ok)
    places this call's framebuffer band at a pixel-row offset in screen
    space, and id_base offsets the emitted triangle ids so gp-sharded
    triangle blocks keep globally-unique, draw-order-monotonic ids.
    """
    th, tw = tile_shape
    assert height % th == 0 and width % tw == 0
    if chunk % 128 != 0:
        raise ValueError(f"chunk must be a multiple of 128 (DMA tiling), got {chunk}")
    if window_rows is None:
        window_rows = WINDOW_ROWS
    if window_rows % 8 != 0 or window_rows & (window_rows - 1):
        raise ValueError(
            f"window_rows must be a power of two >= 8 (disjoint-window "
            f"alignment), got {window_rows}"
        )
    if interleave < 1 or interleave > 16 or interleave & (interleave - 1):
        raise ValueError(
            f"interleave must be a power of two in 1..16, got {interleave}"
        )
    if interleave > 1 and tw != 128:
        raise ValueError(
            f"interleave > 1 assumes 128-px-wide tiles (lane packing), "
            f"got tile width {tw}"
        )
    if (th * msaa_samples) % interleave != 0:
        raise ValueError(
            f"tile rows ({th}*{msaa_samples}) must be a multiple of the "
            f"lane interleave ({interleave})"
        )
    rows_per_strip = th * msaa_samples // interleave
    win = min(window_rows, rows_per_strip)
    if rows_per_strip % win != 0:
        raise ValueError(
            f"per-strip rows ({th}*{msaa_samples}/{interleave}) must be a "
            f"multiple of the raster window ({win})"
        )
    # triangle ids ride an f32 stream row; beyond 2^24 they stop being exact
    if setup["valid"].shape[0] >= 1 << 24:
        raise ValueError("rasterize_pallas supports < 2^24 triangles")
    tiles_y, tiles_x = height // th, width // tw
    num_tiles = tiles_y * tiles_x
    offsets = tuple(SAMPLE_OFFSETS[msaa_samples])
    S = len(offsets)
    rows = S * th

    if not 1 <= layers <= 8:
        raise ValueError(f"layers must be in 1..8, got {layers}")
    # Column-supertile mode (kernel docstring): one program per COLUMN
    # SEGMENT of `bands` vertically-stacked tiles, so chunk hit lists /
    # DMAs / scalar hoists amortize over the segment. bands = the largest
    # divisor of tiles_y whose (id + depth) accumulator block fits the
    # scoped-VMEM budget: Mosaic double-buffers output blocks against a
    # 16 MB scoped stack (measured: 4K layers=1 full columns allocate
    # 2 x 8.9 MB and fail to compile), so cap a single buffer at 7 MB.
    bands = 1
    if (columns if columns is not None else True) and tiles_y > 1:
        for d in range(2, tiles_y + 1):
            if (tiles_y % d == 0
                    and d * rows * tw * 8 * layers <= _ACC_VMEM_BUDGET):
                bands = d
    column_mode = bands > 1
    num_bins = (tiles_y // bands) * tiles_x

    if sort not in ("morton", "static", "none"):
        raise ValueError(f"unknown sort mode {sort!r}")
    # validate group_size BEFORE _group_rows consumes it (a bad value would
    # otherwise surface as a cryptic reshape error)
    if chunk % group_size != 0 or group_size & (group_size - 1):
        raise ValueError(
            f"group_size must be a power of two dividing chunk, got {group_size}"
        )
    num_tris = setup["valid"].shape[0]
    if "tri_data" in setup:
        # PACKED setup (pack_tri_rows): the stream rows were built inside
        # the prepare program (flat component-major pipeline, round 5) —
        # id_base is baked there
        if not (isinstance(id_base, int) and id_base == 0):
            raise ValueError("packed setup bakes id_base at pack time")
        tri_data = setup["tri_data"]
        bbox_rows = setup["bbox_rows"]
    else:
        tri_data = pack_tri_data(setup, None, id_base=id_base)
        valid = setup["valid"]
        bbox = setup["bbox"]
        bbox_rows = jnp.stack(
            [
                jnp.where(valid, bbox[:, 0], 2**30).astype(jnp.float32),
                jnp.where(valid, bbox[:, 1], 2**30).astype(jnp.float32),
                jnp.where(valid, bbox[:, 2], -(2**30)).astype(jnp.float32),
                jnp.where(valid, bbox[:, 3], -(2**30)).astype(jnp.float32),
            ],
            axis=0,
        )  # (4, T)
    tri_data = _pad_cols(tri_data, chunk)
    t_pad = tri_data.shape[1]
    if t_pad > num_tris:  # mark stream padding invalid (id row < 0), safe
        tri_data = tri_data.at[15, num_tris:].set(-1.0)
        tri_data = tri_data.at[19, num_tris:].set(1.0)
    n_chunks = t_pad // chunk

    bbox_rows = jnp.concatenate(
        [
            _pad_cols(bbox_rows[:2], chunk, 2**30),
            _pad_cols(bbox_rows[2:], chunk, -(2**30)),
        ],
        axis=0,
    )  # (4, t_pad)

    if perm is not None:
        # caller-provided (possibly cached cross-frame) stream permutation
        tri_data = tri_data[:, perm]
        bbox_rows = bbox_rows[:, perm]
    elif sort == "morton":
        # screen Morton keys from the padded bbox rows (invalid -> INT_MAX,
        # so padding and rejected triangles sort to the stream tail).
        # (A group-granularity variant — argsort T/16 keys of the flatten-time
        # world-Morton groups — measured 2.7x SLOWER overall: world-order
        # groups are too screen-spread, chunk bboxes go loose. The full
        # per-triangle argsort earns its ~9 ms.)
        g = 16  # swept 8/16/32/64 at 1080p sponza: 16 fastest (62.8/66.7/67.1/73.8 ms)
        cx = jnp.clip((bbox_rows[0] + bbox_rows[2]).astype(jnp.int32) // (2 * g), 0, 1023)
        cy = jnp.clip((bbox_rows[1] + bbox_rows[3]).astype(jnp.int32) // (2 * g), 0, 1023)
        key = _part1by1(cx) | (_part1by1(cy) << 1)
        key = jnp.where(tri_data[15] >= 0.0, key, jnp.int32(2**31 - 1))
        perm = jnp.argsort(key)
        tri_data = tri_data[:, perm]
        bbox_rows = bbox_rows[:, perm]

    # row 19 -> per-GROUP slim-body flag (AND over the group, on the FINAL
    # stream order): the kernel branches once per group visit, so the flag
    # must be group-uniform. Stream padding was marked safe above (id < 0
    # rows never pass the hit test), so tail groups still take the slim body.
    gsafe = tri_data[19].reshape(t_pad // group_size, group_size).min(axis=1)
    tri_data = tri_data.at[19].set(jnp.repeat(gsafe, group_size))

    def _group_rows(rows4):  # (4, Tp) -> (4, Tp) per-group bbox, repeated
        tp = rows4.shape[1]
        g = rows4.reshape(4, tp // group_size, group_size)
        lo = jnp.repeat(g[:2].min(axis=2), group_size, axis=1)
        hi = jnp.repeat(g[2:].max(axis=2), group_size, axis=1)
        return jnp.concatenate([lo, hi], axis=0)

    # rows 4..7: per-group triangle bboxes (kernel's mid-level skip)
    tri_bbox = jnp.concatenate([bbox_rows, _group_rows(bbox_rows)], axis=0)
    chunk_bbox = jnp.stack(
        [
            tri_bbox[0].reshape(-1, chunk).min(axis=1),
            tri_bbox[1].reshape(-1, chunk).min(axis=1),
            tri_bbox[2].reshape(-1, chunk).max(axis=1),
            tri_bbox[3].reshape(-1, chunk).max(axis=1),
        ],
        axis=0,
    )  # (4, n_chunks)

    # Per-tile hit-chunk lists (chunk-level binning, done in XLA — the
    # (num_tiles x n_chunks) overlap matrix is tiny next to the triangle
    # stream): each tile's kernel loop then touches ONLY its hit chunks, with
    # the next chunk's DMA prefetched while the current one rasterizes.
    y_off = jnp.asarray(y_offset, jnp.int32)
    # bins = column segments of `bands` tiles (bands == 1: plain tiles)
    bin_h = bands * th
    bin_ids = jnp.arange(num_bins, dtype=jnp.int32)
    t_x0 = ((bin_ids % tiles_x) * tw).astype(jnp.float32)[:, None]
    t_y0 = ((bin_ids // tiles_x) * bin_h + y_off).astype(jnp.float32)[:, None]
    overlap = (
        (chunk_bbox[0][None, :] < t_x0 + tw)
        & (chunk_bbox[2][None, :] > t_x0)
        & (chunk_bbox[1][None, :] < t_y0 + bin_h)
        & (chunk_bbox[3][None, :] > t_y0)
    )  # (num_bins, n_chunks)
    # Hit-list compaction. Both forms yield the same counted prefix (the
    # only part the kernel dereferences — initial DMA and prefetch are
    # guarded by hit_counts); see _BIN_ARGSORT_FORM for the measured
    # stage-level A/B that keeps the argsort form as default.
    if _BIN_ARGSORT_FORM:
        hit_list = jnp.argsort(~overlap, axis=1, stable=True).astype(jnp.int32)
    else:
        chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
        hit_list = jnp.sort(
            jnp.where(overlap, chunk_ids, jnp.int32(2**31 - 1)), axis=1
        )
    hit_counts = jnp.sum(overlap, axis=1).astype(jnp.int32)
    # SMEM block constraints: pad the list to (8-row, 128-col) block multiples
    hit_list = _pad_cols(hit_list, 128)
    rows_pad = (-num_bins) % 8
    if rows_pad:
        hit_list = jnp.concatenate(
            [hit_list, jnp.zeros((rows_pad, hit_list.shape[1]), jnp.int32)]
        )

    hit_cols = hit_list.shape[1]

    kernel = functools.partial(
        _raster_kernel,
        tiles_x=tiles_x,
        tile_h=th,
        tile_w=tw,
        chunk=chunk,
        n_chunks=n_chunks,
        sample_offsets=offsets,
        layers=layers,
        window_rows=window_rows,
        group_size=group_size,
        interleave=interleave,
        bands=bands,
    )

    if column_mode:
        # 4-D x-major output (tiles_y, tiles_x, rows, tw): each program
        # writes its segment's bands as a (bands, 1, rows, tw) block; the
        # (num_tiles, rows, tw) layout every consumer reads is then a pure
        # reshape (x-major tile order preserved bit-for-bit).
        out_specs = [
            pl.BlockSpec(
                (bands, 1, rows, tw),
                lambda i, *_: (i // tiles_x, i % tiles_x, 0, 0),
            )
            for _ in range(2 * layers)
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (tiles_y, tiles_x, rows, tw),
                jnp.int32 if i % 2 == 0 else jnp.float32,
            )
            for i in range(2 * layers)
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, rows, tw), lambda i, *_: (i, 0, 0))
            for _ in range(2 * layers)
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (num_tiles, rows, tw), jnp.int32 if i % 2 == 0 else jnp.float32
            )
            for i in range(2 * layers)
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_bins,),
        in_specs=[
            pl.BlockSpec(  # 8-bin group of hit-chunk lists, scalar-readable
                (8, hit_cols), lambda i, *_: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # tri_data stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # tri_bbox stays in HBM
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((2, TRI_ROWS, chunk), jnp.float32),
            pltpu.SMEM((2, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    if _RETURN_KERNEL_INPUTS:  # probe-only: prologue timing, see flag note
        return (hit_counts, hit_list), (tri_data, tri_bbox)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(hit_counts, y_off.reshape(1), hit_list, tri_data, tri_bbox)
    if column_mode:
        outs = [o.reshape(num_tiles, rows, tw) for o in outs]

    if not assemble:
        # raw per-tile blocks (num_tiles, S*th, tw), row = y*S + s — the
        # tile-layout shade/resolve path consumes these directly, skipping
        # two 33 MB assemble transposes per frame
        if layers == 1:
            return outs[0], outs[1]
        return (jnp.stack([outs[2 * l] for l in range(layers)]),
                jnp.stack([outs[2 * l + 1] for l in range(layers)]))

    def assemble_fn(tiles):  # (num_tiles, th*S, tw) -> (S, H, W)
        if interleave == 1:  # row = y*S + s
            return (
                tiles.reshape(tiles_y, tiles_x, th, S, tw)
                .transpose(3, 0, 2, 1, 4)
                .reshape(S, height, width)
            )
        # interleaved layout: row = strip*rows_per_strip + sample_row//m,
        # lane = (sample_row % m)*cols + x % cols. Un-map with reshapes
        # (the (rps, ym) merge is contiguous) + one transpose.
        mi = interleave
        cols = tw // mi
        rps = rows // mi
        return (
            tiles.reshape(tiles_y, tiles_x, mi, rps, mi, cols)
            .reshape(tiles_y, tiles_x, mi, th, S, cols)  # sample_row=(y, s)
            .transpose(4, 0, 3, 1, 2, 5)  # (S, ty, th, tx, strip, cols)
            .reshape(S, height, width)
        )

    if layers == 1:
        return assemble_fn(outs[0]), assemble_fn(outs[1])
    tri_id = jnp.stack([assemble_fn(outs[2 * l]) for l in range(layers)])
    depth = jnp.stack([assemble_fn(outs[2 * l + 1]) for l in range(layers)])
    return tri_id, depth

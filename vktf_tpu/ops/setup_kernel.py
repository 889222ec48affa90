"""Per-triangle setup + stream pack as ONE Mosaic kernel.

The XLA packed prepare (flat triangle setup -> pack_tri_rows) still costs
~2.4-2.8 ms/frame at 262k triangles even with every intermediate a dense
(T,) vector: its ~27 loop fusions re-materialize ~500 MB of (T,) rows in
HBM between launches (tools/prepare_anatomy2.py: math-only with a trivial
consumer measures ~2.4 ms against a ~0.15 ms traffic bound). This kernel
runs the WHOLE stage — clip transform, homogeneous setup, near-crosser
bbox clipping, anchored plane constants, slim-safety proof, cull mask and
the stream-row pack — per 4096-triangle block in VMEM, reading the
(36, T) corner table + (16, T) instance-matrix rows + a visibility row
once and writing the packed rows once.

Layout: triangles ride FULL (8, 128) vector tiles — inputs are viewed as
(C, T/128, 128) and each block is (C, 32, 128), so every component op is
a dense (32, 128) vreg op (a first (1, B) row form left 7/8 of each
vreg's sublanes idle and measured 2.8 ms; this form measures ~0.4 ms).

Math is SINGLE-SOURCE with the XLA path: the body calls
vertex._setup_from_corners(flat_out=True) and
raster_pallas.packed_row_lists on (32, 128) component tiles — the same
expressions the XLA pipeline traces, so any numeric difference is limited
to Mosaic-vs-XLA FMA contraction (measured: whole frames bit-equal to
the XLA form on hardware, maxdiff=0 — tools/prepare_kernel_ab.py; the
single-chip and sharded paths still follow ONE RenderConfig.prepare_impl
knob so both sides always compute identical constants).

Reference scope: the vertex stage + fixed-function raster state setup
(vertex.glsl, graphics_pipeline.cppm:205-234) — the reference runs this
per-vertex on GPU fixed hardware; here it is one fused VPU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vktf_tpu.ops.raster_pallas import TRI_ROWS, packed_row_lists
from vktf_tpu.ops.vertex import _setup_from_corners

_BLOCK_ROWS = 32           # sublane rows per block
_LANES = 128
_BLOCK = _BLOCK_ROWS * _LANES  # triangles per block (4096)
# output row split: tri_data | bbox_rows | edge9 | anchor2 | validf
_SPLITS = (TRI_ROWS, 4, 9, 2, 1)


def _flat_valid(params_ref, tc_ref, mrt_ref, vis_ref,
                *, width: int, height: int):
    """Shared kernel body: corners+matrices in -> (flat setup, valid).

    params (SMEM f32): [0:16] view_projection row-major, [16] id_base.
    tc (36, 32, 128): scene.tri_corner block (rows 6..14 = object-space
    corner position channels, vertex.triangle_setup_cm layout).
    mrt (16, 32, 128): the per-triangle instance-matrix rows TRANSPOSED.
    vis (1, 32, 128): 1.0 where the instance survives frustum culling
    (and, sharded, is a real row). Every component is a dense (32, 128)
    tile = 4 full vregs.
    """
    tc = tc_ref[:]
    mrt = mrt_ref[:]

    def r(a, i):  # (32, 128) component tile
        return a[i]

    # world corners per channel c, corner i — the same expression
    # triangle_setup_cm evaluates (rotate+translate on pre-gathered
    # corner channels)
    m = [[r(mrt, ri * 4 + ci) for ci in range(4)] for ri in range(4)]
    wc = [
        [
            m[c][0] * r(tc, 6 + 0 + i)
            + m[c][1] * r(tc, 6 + 3 + i)
            + m[c][2] * r(tc, 6 + 6 + i)
            + m[c][3]
            for i in range(3)
        ]
        for c in range(3)
    ]

    def vp(k, i):
        return params_ref[k * 4 + i]

    def clip_row(k, i):
        return (
            vp(k, 0) * wc[0][i] + vp(k, 1) * wc[1][i] + vp(k, 2) * wc[2][i]
            + vp(k, 3)
        )

    x = [clip_row(0, i) for i in range(3)]
    y = [clip_row(1, i) for i in range(3)]
    z = [clip_row(2, i) for i in range(3)]
    w = [clip_row(3, i) for i in range(3)]

    flat = _setup_from_corners(x, y, z, w, width, height, flat_out=True)

    # per-triangle SCREEN cull (raster_pallas._packed_valid's rule) + the
    # caller's extra mask (sharded is_real padding; all-ones single-chip)
    from vktf_tpu.ops.raster_pallas import _packed_valid

    valid = _packed_valid(flat, vis_ref[0] > 0.5)
    return flat, valid


def _kernel(params_ref, tc_ref, mrt_ref, vis_ref, ids_ref,
            td_ref, br_ref, e9_ref, a2_ref, vf_ref,
            *, width: int, height: int):
    """One 4096-triangle block: corners+matrices in, packed rows out.

    tri ids ride an INPUT row (ids_ref) rather than an in-kernel iota so
    the original-order prepare pass and the pre-permuted stream pass
    (config.raster_prestream) are the SAME kernel program — same Mosaic
    binary, same FMA contraction, bit-identical per-lane outputs. (A
    first stream variant with its own reduced-output kernel produced
    plane constants off by contraction ULPs — enough to shift a bbox
    floor and move an anchored plane constant by a whole |a|.)"""
    flat, valid = _flat_valid(params_ref, tc_ref, mrt_ref, vis_ref,
                              width=width, height=height)
    td, br, e9, a2 = packed_row_lists(flat, valid, ids_ref[0])
    for i, row in enumerate(td):
        td_ref[i] = row
    for i, row in enumerate(br):
        br_ref[i] = row
    for i, row in enumerate(e9):
        e9_ref[i] = row
    for i, row in enumerate(a2):
        a2_ref[i] = row
    vf_ref[0] = valid.astype(jnp.float32)


def setup_pack_kernel(tri_corner, mrowsT, visf, view_projection,
                      width: int, height: int, *, id_base=0, ids=None,
                      interpret: bool = False, keep_pad: bool = False):
    """PACKED setup dict from component-major inputs, one Mosaic pass.

    tri_corner (36, T) f32; mrowsT (16, T) f32; visf (1, T) f32 (1.0 =
    instance visible / real row); view_projection (4, 4) traced;
    id_base traced scalar ok (sharded micro-shards bake global ids).
    Returns the same dict contract as raster_pallas.pack_tri_rows.

    ids (1, T) f32 optionally OVERRIDES the default id_base + position
    row — the pre-permuted stream pass (config.raster_prestream) feeds
    the original draw-order ids of its permuted columns here, keeping
    lexicographic depth ties exact under any stream order. Both passes
    run THIS one kernel program (ids is always an input row), so their
    per-lane outputs are bit-identical by construction. keep_pad=True
    returns the full block-aligned width (all-pad columns are invalid-
    marked: id row -1, slim row 1, bbox rows sentinel) — the stream pass
    hands that straight to rasterize_pallas, whose all-invalid tail
    chunks bin to zero hit-list entries.
    """
    t = tri_corner.shape[1]
    t_pad = -(-t // _BLOCK) * _BLOCK
    tb = t_pad // _LANES  # sublane-row count of the (C, tb, 128) view

    def prep(a):
        if t_pad != t:
            a = jnp.pad(a, ((0, 0), (0, t_pad - t)))
        return a.reshape(a.shape[0], tb, _LANES)

    if ids is None:
        ids = (jnp.arange(t, dtype=jnp.float32)
               + jnp.asarray(id_base, jnp.float32))[None]

    params = jnp.asarray(view_projection, jnp.float32).reshape(16)

    grid = (t_pad // _BLOCK,)

    def spec(rows):
        return pl.BlockSpec((rows, _BLOCK_ROWS, _LANES),
                            lambda i, *_: (0, i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_kernel, width=width, height=height),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec(36), spec(16), spec(1), spec(1)],
            out_specs=[spec(rows) for rows in _SPLITS],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, tb, _LANES), jnp.float32)
            for rows in _SPLITS
        ],
        interpret=interpret,
    )(params, prep(tri_corner), prep(mrowsT), prep(visf), prep(ids))

    keep = t_pad if keep_pad else t
    td, br, e9, a2, vf = (
        o.reshape(o.shape[0], t_pad)[:, :keep] for o in outs
    )
    return dict(tri_data=td, bbox_rows=br, edge9=e9, anchor2=a2,
                valid=vf[0] > 0.5)

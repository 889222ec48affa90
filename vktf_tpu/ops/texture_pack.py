"""Material texel pool: quad-packed, material-combined texture storage.

TPU gathers cost ~9ns per INDEX, nearly independent of row width (measured);
classic per-texel sampling (4 taps x 2 mips x 3 textures = 24 gathers/sample)
is therefore ~24x more expensive than it needs to be. This pool restructures
texture memory so one filtered trilinear sample of ALL THREE glTF material
textures (base color, metallic-roughness, normal — the reference's material
descriptor set, material.cppm:138-171) costs exactly TWO row gathers (one per
mip level):

  * the three textures of a material are resampled to one power-of-two
    square chain (they already match in well-authored assets; resampling is
    logged per the skip-and-log ethos);
  * each pool row holds the 2x2 bilinear footprint of all three textures at
    one (level, x, y): [base q00,q10,q01,q11, mr q00..q11, normal q00..q11]
    = 12 u32, with wrap-mode-correct neighbors baked in at build time;
  * pow-of-two square chains make the per-level row offset a closed form
    (offset(l) = 4*(w0^2 - (w0>>l)^2)/3), so no per-sample level-offset
    lookup table is needed — everything a sample needs is computable from
    scalars baked per-triangle into the shade table (ops.shade_table).

Storage is a (P, 12) u32 array fetched with one vectorized 2-D row gather
per mip level (measured the only fast gather form on TPU; the flat-array
sliced-gather alternative lowers to a scalar loop ~150x slower). The minor
dim pads to 128 lanes in HBM (~10x storage) — acceptable against 16G HBM,
revisit if texture budgets grow.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from vktf_tpu.loaders.images import TextureData, default_texture_data
from vktf_tpu.log import Log, default_log

ROW_U32 = 12  # base quad (4) + mr quad (4) + normal quad (4)

WRAP_REPEAT, WRAP_CLAMP, WRAP_MIRROR = 0, 1, 2
_WRAP_CODES = {"repeat": WRAP_REPEAT, "clamp_to_edge": WRAP_CLAMP, "mirrored_repeat": WRAP_MIRROR}


@dataclasses.dataclass
class MaterialPool:
    """Per-material quad-packed texel rows + per-material scalar metadata."""

    quads: jnp.ndarray  # (P, ROW_U32) uint32 — 2-D for fast row gathers
    # per-material scalars (baked into the shade table per triangle):
    base_row: np.ndarray  # (M,) int64 — first row index of the chain
    width0: np.ndarray  # (M,) int32 — level-0 width (= height; pow2 square)
    num_levels: np.ndarray  # (M,) int32
    wrap: np.ndarray  # (M, 2) int32
    filters: np.ndarray  # (M, 3) int32 (mag_nearest, min_nearest, mip_nearest)


def _neighbor(i: np.ndarray, size: int, mode: int) -> np.ndarray:
    """Index of texel i+1 under the wrap mode (vectorized)."""
    j = i + 1
    if mode == WRAP_REPEAT:
        return j % size
    if mode == WRAP_CLAMP:
        return np.minimum(j, size - 1)
    # mirrored repeat: reflect at the boundary
    return np.where(j >= size, 2 * size - 1 - j, j) % max(size, 1)


def _pack_u32(level: np.ndarray) -> np.ndarray:
    return (
        level[..., 0].astype(np.uint32)
        | (level[..., 1].astype(np.uint32) << 8)
        | (level[..., 2].astype(np.uint32) << 16)
        | (level[..., 3].astype(np.uint32) << 24)
    )


def _resample_nearest(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return img[ys][:, xs]


def _to_pow2_square_chain(tex: TextureData, size: int) -> list[np.ndarray]:
    """Return a full mip chain of pow2-square levels of the given size."""
    from vktf_tpu.loaders.images import generate_mips

    base = tex.levels[0]
    if base.shape[0] == size and base.shape[1] == size:
        if len(tex.levels) >= int(np.log2(size)) + 1:
            ok = all(
                lvl.shape[0] == lvl.shape[1] == max(size >> i, 1)
                for i, lvl in enumerate(tex.levels)
            )
            if ok:
                return tex.levels
        return generate_mips(base, tex.srgb)
    return generate_mips(_resample_nearest(base, size), tex.srgb)


def _chain_rows(size: int) -> int:
    total, s = 0, size
    while True:
        total += s * s
        if s == 1:
            break
        s >>= 1
    return total


def level_row_offset(w0: int, level: int) -> int:
    """Closed-form texel-row offset of a mip level in a pow2-square chain."""
    wl = max(w0 >> level, 1)
    return 4 * (w0 * w0 - wl * wl) // 3


def build_material_pool(
    materials: list[dict],
    log: Log | None = None,
) -> MaterialPool:
    """Pack per-material texture triplets.

    `materials`: list of dicts with keys
      base/mr/normal: Optional[TextureData]
      sampler: dict with wrap_u/wrap_v/mag_filter/min_filter/mipmap_mode
    """
    log = log or default_log()
    if not materials:
        materials = [{"base": None, "mr": None, "normal": None, "sampler": {}}]
    count = len(materials)
    base_row = np.zeros(count, np.int64)
    width0 = np.ones(count, np.int32)
    num_levels = np.ones(count, np.int32)
    wrap = np.zeros((count, 2), np.int32)
    filters = np.zeros((count, 3), np.int32)

    blobs: list[np.ndarray] = []
    row_cursor = 0
    for m, spec in enumerate(materials):
        base = spec.get("base") or default_texture_data("base_color")
        mr = spec.get("mr") or default_texture_data("metallic_roughness")
        normal = spec.get("normal") or default_texture_data("normal")
        sampler = spec.get("sampler") or {}

        sizes = {t.levels[0].shape[0] for t in (base, mr, normal)} | {
            t.levels[0].shape[1] for t in (base, mr, normal)
        }
        size = 1 << int(np.ceil(np.log2(max(sizes))))
        if len(sizes) > 1 or size != max(sizes):
            log.error(
                f"Material {m}: textures resampled to {size}x{size} pow2 square "
                f"for the packed pool (sizes {sorted(sizes)})"
            )
        chains = [
            _to_pow2_square_chain(base, size),
            _to_pow2_square_chain(mr, size),
            _to_pow2_square_chain(normal, size),
        ]
        levels = len(chains[0])
        wrap_u = _WRAP_CODES.get(sampler.get("wrap_u", "repeat"), WRAP_REPEAT)
        wrap_v = _WRAP_CODES.get(sampler.get("wrap_v", "repeat"), WRAP_REPEAT)

        base_row[m] = row_cursor
        width0[m] = size
        num_levels[m] = levels
        wrap[m] = (wrap_u, wrap_v)
        filters[m] = (
            int(sampler.get("mag_filter", "linear") == "nearest"),
            int(sampler.get("min_filter", "linear") == "nearest"),
            int(sampler.get("mipmap_mode", "linear") == "nearest"),
        )

        from vktf_tpu import native

        for l in range(levels):
            w = max(size >> l, 1)
            packed = [_pack_u32(chain[l]) for chain in chains]
            rows_native = native.pack_quads_level(
                packed[0], packed[1], packed[2], wrap_u, wrap_v
            )
            if rows_native is not None:
                blobs.append(rows_native)
            else:
                xs = np.arange(w)
                x1 = _neighbor(xs, w, wrap_u)
                y1 = _neighbor(xs, w, wrap_v)
                row_quads = np.empty((w, w, ROW_U32), np.uint32)
                for t, lvl in enumerate(packed):
                    row_quads[:, :, 4 * t + 0] = lvl
                    row_quads[:, :, 4 * t + 1] = lvl[:, x1]
                    row_quads[:, :, 4 * t + 2] = lvl[y1, :]
                    row_quads[:, :, 4 * t + 3] = lvl[y1][:, x1]
                blobs.append(row_quads.reshape(-1, ROW_U32))
            row_cursor += w * w

    rows = np.concatenate(blobs) if blobs else np.zeros((1, ROW_U32), np.uint32)
    # pool row indices ride f32 shade-table columns; past 2^24 they stop
    # being exact and texel addressing silently corrupts
    if rows.shape[0] >= 1 << 24:
        raise ValueError(
            f"material pool has {rows.shape[0]} quad rows (>= 2^24); texel "
            "addresses would lose f32 exactness — reduce texture sizes"
        )
    return MaterialPool(
        quads=jnp.asarray(rows),
        base_row=base_row,
        width0=width0,
        num_levels=num_levels,
        wrap=wrap,
        filters=filters,
    )

"""Render/engine configuration.

The reference has no runtime config system; configuration is compile-time
constants, CMake defines, and device-capability auto-probes (SURVEY.md §5.6;
reference: src/engine/engine.cppm:40,157-199). The TPU-native analogue is a
small frozen dataclass whose "static" fields feed jit specialization — the
direct analogue of the reference's shader specialization constant for light
count (src/engine/graphics_pipeline.cppm:148-155) — plus auto-probe helpers
that pick tile sizes from VMEM budget and MSAA from a supported set.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# Frames in flight; the reference pipelines 2 frames via fences/semaphores
# (src/engine/engine.cppm:40). Here it bounds how many frame_step results may
# be un-awaited before we block (XLA async dispatch provides the overlap).
MAX_RENDER_FRAMES = 2

_SUPPORTED_MSAA = (8, 4, 2, 1)


def select_msaa_samples(requested: int) -> int:
    """Pick the highest supported MSAA count <= requested.

    Mirrors the reference's "max supported of {8,4,2} else 1" probe
    (src/engine/engine.cppm:157-171); our software rasterizer supports all of
    them, so this clamps/validates the request.
    """
    for samples in _SUPPORTED_MSAA:
        if requested >= samples:
            return samples
    return 1


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration; a change triggers (cached) recompilation."""

    width: int = 1920
    height: int = 1080
    msaa_samples: int = 4

    # Tile dimensions for the binned rasterizer, (height, width) in pixels.
    # None auto-probes per backend (the reference's device-capability-driven
    # auto-config spirit, SURVEY.md §5.6): (64, 128) for the Pallas kernel
    # (swept on v5e at 1080p: 10% faster than (32, 128) — fewer redundant
    # chunk visits; exactness vs the over-coverage reference verified on
    # hardware for th 16/32/64), (32, 128) for the XLA tiled backend (whose
    # per-tile bin capacities scale with tile area).
    tile_shape: Optional[Tuple[int, int]] = None
    # Max triangles binned per tile; overflow is skipped with a logged error,
    # following the reference's skip-and-log ethos (SURVEY.md §5.3).
    bin_capacity: int = 4096
    # Max tiles a triangle may cover before it falls to the shared
    # large-triangle list, and that list's capacity (ops.binning).
    k_pairs: int = 8
    large_capacity: int = 256
    # Triangles processed per rasterizer inner step (VPU batching factor).
    raster_chunk: int = 32
    # Tiles rasterized together per grid step of the tiled path.
    tile_batch: int = 8
    # Triangles per streamed chunk in the Pallas kernel (multiple of 128).
    pallas_chunk: int = 256
    # Sample rows rasterized per triangle window step in the Pallas kernel
    # (pow2 >= 8; None = the kernel default, ops.raster_pallas.WINDOW_ROWS).
    # Smaller windows waste less VPU work on short triangles but visit more
    # windows per tall one — sweepable per scene/tile shape.
    raster_window_rows: Optional[int] = None
    # Triangles per bbox group inside the Pallas raster kernel (pow2 dividing
    # pallas_chunk). The group bbox gates one window loop over all group
    # members; smaller groups waste fewer vector evals on triangles whose
    # bboxes miss the window, at the cost of more group tests. Same-process
    # A/B at 1080p Sponza 4xMSAA (tools/raster_group_ab.py, bit-identical
    # output): GS=16 32.5 ms, GS=8 27.6 ms, GS=4 28.0 ms.
    raster_group_size: int = 8
    # Lane interleave m of the raster kernel's window footprint (pow2 in
    # 1..16; None = auto). One vector register covers 8m sample rows x
    # 128/m px columns, so m > 1 matches the footprint to small-triangle
    # bboxes (Sponza median bbox is 5x5 px; m=1's 128-px-wide windows waste
    # most lanes on them — ops.raster_pallas._raster_kernel docstring,
    # tools/raster_patch_sim.py). Output is identical for every m.
    raster_interleave: Optional[int] = None
    # Column-supertile raster (ops.raster_pallas kernel docstring): one
    # kernel program per tile COLUMN so chunk hit lists / DMAs / per-group
    # scalar hoists amortize over the column's tiles instead of replaying
    # per tile. None = auto (on, subject to the kernel's VMEM accumulator
    # cap); output is bit-identical either way.
    raster_columns: Optional[bool] = None
    # Force Pallas interpreter mode (None = auto: interpret off-TPU).
    pallas_interpret: Optional[bool] = None
    # Samples shaded per chunk (bounds the lane-padded gather
    # intermediates). Swept on v5e at 1080p: 2^19 and 2^20 equal within
    # noise, 2^21+ collapses 3x (intermediates overflow VMEM into spills).
    shade_chunk: int = 1 << 19
    # Fragment shading rate (pallas backend): "pixel" shades once per pixel
    # at the center and resolves by coverage fraction — Vulkan's actual
    # non-sampleShading behavior (and 4x cheaper at 4x MSAA); "sample"
    # supersamples every MSAA sample (matches the numpy reference exactly).
    shading_rate: str = "pixel"
    # Empty-chunk skipping in the deferred shade: None = auto (on for scenes
    # under 32k triangles, off at Sponza scale where lax.cond collapses the
    # cross-chunk gather pipelining — both measured); True/False forces it,
    # e.g. off for a small scene that densely covers the screen (fullscreen
    # quad / skybox), where the conds cost ~4.5x (ADVICE r1).
    shade_skip_mode: Optional[bool] = None
    # Sampler anisotropy (pallas backend + numpy oracle), as single-tap LOD
    # sharpening: mips select by the minor footprint axis, ratio clamped to
    # this value. 1.0 = isotropic (off). Default ON at 16x — the reference
    # enables sampler anisotropy up to the device max whenever the device
    # supports it (model.cppm:261-275), and 16 is the universal device max.
    max_anisotropy: float = 16.0
    # TRUE multi-tap anisotropic filtering (1 = the single-tap LOD
    # sharpening above; 2/4/8 = N taps along the major footprint axis with
    # their own pool gathers, averaged before the BRDF — the reference
    # sampler's anisotropy, model.cppm:261-275). KERNEL-NATIVE on the
    # production fused-pool two-phase path (one fused gather per tap;
    # measured +15%/tap at sponza 1080p: 40.7 -> 46.7 ms at 2 taps,
    # tools/frame_ab.py); mixed-sampler/mirror-wrap scenes take the XLA
    # multi-tap form. An opt-in fidelity knob; the numpy oracle implements
    # the same kernel, golden-pinned (tests/test_textures.py).
    aniso_taps: int = 1

    # Split-stage prepare emits the PACKED component-major stream (flat
    # triangle setup -> pack_tri_rows: dense (C, T) rows, no lane-padded
    # (T,3,3) intermediates, absorbs the raster program's pack step).
    # None = auto (on). False keeps the legacy dict prepare — the A/B
    # instrument: python tools/prepare_flat_ab.py. Outputs are
    # bit-identical (pinned by tests/test_pallas_pipeline.py).
    prepare_packed: Optional[bool] = None

    # Packed-prepare implementation: "kernel" = the ONE-pass Mosaic setup
    # kernel (ops/setup_kernel.py — whole per-triangle stage in VMEM, one
    # launch); "xla" = the flat XLA pipeline (~27 fusions). Plane constants
    # may differ between the two by FMA-contraction ULPs, so the sharded
    # path follows the same knob (bit-equality is within-impl). None =
    # auto; A/B instrument: tools/prepare_kernel_ab.py.
    prepare_impl: Optional[str] = None

    # Pre-permuted raster stream (split-stage pallas path): rasterize from
    # stream rows the setup kernel emits ALREADY in Morton order (a second
    # setup-kernel pass over perm-gathered inputs, cached across frames and
    # refreshed with the stream permutation), instead of permuting the
    # packed rows inside the raster program every frame. The in-raster
    # permute is a 28-row LANE-dim gather that measured ~18.5 ms/frame at
    # 262k triangles — ~97% of the raster program's XLA prologue
    # (tools/raster_prologue_probe.py; the round-5 skeleton probes folded
    # it into "init_only", which tools/copyout_layout_probe.py showed was
    # a misattribution). Per-lane setup math is position-independent (the
    # sharded micro-shard argument), so frames are bit-identical either
    # way. None = auto: on when the packed kernel prepare + cached scene
    # state are in effect. A/B: tools/frame_ab.py raster_prestream=0/1.
    raster_prestream: Optional[bool] = None

    # Depth-peel layer count override (pallas backend). None = auto: the
    # scene-derived estimate (1 + translucent instances, clamped to the
    # kernel's 8-layer cap — scene/flatten.PEEL_LAYERS_MAX). An explicit
    # 1..8 forces K, e.g. for the raster cost ladder A/B or for stacked
    # translucent geometry inside ONE instance, which the per-instance
    # estimate cannot see (flatten._estimate_peel_layers docstring).
    # All-opaque scenes estimate K=1 and pay nothing.
    peel_layers: Optional[int] = None

    # Deferred-shade implementation: "kernel" = XLA row gathers feeding ONE
    # Pallas kernel (ops.shade_kernel; measured 75 -> 48 ms at Sponza-scale
    # 2^21 samples — the XLA form rematerializes (N,128) intermediates in
    # HBM at every fusion boundary, the kernel keeps them in VMEM); "xla" =
    # the pure-XLA fused chunk map. None = auto: "kernel", except
    # mixed-sampler scenes (per-slot pool gathers) which use "xla".
    shade_impl: Optional[str] = None

    # Single-layer scenes only (kernel shade_impl): run the composite,
    # MSAA-coverage resolve, sRGB encode, and u8 quantization INSIDE the
    # fragment kernel (ops.shade_kernel._shade_resolve_kernel) instead of
    # as an XLA tail — the tail costs ~1.5 ms of HBM passes over (4, n_px)
    # f32 intermediates and the kernel output shrinks f32 RGBA -> packed
    # i32 bytes. False = keep the host-side tail (A/B: tools/frame_ab.py
    # shade_resolve_fuse=1 vs =0).
    shade_resolve_fuse: bool = True

    # Two-program deferred shade (split-stage kernel path): ship per-pixel
    # INTERPOLATED fragment attrs across the phase boundary instead of raw
    # transposed table columns (ops.shade_kernel.shade_attrs_chunk). Phase A
    # evaluates planes/addressing once per pixel; the boundary halves
    # (256 B/px u16 columns -> 128 B/px f32 attrs) and the phase-B fragment
    # kernel drops all plane math. MEASURED AND REJECTED as the default
    # (frame_ab 1080p Sponza: 49.7-50.0 vs 45.5 ms — phase A's ~30 extra
    # per-pixel output rows cost more XLA fusion-boundary HBM passes over
    # the (2*ROW, N) gather result than the slimmer boundary saves), and on
    # REAL hardware the frames differ by 1 u8 step at scattered pixels
    # (Mosaic contracts the plane FMAs differently than XLA; interpret mode
    # is bit-equal — tests/test_pallas_pipeline.py pins that semantic
    # equivalence). None = auto (off). Kept so the A/B stays runnable:
    # python tools/frame_ab.py shade_attrs_boundary=0 shade_attrs_boundary=1
    shade_attrs_boundary: Optional[bool] = None

    # Pair-coherent shade-table gather (phase A): gather only even-position
    # rows and reconstruct odd positions structurally (left/right-neighbor
    # selects + a capped residual fix-up) — bit-identical on ANY input via
    # a cond fallback, ~56% of the gather indices on coherent streams.
    # MEASURED NEGATIVE on the chip (tools/pair_gather_probe.py: candidate
    # 31-36 ms vs the 6.8 ms gather it replaces — the selects/interleave
    # dominate; even the bare half gather is slower than the full one).
    # None = auto (off); kept runnable as the record of the dead end
    # (ops/shade_kernel.pair_gather_rowsT docstring).
    shade_pair_gather: Optional[bool] = None

    # Phase-B deferred shade (kernel impl): feed the two gathered texel-pool
    # tensors to the fragment kernel ROW-MAJOR (the gather's natural layout)
    # and transpose per block in VMEM, instead of XLA materializing an HBM
    # relayout copy per tensor (measured 1.76 ms each at 1080p volumes,
    # tools/relayout_ab.py; the in-kernel u16 transpose wins end-to-end by
    # ~0.8 ms/tensor, tools/inkernel_transpose_ab.py). Output is
    # bit-identical either way. None = auto (decided by frame-level A/B,
    # tools/frame_ab.py shade_pool_rowmajor=0 vs =1).
    shade_pool_rowmajor: Optional[bool] = None

    # Deferred shade (kernel impl): sample BOTH trilinear mip levels from
    # ONE fused-mip pool row per pixel (slot A = level l 3x3, slot B =
    # level l+1 3x3 — ops/texture_pack.py) instead of one row gather per
    # level. Bit-identical to the two-gather form for REPEAT/CLAMP wrap
    # with identical per-slot samplers; pipelines gate it off automatically
    # for mirror-wrap or mixed-sampler scenes (SceneMeta.mirror_wrap /
    # .mixed_samplers) and under the attrs boundary. None = auto (on).
    # A/B: python tools/frame_ab.py shade_fused_pool=0 shade_fused_pool=1
    shade_fused_pool: Optional[bool] = None

    # Clear values (reference: engine.cppm:520 clears black, depth 1.0).
    clear_color: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)
    clear_depth: float = 1.0

    # Present encoding: what leaves the device per frame (ops/present.py).
    # "rgb" (default) = the exact planar (3, H, W) uint8 frame — the
    # reference's lossless present. "yuv420" = device-side BT.601 4:2:0
    # encode packed into one flat uint8 array (1.5 B/px, half the present
    # traffic; luma exact, chroma 2x2-subsampled) — for link-bound remote
    # viewing; the engine decodes on host before the window sinks.
    present_format: str = "rgb"
    # Preview present stream: device-side box downsample of the presented
    # frame by this factor (1 = full resolution). At scale 2 the present
    # traffic drops 4x (8x combined with yuv420) — for link-bound remote
    # viewing where the device->host transfer, not the render, limits the
    # interactive rate (BENCH_r03 present_fps 6.3 vs render 24.2). The
    # RENDER itself stays full-resolution: exact stills remain available
    # via Scene.render_still() (test-pinned bit-exact), and the host
    # upsamples the preview for display (ops/present.py).
    present_scale: int = 1

    # Compute dtypes. Geometry stays f32 (raster precision); shading math f32;
    # texture storage uint8 in HBM, converted post-gather.
    geom_dtype: jnp.dtype = jnp.float32
    shade_dtype: jnp.dtype = jnp.float32

    # Raster backend: "auto" picks "pallas" (hand-written TPU kernels) on
    # TPU and "tiled" (binned XLA) elsewhere; "dense" is the every-triangle
    # -vs-every-sample semantic reference. "xla" is an alias for "dense".
    backend: str = "auto"

    # Split the pallas frame into per-stage jit programs (prepare / raster /
    # shade-table / shade+resolve) instead of one fused program. XLA compile
    # time is superlinear in program size — the fused 1080p frame cost 314 s
    # cold on the driver bench (BENCH_r01) where the stages compile in a
    # fraction of that, a source edit only recompiles the stage it touched,
    # and the split enables cross-frame caching of the Morton stream sort.
    split_stages: bool = True
    # Relative view-projection change (Frobenius) above which the cached
    # Morton stream permutation is recomputed (split-stage path). The sort
    # affects only raster locality, never output, so staleness is exact;
    # 0 re-sorts every frame.
    resort_threshold: float = 0.03
    # Cache the CAMERA-INDEPENDENT half of prepare (node transform
    # propagation, world lights, the (T,16) instance-matrix row gather,
    # world AABBs) across frames in the split-stage program, recomputed
    # only when the scene pytree changes identity (jax arrays are
    # immutable, so same-object means same values — the analogue of the
    # reference recomputing Scene::Update only for dirty transforms).
    # None = auto (on for the split-stage pallas program). A/B:
    # python tools/frame_ab.py prepare_scene_cache=0 prepare_scene_cache=1
    prepare_scene_cache: Optional[bool] = None

    # Number of devices to shard framebuffer tiles across (1 = single chip).
    num_devices: int = 1

    def __post_init__(self) -> None:
        if self.msaa_samples not in _SUPPORTED_MSAA:
            raise ValueError(f"msaa_samples must be one of {_SUPPORTED_MSAA}, got {self.msaa_samples}")
        if self.width <= 0 or self.height <= 0:
            raise ValueError("render target must be non-empty")
        if self.backend not in ("auto", "tiled", "dense", "xla", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.shading_rate not in ("pixel", "sample"):
            raise ValueError(f"unknown shading_rate {self.shading_rate!r}")
        if self.shade_impl not in (None, "kernel", "xla"):
            raise ValueError(f"unknown shade_impl {self.shade_impl!r}")
        if self.aniso_taps not in (1, 2, 4, 8):
            raise ValueError(
                f"aniso_taps must be 1, 2, 4 or 8, got {self.aniso_taps}"
            )
        if self.prepare_impl not in (None, "kernel", "xla"):
            raise ValueError(f"unknown prepare_impl {self.prepare_impl!r}")
        if self.peel_layers is not None and not 1 <= self.peel_layers <= 8:
            raise ValueError(
                f"peel_layers must be None or 1..8, got {self.peel_layers}"
            )
        if self.present_format not in ("rgb", "yuv420"):
            raise ValueError(f"unknown present_format {self.present_format!r}")
        if self.present_scale not in (1, 2, 4):
            raise ValueError(
                f"present_scale must be 1, 2 or 4, got {self.present_scale}"
            )
        if self.width % self.present_scale or self.height % self.present_scale:
            raise ValueError(
                "present_scale must divide the frame dimensions, got "
                f"{self.width}x{self.height} / {self.present_scale}"
            )
        if self.present_format == "yuv420" and (
            (self.width // self.present_scale) % 2
            or (self.height // self.present_scale) % 2
        ):
            raise ValueError("yuv420 present requires even (preview) "
                             "width and height")
        if self.tile_shape is None:
            shape = (64, 128) if self.resolved_backend() == "pallas" else (32, 128)
            object.__setattr__(self, "tile_shape", shape)

    def resolved_interleave(self) -> int:
        """Resolve the raster lane interleave (None = auto-pick).

        Auto picks m=2 for the pallas backend when the tile geometry allows
        (128-px tiles, window divides the per-strip rows): measured on v5e
        at 1080p Sponza 4xMSAA over 6 interleaved reps
        (tools/raster_interleave_ab2.py): m=2/win=32 median 24.9 ms vs
        m=1's 26.4 ms (visible-region bit-identical). m=4 tied m=2 within
        noise; m=8 and small windows measured worse (the kernel is
        per-visit-overhead-bound, not vector-eval-bound — the 2.3x
        vreg-eval reduction of tools/raster_patch_sim.py's 16x16 patches
        bought only ~6%, a recorded model-vs-hardware discrepancy).
        """
        if self.raster_interleave is not None:
            return self.raster_interleave
        if self.resolved_backend() != "pallas":
            return 1
        th, tw = self.tile_shape
        rows = th * self.msaa_samples
        win = self.raster_window_rows or 32
        if tw == 128 and rows % 2 == 0 and (rows // 2) % min(win, rows // 2) == 0:
            return 2
        return 1

    def resolved_prepare_impl(self) -> str:
        """Resolve prepare_impl (None = auto: "kernel").

        On-chip A/B (tools/prepare_kernel_ab.py, 3 interleaved reps):
        prepare 0.82-1.14 ms kernel vs 0.99-1.14 xla, whole frame
        36.96-37.14 vs 37.46-37.47 — kernel ahead every rep, frames
        bit-equal (maxdiff=0)."""
        if self.prepare_impl is not None:
            return self.prepare_impl
        return "kernel"

    def resolved_peel_layers(self, scene_layers: int) -> int:
        """Effective depth-peel K: the explicit override, else the scene's
        estimate (SceneMeta.peel_layers)."""
        return self.peel_layers if self.peel_layers is not None else scene_layers

    def resolved_attrs_boundary(self) -> bool:
        """Resolve shade_attrs_boundary (None = auto: off until the
        hardware A/B decides; tools/attrs_boundary_ab.py)."""
        if self.shade_attrs_boundary is not None:
            return self.shade_attrs_boundary
        return False

    def resolved_pair_gather(self) -> bool:
        """Resolve shade_pair_gather (None = auto: off until the chip A/B
        decides — tools/pair_gather_probe.py / frame_ab.py)."""
        if self.shade_pair_gather is not None:
            return self.shade_pair_gather
        return False

    def resolved_pool_rowmajor(self) -> bool:
        """Resolve shade_pool_rowmajor (None = auto).

        Auto is ON for the compiled kernel path: the whole-frame A/B at
        1080p Sponza 4xMSAA measured 47.4 vs 50.0 ms median (bit-identical
        frames, maxdiff=0; tools/frame_ab.py shade_pool_rowmajor=1 vs =0),
        and the saving scales with pixel count (the relayout copies it
        removes are per-sample tensors). OFF in interpret mode: the Pallas
        interpreter evaluates the per-block transpose without Mosaic's
        transpose unit, so CI/CPU golden runs keep the XLA relayout form
        (bit-equality of the two forms is pinned by
        tests/test_pallas_pipeline.py::test_shade_pool_rowmajor_bit_identical)."""
        if self.shade_pool_rowmajor is not None:
            return self.shade_pool_rowmajor
        interpret = self.pallas_interpret
        if interpret is None:
            import jax

            interpret = jax.devices()[0].platform != "tpu"
        return not interpret

    def resolved_fused_pool(self, *, mirror_wrap: bool = False,
                            mixed_samplers: bool = False) -> bool:
        """Resolve shade_fused_pool (None = auto: on) against the static
        scene properties that make the single-gather form inexact: mirror
        wrap (the l+1 footprint can escape the anchored slot-B window —
        ops/texture_pack.py docstring) and per-slot samplers (slots need
        their own rows). The explicit flag cannot force fused on for such
        scenes; it can force it OFF for A/B."""
        if mirror_wrap or mixed_samplers:
            return False
        if self.shade_fused_pool is not None:
            return self.shade_fused_pool
        return True

    def resolved_backend(self) -> str:
        """Resolve "auto" against the live device (the device-capability
        auto-probe spirit of the reference, SURVEY.md §5.6)."""
        if self.backend != "auto":
            return self.backend
        import jax

        return "pallas" if jax.devices()[0].platform == "tpu" else "tiled"

    # -- derived quantities --------------------------------------------------
    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_shape[0])

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_shape[1])

    @property
    def num_tiles(self) -> int:
        return self.tiles_y * self.tiles_x

    @property
    def padded_height(self) -> int:
        return self.tiles_y * self.tile_shape[0]

    @property
    def padded_width(self) -> int:
        return self.tiles_x * self.tile_shape[1]

    def replace(self, **kwargs) -> "RenderConfig":
        return dataclasses.replace(self, **kwargs)

"""ctypes bindings for the native runtime (native/vktf_native.cpp).

The reference keeps its host-side asset hot loops in native code (cgltf
unpack, libktx decode — SURVEY.md §2); this module is the equivalent here.
The shared library is built on demand with the repo Makefile (g++, links
libz/libzstd); every entry point has a numpy fallback at its call site, so
the package works without a compiler (set VKTF_NATIVE=0 to force fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvktf_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    src = _NATIVE_DIR / "vktf_native.cpp"
    if not src.exists():
        return False
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("VKTF_NATIVE", "1") == "0":
        return None
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.vktf_mip_chain_texels.restype = ctypes.c_int64
    lib.vktf_mip_chain_texels.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.vktf_generate_mips.restype = None
    lib.vktf_generate_mips.argtypes = [
        _u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p,
    ]
    lib.vktf_pack_blocks_level.restype = None
    lib.vktf_pack_blocks_level.argtypes = [
        _u32p, _u32p, _u32p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # next level | NULL
        ctypes.c_int32, _i32p, _u32p,
    ]
    lib.vktf_unpack_accessor.restype = ctypes.c_int32
    lib.vktf_unpack_accessor.argtypes = [
        _u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, _f32p,
    ]
    lib.vktf_inflate_zlib.restype = ctypes.c_int64
    lib.vktf_inflate_zlib.argtypes = [_u8p, ctypes.c_int64, _u8p, ctypes.c_int64]
    lib.vktf_decompress_zstd.restype = ctypes.c_int64
    lib.vktf_decompress_zstd.argtypes = [_u8p, ctypes.c_int64, _u8p, ctypes.c_int64]
    lib.vktf_decode_etc1s.restype = None
    lib.vktf_decode_etc1s.argtypes = [
        _i32p, _i32p, _i32p, _u8p, ctypes.c_int32, ctypes.c_int32, _u8p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def generate_mips(base: np.ndarray, srgb: bool) -> Optional[list[np.ndarray]]:
    """Native full mip chain; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    base = np.ascontiguousarray(base, np.uint8)
    h, w = int(base.shape[0]), int(base.shape[1])
    total = lib.vktf_mip_chain_texels(h, w)
    out = np.empty(total * 4, np.uint8)
    lib.vktf_generate_mips(base.reshape(-1), h, w, int(srgb), out)
    levels, offset = [], 0
    lh, lw = h, w
    while True:
        n = lh * lw * 4
        levels.append(out[offset:offset + n].reshape(lh, lw, 4))
        offset += n
        if lh == 1 and lw == 1:
            break
        lh, lw = max(lh // 2, 1), max(lw // 2, 1)
    return levels


def pack_blocks_level(packed, packed_next, wraps) -> Optional[np.ndarray]:
    """Native fused-mip block-pool rows (bw*bw, 64) for one pow2-square
    level; None if the library is unavailable (ops/texture_pack.py stride-2
    3x3+3x3 layout: slot A = level l, slot B = level l+1).

    packed: [base, mr, normal] level-l u32 arrays; packed_next: the
    level-(l+1) triple, or None for the last level (slot B stays zero).
    wraps: per-slot [(wrap_u, wrap_v)] x 3 — each texture bakes its own
    sampler's wrap mode into the out-of-range block texels."""
    lib = _load()
    if lib is None or not hasattr(lib, "vktf_pack_blocks_level"):
        return None
    w = int(packed[0].shape[0])
    bw = max(w >> 1, 1)
    out = np.zeros((bw * bw, 64), np.uint32)
    wrap_arr = np.ascontiguousarray(np.asarray(wraps, np.int32).reshape(6))
    cur = [np.ascontiguousarray(p.reshape(-1), np.uint32) for p in packed]
    if packed_next is None:
        nxt_ptrs = [None, None, None]
        nxt_keepalive = []
    else:
        nxt_keepalive = [
            np.ascontiguousarray(p.reshape(-1), np.uint32)
            for p in packed_next
        ]
        nxt_ptrs = [p.ctypes.data_as(ctypes.c_void_p) for p in nxt_keepalive]
    lib.vktf_pack_blocks_level(
        cur[0], cur[1], cur[2],
        nxt_ptrs[0], nxt_ptrs[1], nxt_ptrs[2],
        w, wrap_arr, out.reshape(-1),
    )
    del nxt_keepalive
    return out


def unpack_accessor(raw: bytes, count: int, comps: int, comp_type: int,
                    normalized: bool, stride: int) -> Optional[np.ndarray]:
    """Native strided accessor unpack -> (count, comps) f32; None if n/a."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(raw, np.uint8)
    dst = np.empty(count * comps, np.float32)
    rc = lib.vktf_unpack_accessor(src, count, comps, comp_type,
                                  int(normalized), stride, dst)
    if rc != 0:
        return None
    return dst.reshape(count, comps)


def decode_etc1s(endpoint_ids: np.ndarray, selector_ids: np.ndarray,
                 endpoints: np.ndarray, selectors: np.ndarray,
                 width: int, height: int) -> Optional[np.ndarray]:
    """Native ETC1S block expansion -> (H, W, 4) RGBA8; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    bh, bw = endpoint_ids.shape
    out = np.empty((bh * 4, bw * 4, 4), np.uint8)
    lib.vktf_decode_etc1s(
        np.ascontiguousarray(endpoint_ids.reshape(-1), np.int32),
        np.ascontiguousarray(selector_ids.reshape(-1), np.int32),
        np.ascontiguousarray(endpoints.reshape(-1), np.int32),
        np.ascontiguousarray(selectors.reshape(-1), np.uint8),
        bh, bw, out.reshape(-1),
    )
    return out[:height, :width]


def inflate_zlib(data: bytes, out_len: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(out_len, np.uint8)
    n = lib.vktf_inflate_zlib(src, len(data), dst, out_len)
    return dst[:n].tobytes() if n >= 0 else None


def decompress_zstd(data: bytes, out_len: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(out_len, np.uint8)
    n = lib.vktf_decompress_zstd(src, len(data), dst, out_len)
    return dst[:n].tobytes() if n >= 0 else None

"""ctypes bindings for the native host library (libhostio.so).

Loads the C++ host kernels (XXH64 row hashing, minimizer sketch, encoding)
when the shared library is present — building it on first use if a compiler
is available — and exposes ``None`` handles otherwise so callers fall back
to the numpy implementations. Disable entirely with PHYLIGN_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger("phylign_tpu.native")

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libhostio.so"
_lib: ctypes.CDLL | None = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_HERE)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError) as e:
        log.debug("native build failed: %s", e)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("PHYLIGN_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.xxh64.restype = ctypes.c_uint64
    lib.xxh64.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]

    lib.encode_seq.restype = None
    lib.encode_seq.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]

    lib.cobs_row_indices.restype = ctypes.c_int64
    lib.cobs_row_indices.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_uint64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]

    lib.minimizers.restype = ctypes.c_int64
    lib.minimizers.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_cobs_row_indices(
    codes: np.ndarray, k: int, signature_size: int, num_hashes: int
) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    n_pos = max(0, codes.shape[0] - k + 1)
    out = np.empty((n_pos, num_hashes), np.int64)
    if n_pos:
        lib.cobs_row_indices(
            _u8ptr(codes),
            codes.shape[0],
            k,
            signature_size,
            num_hashes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    return out


def native_minimizers(
    codes: np.ndarray, k: int, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    n = max(0, codes.shape[0] - k + 1)
    hashes = np.empty(n, np.uint64)
    pos = np.empty(n, np.int32)
    strand = np.empty(n, np.uint8)
    cnt = 0
    if n:
        cnt = lib.minimizers(
            _u8ptr(codes),
            codes.shape[0],
            k,
            w,
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _u8ptr(strand),
        )
    return hashes[:cnt], pos[:cnt], strand[:cnt]


def native_xxh64(data: bytes, seed: int = 0) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.xxh64(data, len(data), seed))

"""Native (C++) runtime components, loaded via ctypes.

Provides crc32c, TFRecord framing, and Levenshtein distance from
``libavsr_native.so`` (built from avsr_native.cc).  The library is built
on first import if the compiler is available; every consumer has a pure
Python/NumPy fallback, so absence of a toolchain degrades performance, not
capability.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libavsr_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.avsr_crc32c.restype = ctypes.c_uint32
    lib.avsr_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.avsr_masked_crc32c.restype = ctypes.c_uint32
    lib.avsr_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.avsr_tfrecord_index.restype = ctypes.c_int64
    lib.avsr_tfrecord_index.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64, ctypes.c_int,
    ]
    lib.avsr_tfrecord_frame.restype = ctypes.c_uint64
    lib.avsr_tfrecord_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p
    ]
    lib.avsr_levenshtein.restype = ctypes.c_int64
    lib.avsr_levenshtein.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# crc32c
# ---------------------------------------------------------------------------


def crc32c(data: bytes) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    return int(lib.avsr_crc32c(data, len(data)))


def masked_crc32c(data: bytes) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    return int(lib.avsr_masked_crc32c(data, len(data)))


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------


def tfrecord_index(buf: bytes, verify: bool = True) -> List[Tuple[int, int]]:
    """Return [(data_offset, data_length)] for all records in the buffer."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    # Hard bound: every record is >= 16 bytes of framing.  Start small and
    # grow on the C side's -4 (capacity) code — sizing the index at the
    # hard bound up front would allocate ~len(buf) bytes of index arrays
    # (doubling peak RSS on multi-GB files) for typically a few thousand
    # records.
    hard = max(len(buf) // 16, 1)
    cap = min(65536, hard)
    while True:
        offsets = (ctypes.c_uint64 * cap)()
        lengths = (ctypes.c_uint64 * cap)()
        n = lib.avsr_tfrecord_index(
            buf, len(buf), offsets, lengths, cap, int(verify)
        )
        if n == -4:
            if cap >= hard:
                # count can never exceed size/16: bytes remain after the
                # last whole record — same condition the pure-Python
                # fallback rejects.
                raise ValueError(
                    "corrupt TFRecord stream (trailing bytes after the "
                    "last record)"
                )
            cap = min(cap * 4, hard)
            continue
        if n < 0:
            raise ValueError(f"corrupt TFRecord stream (code {n})")
        return [(int(offsets[i]), int(lengths[i])) for i in range(n)]


def tfrecord_frame(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.create_string_buffer(len(data) + 16)
    n = lib.avsr_tfrecord_frame(data, len(data), out)
    return out.raw[:n]


# ---------------------------------------------------------------------------
# edit distance
# ---------------------------------------------------------------------------


class editdist:  # namespace-style accessor used by eval/metrics.py
    @staticmethod
    def distance(a: List[int], b: List[int]) -> int:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        # ascontiguousarray, not asarray: the C kernel reads stride-1; a
        # non-contiguous int32 view would pass its base pointer and score
        # the wrong elements.
        aa = np.ascontiguousarray(a, np.int32)
        bb = np.ascontiguousarray(b, np.int32)
        return int(
            lib.avsr_levenshtein(
                aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
                bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb),
            )
        )


if not available():  # degrade gracefully at import time
    editdist = None  # type: ignore  # noqa: F811

"""ctypes bindings for the native host runtime (native/umgap_native.cpp).

Provides drop-in accelerated versions of the host hot loops: FASTQ/FASTA
parsing into padded device-ready batches and TSV -> packed-k-mer
splitting for index builds. Falls back to the pure-Python paths when the
shared library is missing; ``ensure_built()`` compiles it with make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libumgap_native.so")

_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Build the shared library if needed. Returns availability."""
    global _lib
    if _lib is not None:
        return True
    try:
        # make is a no-op when the .so is fresh; rebuilds stale ones
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return False
    for name in ("umgap_parse_fastq", "umgap_parse_fasta"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_long
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
        ]
    lib.umgap_split_kmers.restype = ctypes.c_long
    lib.umgap_split_kmers.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long,
    ]
    if hasattr(lib, "umgap_join_kmers"):
        lib.umgap_join_kmers.restype = ctypes.c_longlong
        lib.umgap_join_kmers.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_longlong, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int32),
        ]
    _lib = lib
    return True


def join_kmers_native(keys: np.ndarray, snapped: np.ndarray,
                      parent: np.ndarray, ranksnap: np.ndarray,
                      factor: float = 0.95,
                      n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Native grouped joinkmers aggregation over sorted rows.

    Args:
      keys: (N,) uint64 sorted packed k-mers (duplicates = one group).
      snapped: (N,) int64 valid-ancestor-snapped taxids (< 0 = dropped).
      parent: (T,) int32 parent vector; ranksnap: (T,) int32 ranked snap.

    Returns (out_keys uint64, out_vals int32), one entry per surviving
    group, in key order.
    """
    if not available() or not hasattr(_lib, "umgap_join_kmers"):
        raise RuntimeError("native join_kmers unavailable")
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    snapped = np.ascontiguousarray(snapped, dtype=np.int64)
    parent = np.ascontiguousarray(parent, dtype=np.int32)
    ranksnap = np.ascontiguousarray(ranksnap, dtype=np.int32)
    out_keys = np.zeros(len(keys), dtype=np.uint64)
    out_vals = np.zeros(len(keys), dtype=np.int32)
    n = _lib.umgap_join_kmers(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        snapped.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(keys),
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ranksnap.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(parent), ctypes.c_float(factor), n_threads,
        out_keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_keys[:n], out_vals[:n]


def available() -> bool:
    return _lib is not None or ensure_built()


def _parse(fn_name: str, data: bytes, max_len: int, cap_reads: int):
    fn = getattr(_lib, fn_name)
    codes = np.full((cap_reads, max_len), 4, dtype=np.uint8)  # N
    lens = np.zeros(cap_reads, dtype=np.int32)
    hs = np.zeros(cap_reads, dtype=np.int64)
    he = np.zeros(cap_reads, dtype=np.int64)
    n = fn(
        data, len(data),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_len,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        he.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        cap_reads,
    )
    if n < 0:
        raise ValueError(f"malformed input for {fn_name}")
    headers = [data[hs[i]:he[i]].decode() for i in range(n)]
    return headers, codes[:n], lens[:n]


def parse_fastq_file(path: str, max_len: int = 160,
                     cap_hint: int = 1 << 16):
    """Whole-file FASTQ parse -> (headers, (N, max_len) DNA codes, lengths)."""
    if not available():
        raise RuntimeError("native library unavailable")
    with open(path, "rb") as f:
        data = f.read()
    cap = max(cap_hint, 16)
    while True:
        headers, codes, lens = _parse("umgap_parse_fastq", data, max_len, cap)
        if len(headers) < cap:
            return headers, codes, lens
        cap *= 4


def parse_fasta_file(path: str, max_len: int = 160,
                     cap_hint: int = 1 << 16):
    if not available():
        raise RuntimeError("native library unavailable")
    with open(path, "rb") as f:
        data = f.read()
    cap = max(cap_hint, 16)
    while True:
        headers, codes, lens = _parse("umgap_parse_fasta", data, max_len, cap)
        if len(headers) < cap:
            return headers, codes, lens
        cap *= 4


def split_kmers_tsv(data: bytes, k: int = 9,
                    cap_hint: int = 1 << 20) -> Tuple[np.ndarray, np.ndarray]:
    """(taxid TAB protein) TSV -> (packed uint64 kmers, int32 taxids)."""
    if not available():
        raise RuntimeError("native library unavailable")
    cap = max(cap_hint, 16)
    while True:
        packed = np.zeros(cap, dtype=np.uint64)
        tids = np.zeros(cap, dtype=np.int32)
        n = _lib.umgap_split_kmers(
            data, len(data), k,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            tids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        if n <= cap:
            return packed[:n], tids[:n]
        cap = int(n * 1.1) + 16

"""ctypes binding to the native batch FASTA/FASTQ reader (native/
fastx_reader.cpp -> libntpu_io.so).

The native reader fills flat batch buffers (one concatenated sequence
byte array + offset arrays per batch), so the Python side materializes
numpy views without per-line Python work — the same reason the reference
keeps its readers native (kseq / btllib::SeqReader, SURVEY.md §2.2).

Falls back silently when the library is not built; ``read_fastx`` in
ntedit_tpu.io.fastx picks the native path automatically when available
(disable with NTEDIT_TPU_NATIVE_IO=0).
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SEQ_CAP = 1 << 24  # 16 MiB of sequence per batch
_HDR_CAP = 1 << 20
_MAX_REC = 1 << 15


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libntpu_io.so")
    return cand if os.path.exists(cand) else None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NTEDIT_TPU_NATIVE_IO", "1") == "0":
        return None
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ntpu_fastx_open.restype = ctypes.c_void_p
        lib.ntpu_fastx_open.argtypes = [ctypes.c_char_p]
        lib.ntpu_fastx_close.argtypes = [ctypes.c_void_p]
        lib.ntpu_fastx_next.restype = ctypes.c_long
        lib.ntpu_fastx_next.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.c_long,
        ]
        if hasattr(lib, "ntpu_encode_2bit"):
            lib.ntpu_encode_2bit.restype = ctypes.c_long
            lib.ntpu_encode_2bit.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def encode_2bit(seq: np.ndarray, need: int):
    """Single-pass native 2-bit encode (ntpu_encode_2bit): ASCII [L] ->
    (packed uint32 [need/16], exception positions int64).  Returns None
    when the library is unavailable (callers fall back to numpy)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ntpu_encode_2bit"):
        return None
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    m = min(len(seq), need)
    packed = np.empty(need // 16, dtype=np.uint32)
    cap = 1024
    while True:
        exc = np.empty(cap, dtype=np.int64)
        n = lib.ntpu_encode_2bit(
            seq.ctypes.data_as(ctypes.c_void_p), m, need,
            packed.ctypes.data_as(ctypes.c_void_p),
            exc.ctypes.data_as(ctypes.c_void_p), cap,
        )
        if n <= cap:
            return packed, exc[:n].copy()
        cap = int(n)


def read_batches(path: str, want_headers: bool = True) -> Iterator[
        tuple[np.ndarray, np.ndarray, list, object]]:
    """Yield (seq_bytes, seq_offsets, headers, qual_bytes) batches.

    seq_bytes: uint8 [total]; record i = seq_bytes[offs[i]:offs[i+1]];
    headers: decoded header strings (after the '>'/'@' tag byte), or None
    when want_headers=False (bulk k-mer consumers skip the decode);
    qual_bytes: uint8 array with the same offsets (None for FASTA).
    """
    lib = get_lib()
    assert lib is not None
    h = lib.ntpu_fastx_open(path.encode())
    if not h:
        raise OSError(f"cannot open {path}")
    seq_cap, hdr_cap = _SEQ_CAP, _HDR_CAP
    try:
        while True:
            seq_buf = np.empty(seq_cap, dtype=np.uint8)
            qual_buf = np.empty(seq_cap, dtype=np.uint8)
            hdr_buf = np.empty(hdr_cap, dtype=np.uint8)
            seq_offs = np.empty(_MAX_REC + 1, dtype=np.int64)
            hdr_offs = np.empty(_MAX_REC + 1, dtype=np.int64)
            is_fastq = ctypes.c_int(0)
            n = lib.ntpu_fastx_next(
                h,
                seq_buf.ctypes.data_as(ctypes.c_void_p), seq_cap,
                seq_offs.ctypes.data_as(ctypes.c_void_p),
                hdr_buf.ctypes.data_as(ctypes.c_void_p), hdr_cap,
                hdr_offs.ctypes.data_as(ctypes.c_void_p),
                qual_buf.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(is_fastq),
                _MAX_REC,
            )
            if n == 0:
                return
            if n == -1:
                raise ValueError(f"{path}: malformed FASTA/FASTQ")
            if n == -2:
                seq_cap *= 4  # a single record outgrew the batch buffer
                hdr_cap *= 4
                continue
            hdrs = None
            if want_headers:
                hdrs = []
                hb = hdr_buf.tobytes()
                for i in range(n):
                    hdrs.append(hb[hdr_offs[i] : hdr_offs[i + 1]].decode())
            quals = qual_buf[: seq_offs[n]].copy() if is_fastq.value else None
            yield seq_buf[: seq_offs[n]].copy(), seq_offs[: n + 1].copy(), hdrs, quals
    finally:
        lib.ntpu_fastx_close(h)

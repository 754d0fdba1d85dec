"""ctypes bindings for the native sparse-repair engine
(native/repair.cpp — the C++ implementation of the oracle spec).

The native engine consumes TPU-computed gate hints and performs the exact
sequential scan-and-repair of ``Oracle.polish_contig`` at native speed;
its output is reconstructed into the same ``ContigResult`` (contig buffer
with substitutions/masks applied, RopeCells node stream for indels, SubRec
list) so the writers and every downstream consumer are unchanged.
Property-tested for bit-identical equality against the Python oracle in
tests/test_native_repair.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ntedit_tpu.core import bloom
from ntedit_tpu.engine.config import EngineConfig
from ntedit_tpu.engine.oracle import ContigResult, RopeCells, SubRec

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libntedit_repair.so")

_lib = None
_lib_error: Optional[str] = None


class _NtrFilter(ctypes.Structure):
    _fields_ = [
        ("kind", ctypes.c_int32),
        ("hash_num", ctypes.c_int32),
        ("data", ctypes.c_void_p),
        ("nbytes", ctypes.c_uint64),
    ]


class _NtrParams(ctypes.Structure):
    _fields_ = [
        ("k", ctypes.c_int32),
        ("jump", ctypes.c_int32),
        ("mode", ctypes.c_int32),
        ("max_insertions", ctypes.c_int32),
        ("max_deletions", ctypes.c_int32),
        ("min_threshold", ctypes.c_int32),
        ("max_threshold", ctypes.c_int32),
        ("insertion_cap", ctypes.c_int32),
        ("snv", ctypes.c_int32),
        ("mask", ctypes.c_int32),
        ("missing_needed", ctypes.c_double),
        ("present_needed", ctypes.c_double),
        ("present_needed_deletion", ctypes.c_double),
        ("rope_compat", ctypes.c_int32),
    ]


def _build_lib() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "libntedit_repair.so"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building on first use) the native repair library, or None."""
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "repair.cpp")
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        if not _build_lib():
            # a stale library must not silently stand in for the checked-in
            # source: treat a failed rebuild as unavailable
            _lib_error = "build failed"
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        _lib_error = str(exc)
        return None
    lib.ntr_polish_contig.restype = ctypes.c_int64
    lib.ntr_polish_contig.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,              # contig, L
        ctypes.c_void_p, ctypes.c_int64,              # gates, n_gates
        ctypes.POINTER(_NtrFilter), ctypes.POINTER(_NtrFilter),
        ctypes.POINTER(_NtrParams),
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _filter_desc(bf) -> Optional[tuple]:
    """Map a host filter object to its C descriptor.

    Returns (struct, backing array) or None for unknown layouts.  The
    backing array is a view of the live filter when it is already
    contiguous (the normal case; asserted below) — callers must keep it
    referenced across the native call."""
    if bf is None:
        return None
    host = getattr(bf, "bf", bf)  # unwrap BFLike
    if isinstance(host, bloom.BlockedKmerBloomFilter):
        arr = host.words
        kind = 1
    elif isinstance(host, bloom.KmerCountingBloomFilter8):
        arr = host.counters
        kind = 2
    elif isinstance(host, bloom.KmerBloomFilter):
        arr = host.data
        kind = 0
    else:
        return None
    assert arr.flags["C_CONTIGUOUS"], "host filter arrays are contiguous"
    return _NtrFilter(
        kind=kind, hash_num=host.hash_num,
        data=arr.ctypes.data_as(ctypes.c_void_p).value,
        nbytes=arr.nbytes,
    ), arr  # keep arr alive


def polish_contig_native(
    host_bloom,
    host_bloomrep,
    cfg: EngineConfig,
    header: str,
    seq: bytes | np.ndarray,
    gate_hint: Optional[np.ndarray] = None,
    initial_caps: Optional[tuple] = None,
) -> Optional[ContigResult]:
    """Run the native engine on one contig.  Returns None when the native
    library or the filter layout is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    bfd = _filter_desc(host_bloom)
    if bfd is None:
        return None
    bf_struct, bf_keep = bfd
    rep_struct = None
    rep_keep = None
    if host_bloomrep is not None:
        repd = _filter_desc(host_bloomrep)
        if repd is None:
            return None
        rep_struct, rep_keep = repd

    cfg = cfg.validate()
    params = _NtrParams(
        k=cfg.k, jump=cfg.jump, mode=cfg.mode,
        max_insertions=cfg.max_insertions, max_deletions=cfg.max_deletions,
        min_threshold=cfg.min_threshold, max_threshold=cfg.max_threshold,
        insertion_cap=cfg.insertion_cap,
        snv=int(cfg.snv), mask=int(cfg.mask),
        missing_needed=float(cfg.missing_needed),
        present_needed=float(cfg.present_needed),
        present_needed_deletion=float(cfg.present_needed_deletion),
        rope_compat=int(cfg.rope_compat),
    )

    seq_bytes = bytes(seq)
    L = len(seq_bytes)
    if gate_hint is not None:
        gates = np.ascontiguousarray(gate_hint, dtype=np.int64)
        gates_ptr = gates.ctypes.data_as(ctypes.c_void_p).value
        n_gates = gates.size
    else:
        gates, gates_ptr, n_gates = None, None, 0

    subs_cap = max(4096, L // 64)
    nodes_cap = max(4096, L // 64)
    if initial_caps is not None:  # capacity-retry test hook
        subs_cap, nodes_cap = initial_caps
    while True:
        # the engine applies substitutions/masks into the contig buffer in
        # place before a capacity retcode can surface — every retry must
        # start from the pristine input, not the partially-edited buffer
        contig = np.frombuffer(seq_bytes, dtype=np.uint8).copy()
        subs_buf = np.empty(subs_cap * 10, dtype=np.int64)
        nodes_buf = np.empty(nodes_cap * 4, dtype=np.int64)
        n_subs = ctypes.c_int64(0)
        n_nodes = ctypes.c_int64(0)
        rc = lib.ntr_polish_contig(
            contig.ctypes.data_as(ctypes.c_void_p).value, L,
            gates_ptr, n_gates,
            ctypes.byref(bf_struct),
            ctypes.byref(rep_struct) if rep_struct is not None else None,
            ctypes.byref(params),
            subs_buf.ctypes.data_as(ctypes.c_void_p).value, subs_cap,
            ctypes.byref(n_subs),
            nodes_buf.ctypes.data_as(ctypes.c_void_p).value, nodes_cap,
            ctypes.byref(n_nodes),
        )
        if rc == -2:
            subs_cap *= 4
            continue
        if rc == -3:
            nodes_cap *= 4
            continue
        if rc != 0:
            return None
        break
    del bf_keep, rep_keep, gates  # lifetimes held through the call

    # -- reconstruct ContigResult (oracle representation) --
    subs = []
    sb = subs_buf[: n_subs.value * 10].reshape(-1, 10)
    for row in sb:
        subs.append(SubRec(
            pos=int(row[0]), draft_char=int(row[1]), sub_base=int(row[2]),
            num_support=int(row[3]),
            altbase1=int(row[4]), altsupp1=int(row[5]),
            altbase2=int(row[6]), altsupp2=int(row[7]),
            altbase3=int(row[8]), altsupp3=int(row[9]),
        ))
    cells = RopeCells(0)
    nodes = []
    total = 0
    nb = nodes_buf[: n_nodes.value * 4].reshape(-1, 4)
    for kind, a, b, sup in nb:
        if kind == 0:
            nodes.append(["span", int(a), int(b), int(sup)])
            total += int(b) - int(a) + 1
        else:
            # ins cell [-1, char, ins_sup, span_sup]
            nodes.append(["ins", [-1, int(a), int(sup), int(b)]])
            total += 1
    cells.nodes = nodes
    cells._len = total
    cells._cum = None
    contig_ba = bytearray(contig.tobytes())
    return ContigResult(header, contig_ba, cells, subs)

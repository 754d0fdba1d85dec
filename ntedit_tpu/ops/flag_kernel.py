"""Pallas TPU kernel: fused dense-flag probe preparation.

One kernel pass replaces the XLA op-graph of the dense flag pass's
compute stage (ntedit_tpu.engine.flag.flag_chunk): for every window head
of a contig chunk it computes, entirely in VMEM,

  * the ntHash2 canonical window hash (arithmetic seed selects, doubling
    sliding-window XOR, split rotations — see ntedit_tpu.core.nthash),
  * the blocked-Bloom-filter probe coordinates: word index + 32-bit probe
    mask (bloom.BlockedKmerBloomFilter layout),
  * window validity (all bases accepted, isAcceptedBase semantics,
    /root/reference/ntedit.cpp:493-499).

The contig stays in HBM; each grid step DMAs its chunk (+k-1 halo) into a
VMEM scratch buffer, so no halo-duplicated tile array is materialized on
the host and no intermediate (seed terms, prefix levels, rotation counts)
ever touches HBM.  The Bloom probe itself — a data-dependent HBM gather —
stays outside the kernel: Mosaic has no arbitrary vector gather, and
XLA's native gather is the right tool for random single-word access
(measured ~94M probes/s on this chip).

The engine uses this kernel through flag_gates_pallas(); equivalence with
the XLA path is pinned by tests/test_flag_kernel.py, and bench parity is
tracked in the commit that introduced it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntedit_tpu.core import nthash as nt
from ntedit_tpu.engine import flag as _flag
from ntedit_tpu.utils import u64

DEFAULT_CHUNK = 8192  # small grid blocks: the fused body keeps ~30 live
# chunk-length u32 vectors, so VMEM bounds the block size


def _prep_body(seq, k: int, wbits: int, hash_num: int):
    """seq uint8 [C + k - 1] -> (widx int32 [C], mask uint32 [C],
    valid uint32 [C]).  Pure jnp on uint32 — runs inside the kernel."""
    n = seq.shape[0] - k + 1
    fh, rh = nt.window_hashes.__wrapped__(seq, k)  # unjitted body
    can = u64.min_(fh, rh)
    widx = (can[1] & np.uint32((1 << min(wbits, 32)) - 1)).astype(jnp.int32)
    mask = jnp.zeros_like(can[1])
    for j in range(hash_num):
        off = u64.shr(can, wbits + 5 * j)[1] & np.uint32(31)
        mask = mask | (jnp.uint32(1) << off)
    valid = _flag._window_all(_flag._accepted(seq), k, n)
    return widx, mask, valid.astype(jnp.uint32)


HALO_PAD = 1024  # HBM slice sizes must align to the uint8 tiling (1024)


def _make_kernel(chunk: int, k: int, wbits: int, hash_num: int):
    def kernel(seq_hbm, widx_ref, mask_ref, valid_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            seq_hbm.at[pl.ds(i * chunk, chunk + HALO_PAD)], scratch, sem
        )
        dma.start()
        dma.wait()
        widx, mask, valid = _prep_body(scratch[: chunk + k - 1], k, wbits, hash_num)
        widx_ref[:] = widx
        mask_ref[:] = mask
        valid_ref[:] = valid

    return kernel


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("chunk", "k", "wbits", "hash_num",
                                   "n_chunks", "interpret"))
def _flag_prep_pallas(seq_padded, chunk: int, k: int, wbits: int,
                      hash_num: int, n_chunks: int, interpret: bool = False):
    """seq_padded uint8 [n_chunks*chunk + HALO_PAD] (already tail-padded).

    Returns (widx, mask, valid) each [n_chunks * chunk]."""
    kern = _make_kernel(chunk, k, wbits, hash_num)
    out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # stays in HBM
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * chunk,), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks * chunk,), jnp.uint32),
            jax.ShapeDtypeStruct((n_chunks * chunk,), jnp.uint32),
        ),
        out_specs=(
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk + HALO_PAD,), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(seq_padded)
    return out


@partial(jax.jit, static_argnames=("chunk", "k", "wbits", "hash_num",
                                   "n_chunks", "snv", "interpret"))
def _flag_gates_packed(seq_padded, words, chunk: int, k: int, wbits: int,
                       hash_num: int, n_chunks: int, snv: bool,
                       interpret: bool = False):
    widx, mask, valid = _flag_prep_pallas(
        seq_padded, chunk, k, wbits, hash_num, n_chunks, interpret
    )
    present = (words[widx] & mask) == mask
    gate = (jnp.full_like(present, snv) | ~present) & (valid == 1)
    lanes = jnp.arange(32, dtype=jnp.uint32)
    b = gate.reshape(-1, 32).astype(jnp.uint32)
    return (b << lanes[None, :]).sum(axis=1, dtype=jnp.uint32)


SUPER_HEADS = 1 << 20  # heads per pallas_call: fixes n_chunks (and so the
# compiled program shape) for every contig length; longer contigs loop


def flag_contig_gates_pallas(seq: np.ndarray, df, snv: bool = False,
                             chunk: int = DEFAULT_CHUNK,
                             interpret: bool | None = None) -> np.ndarray:
    """Gate head positions for one contig via the Pallas prep kernel.

    Requires a blocked device filter (df.blocked); the XLA path
    (engine.flag.flag_contig_gates) covers every other filter kind.
    Processes the contig in fixed-shape super-chunks of SUPER_HEADS heads
    (one compile per (k, filter) config regardless of contig length);
    dispatches are issued asynchronously and read back once.

    Hint contract (same as engine.flag.flag_contig_gates): every window
    touching an accepted-IUPAC draft byte (and no unaccepted byte) is
    force-included — the repair engines re-evaluate each hinted head with
    exact host hashes, so the superset only costs probes.  Windows
    touching unaccepted bytes (N, junk) are already excluded by the
    in-kernel validity gate (the spec scan skips them,
    oracle.py:391-409), and the union makes the two dense paths return
    bit-identical hint sets.
    """
    if not df.blocked:
        raise ValueError("pallas flag kernel requires a blocked filter")
    if interpret is None:
        interpret = not _on_tpu()  # CPU test meshes run the interpreter
    k = df.k
    L = len(seq)
    n = L - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    from ntedit_tpu.engine.flag import packed_to_positions

    # power-of-two n_chunks buckets: at most log2(SUPER_HEADS/chunk)+1
    # compiled shapes ever, whatever contig lengths arrive
    n_chunks = 1
    while n_chunks * chunk < min(n, SUPER_HEADS):
        n_chunks *= 2
    super_heads = n_chunks * chunk
    nw = df.bits // 32
    wbits = nw.bit_length() - 1
    pad_total = (-n) % super_heads
    padded = np.concatenate(
        [np.asarray(seq, dtype=np.uint8), np.zeros(pad_total + HALO_PAD, np.uint8)]
    )
    outs = []
    for start in range(0, n, super_heads):
        piece = jnp.asarray(padded[start : start + super_heads + HALO_PAD])
        outs.append(
            _flag_gates_packed(
                piece, df.words, chunk, k, wbits, df.hash_num,
                n_chunks, snv, interpret,
            )
        )
    words_dev = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    words = np.asarray(words_dev)
    exc = np.flatnonzero(
        _flag._CODE_TAB[np.asarray(seq, dtype=np.uint8)] == 255
    ).astype(np.int64)
    iupac_heads, _bad = _flag._exception_hints(seq, exc, n, k)
    return _flag._merge_heads(packed_to_positions(words, n), iupac_heads)

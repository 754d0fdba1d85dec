"""Device-mesh parallelism: sharded dense scanning and Bloom-filter
collectives.

The reference's only parallelism is OpenMP threads over contigs in shared
memory (/root/reference/ntedit.cpp:2213; SURVEY.md §2.3).  The TPU-native
equivalents here are:

* **Contig-window data parallelism** — contigs are tiled into fixed windows
  of ``chunk + k - 1`` bases (k-1-base halo, the genomics analogue of
  sequence/context parallelism: a k-mer straddling a tile boundary needs
  the neighbour's first k-1 bases).  Tiles are sharded across the mesh and
  the dense flag pass runs under shard_map with zero cross-tile
  communication.
* **Bloom-filter OR-allreduce** — data-parallel filter construction builds
  one partial bit array per device from its read shard; the arrays are
  merged with a bitwise-OR allreduce (ring of ppermute+OR over uint32
  words).  The counting-filter analogue is a saturating-add allreduce
  (psum on int32 then clip to uint8).
* **Replicated filter, sharded probes** — during editing the merged filter
  is read-only (ntedit.cpp:2213 shares it across threads); it is
  replicated per device in HBM and probed with device-local gathers.

Everything here runs identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) and on real TPU slices; on
multi-host systems initialize ``jax.distributed`` first and the same code
shards over ICI/DCN.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ntedit_tpu.core import bloom, nthash as nt
from ntedit_tpu.engine import flag


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# Collectives
# ---------------------------------------------------------------------------

def ring_or(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Bitwise-OR allreduce across a mesh axis (inside shard_map).

    Implemented as a (D-1)-step ppermute ring: each step every device ORs
    in its left neighbour's rolling buffer.  For filter-sized arrays this
    rides ICI at full ring bandwidth; a reduce-scatter+all-gather variant
    is a follow-up optimization.
    """
    n = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        acc, buf = carry
        buf = jax.lax.ppermute(buf, axis, perm)
        return acc | buf, buf

    acc, _ = jax.lax.fori_loop(0, n - 1, body, (x, x))
    return acc


def saturating_add_allreduce(counts_u8: jnp.ndarray, axis: str) -> jnp.ndarray:
    """CBF merge: sum per-device uint8 counters with saturation at 255."""
    s = jax.lax.psum(counts_u8.astype(jnp.int32), axis)
    return jnp.minimum(s, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Data-parallel BF construction (device-side insert + OR merge)
# ---------------------------------------------------------------------------

def _bit_indices(seqs, k: int, hash_num: int, nbits_pow2: int):
    """k-mer bit indices of every window of every row of ``seqs``
    [R, Lr] -> int32 [R, Lr-k+1, hash_num].  Power-of-two filters only
    (framework-native sizing) so the modulo is a mask."""
    # scatter_or_words consumes uint32 WORD indices, so the per-device
    # partial build goes to 2^32 bits from the hash's low word alone
    # (2^37-bit word space would need high-word bits; DeviceFilterBuilder
    # covers single-device builds to 2^36)
    assert nbits_pow2 & (nbits_pow2 - 1) == 0 and nbits_pow2 <= (1 << 32)
    mask = np.uint32(nbits_pow2 - 1)

    def per_row(row):
        fh, rh = nt.window_hashes(row, k)
        hashes = nt.extend(nt.canonical(fh, rh), k, hash_num)
        return jnp.stack([h[1] & mask for h in hashes], -1)

    return jax.vmap(per_row)(seqs)


def build_bf_words(seqs, k: int, hash_num: int, nbits_pow2: int) -> jnp.ndarray:
    """Device-local BF build: insert every k-mer of every row.

    Returns the packed uint32 word array [nbits/32], built with the exact
    sort-based scatter-OR (bfbuild.scatter_or_words) — no byte-per-bit
    transient, so per-device partial filters scale to HBM capacity."""
    from ntedit_tpu.core.bfbuild import scatter_or_words

    idx = _bit_indices(seqs, k, hash_num, nbits_pow2).reshape(-1).astype(jnp.uint32)
    words = jnp.zeros((nbits_pow2 // 32,), jnp.uint32)
    return scatter_or_words(words, idx >> np.uint32(5),
                            jnp.uint32(1) << (idx & np.uint32(31)))


def sharded_bf_build(mesh: Mesh, read_shards: np.ndarray, k: int, hash_num: int,
                     nbits_pow2: int) -> jnp.ndarray:
    """Data-parallel BF construction: shard reads over the mesh, build
    per-device partial filters, merge with the OR-allreduce.  Returns the
    replicated word array."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=P("d"), out_specs=P(),
        check_vma=False,
    )
    def step(shard):
        words = build_bf_words(shard, k, hash_num, nbits_pow2)
        return ring_or(words, "d")

    return jax.jit(step)(read_shards)


def build_cbf_counts(seqs, k: int, hash_num: int, nslots_pow2: int) -> jnp.ndarray:
    """Device-local counting-filter build: saturating 8-bit counters over
    every k-mer of every row (btllib KmerCountingBloomFilter8 semantics:
    all hash_num slots +1 per insert, saturate at 255)."""
    mask = np.uint32(nslots_pow2 - 1)
    assert nslots_pow2 & (nslots_pow2 - 1) == 0

    def per_row(row):
        fh, rh = nt.window_hashes(row, k)
        hashes = nt.extend(nt.canonical(fh, rh), k, hash_num)
        return jnp.stack([(h[1] & mask).astype(jnp.int32) for h in hashes], -1)

    idx = jax.vmap(per_row)(seqs).reshape(-1)
    counts = jnp.zeros((nslots_pow2,), jnp.int32).at[idx].add(1)
    return jnp.minimum(counts, 255).astype(jnp.uint8)


def sharded_cbf_build(mesh: Mesh, read_shards: np.ndarray, k: int,
                      hash_num: int, nslots_pow2: int) -> jnp.ndarray:
    """Data-parallel counting-filter construction: per-device partial
    counters merged with the saturating-add allreduce."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=P("d"), out_specs=P(),
        check_vma=False,
    )
    def step(shard):
        counts = build_cbf_counts(shard, k, hash_num, nslots_pow2)
        return saturating_add_allreduce(counts, "d")

    return jax.jit(step)(read_shards)


# ---------------------------------------------------------------------------
# Sharded dense flag pass
# ---------------------------------------------------------------------------

def _row_batch(width: int) -> int:
    """lax.map batch size for per-tile passes: cap the live per-batch
    transient (~tens of u32 vectors per base) so wide production tiles
    (2^20+ bases, bench/large runs) stay inside HBM while narrow test
    tiles still vectorize across rows."""
    return max(1, (1 << 22) // max(1, width))


def sharded_flag(mesh: Mesh, tiles: np.ndarray, words: jnp.ndarray, *, k: int,
                 hash_num: int, nbits: int, snv: bool = False,
                 min_threshold: int = 1, blocked: bool = False):
    """tiles: [T, chunk + k - 1] uint8, T divisible by mesh size; filter
    words replicated.  Returns the PACKED gate bitmap uint32 [T, chunk/32]
    on host (32x less readback than bools; unpack with
    flag.packed_to_positions on the flattened words)."""
    bs = _row_batch(tiles.shape[1])

    def per_tile(tile, w):
        df = bloom.DeviceFilter(w, None, nbits, 0, hash_num, k, False,
                                   blocked=blocked)
        gate, _p, _c, _v = flag.flag_chunk(tile, df, k, snv, min_threshold)
        lanes = jnp.arange(32, dtype=jnp.uint32)
        b = gate.reshape(-1, 32).astype(jnp.uint32)
        return (b << lanes[None, :]).sum(axis=1, dtype=jnp.uint32)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("d", None), P()), out_specs=P("d", None),
        check_vma=False,
    )
    def step(tile_shard, w):
        return jax.lax.map(lambda t: per_tile(t, w), tile_shard, batch_size=bs)

    return jax.jit(step)(tiles, words)


def sharded_snv_candidates(mesh: Mesh, tiles: np.ndarray, words: jnp.ndarray,
                           *, k: int, hash_num: int, nbits: int,
                           blocked: bool = False):
    """Sharded SNV candidate pass: the device alternate pre-check
    (engine.flag.snv_candidates_chunk — changelast rehash of all four
    bases, ntedit.cpp:434-452/1923-1928) over contig tiles sharded across
    the mesh.  tiles: [T, chunk + k - 1] uint8 with k-1 halos, T divisible
    by mesh size; filter words replicated.  Returns candidate bitmap
    words [T, chunk/32] on host — positions with no passing alternate are
    provably no-ops, so the unpacked set is an exact repair hint under
    the same eligibility as Polisher._snv_fast_eligible."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("d", None), P()), out_specs=P("d", None),
        check_vma=False,
    )
    def step(tile_shard, w):
        df = bloom.DeviceFilter(w, None, nbits, 0, hash_num, k, False,
                                   blocked=blocked)
        return jax.lax.map(lambda t: flag.snv_candidates_chunk(t, df, k),
                           tile_shard, batch_size=_row_batch(tiles.shape[1]))

    return jax.jit(step)(tiles, words)


def sharded_polish_cand_planes(mesh: Mesh, tiles: np.ndarray,
                               words: jnp.ndarray, *, k: int, hash_num: int,
                               nbits: int, blocked: bool = False):
    """Sharded polish substitution-candidate pass (VERDICT r2 #7): the
    per-base changelast presence planes (flag.polish_cand_planes_chunk;
    ntedit.cpp:1923-1928's first-level probe) over contig tiles sharded
    across the mesh.  Returns [T, 5, chunk/32] plane words on host —
    planes 0-3 per-base presence, plane 4 validity.  N chips divide the
    one extra dense pass; the host repair then probes only surviving
    (site, base) pairs."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("d", None), P()), out_specs=P("d", None, None),
        check_vma=False,
    )
    def step(tile_shard, w):
        df = bloom.DeviceFilter(w, None, nbits, 0, hash_num, k, False,
                                   blocked=blocked)
        return jax.lax.map(
            lambda t: flag.polish_cand_planes_chunk(t, df, k),
            tile_shard, batch_size=_row_batch(tiles.shape[1]),
        )

    return jax.jit(step)(tiles, words)


def sharded_confirm(mesh: Mesh, W: np.ndarray, words: jnp.ndarray, *, k: int,
                    jump: int, hash_num: int, nbits: int,
                    blocked: bool = False):
    """Sharded flagged-site confirmation: the subset-missing scan
    (ntedit.cpp:1820-1873) batched over candidate sites and sharded across
    the mesh — the repair pass's verify compute as a mesh collective-free
    data-parallel stage.

    W: [S, 2k] site windows (S divisible by mesh size), filter words
    replicated.  Returns (check_missing [S], gate [S]) on host.
    """
    stride = np.arange(k) % jump == 0

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("d", None), P()), out_specs=(P("d"), P("d")),
        check_vma=False,
    )
    def step(rows, w):
        df = bloom.DeviceFilter(w, None, nbits, 0, hash_num, k, False,
                                   blocked=blocked)

        def per_row(row):
            fh, rh = nt.window_hashes(row, k)
            hashes = nt.extend(nt.canonical(fh, rh), k, df.hash_num)
            present = df.contains(hashes)
            gate = ~present[0]
            miss = (~present[1 : k + 1]) & jnp.asarray(stride)
            return miss.sum(dtype=jnp.int32), gate

        return jax.lax.map(per_row, rows, batch_size=_row_batch(W.shape[1]))

    return jax.jit(step)(W, words)


def sharded_polish(
    mesh: Mesh,
    header: str,
    draft: np.ndarray,
    host_bf,
    words: jnp.ndarray,
    cfg,
    chunk: int = 512,
    threads: Optional[int] = None,
):
    """End-to-end sharded polish of one contig.

    1. The contig is tiled into k-1-halo windows sharded over the mesh;
       the dense flag pass runs per shard against the replicated filter
       (zero cross-shard communication — SURVEY §5.7 halo design).
    2. Gate heads are gathered to the host (the record-gather point; on
       multi-host meshes this is a process-local slice + allgather).
    3. Repair runs on independent gate-run segments in parallel host
       threads (native_repair.polish_contig_segmented) — the single-contig
       analogue of the reference's per-contig OpenMP loop
       (ntedit.cpp:2213-2250) — and per-segment edit records are merged
       with coordinate offsets into one ContigResult (the stitcher is the
       record-merge: SURVEY §2.3, ntedit.cpp:2145-2150 merge point).

    Output is byte-identical to the single-device polish: the flag pass is
    deterministic per window wherever it runs, and segment repair is exact
    (tests/test_parallel.py::test_sharded_polish_equals_single).
    """
    from ntedit_tpu.engine import native_repair
    from ntedit_tpu.engine.oracle import Oracle

    import os

    k = cfg.k
    D = mesh.devices.size
    # the replicated words may be in the framework's blocked layout or
    # the plain btllib layout — the sharded probes must match the host
    # filter's layout bit for bit
    blocked = bool(getattr(host_bf, "blocked_layout", False))
    tiles, n_heads = tile_contig(draft, chunk, k, n_tiles_multiple=D)
    if threads is None:
        # repair threads run on THIS host: size by its cores, not the mesh
        # (an 8-device mesh on a 2-core host would oversubscribe 4x)
        threads = max(2, min(os.cpu_count() or 2, D))
    res = None
    if cfg.snv:
        # SNV at scale: the device alternate pre-check is an exact hint
        # under the same eligibility as Polisher._snv_fast_eligible
        # (plain filter, no reject BF, mode != 2, mask off) — the
        # reference's marquee large-scale mode (README.md:48-49) through
        # the sharded pass (ntedit.cpp:1890-1914, 2411-2420)
        eligible = (
            not hasattr(host_bf, "counters")
            and cfg.mode != 2
            and not cfg.mask
        )
        if eligible:
            cw = sharded_snv_candidates(
                mesh, tiles, words, k=k, hash_num=cfg.hash_num,
                nbits=host_bf.bits, blocked=blocked,
            )
            cand_all = flag.packed_to_positions(
                np.asarray(cw).reshape(-1), n_heads
            )
            res = native_repair.polish_contig_segmented(
                host_bf, None, cfg, header, bytes(draft), cand_all,
                threads=threads, allow_snv=True,
            )
            if res is None:
                res = native_repair.polish_contig_native(
                    host_bf, None, cfg, header,
                    np.frombuffer(bytes(draft), np.uint8),
                    gate_hint=cand_all,
                )
        if res is not None:
            return res
    gate = sharded_flag(
        mesh, tiles, words, k=k, hash_num=cfg.hash_num, nbits=host_bf.bits,
        snv=cfg.snv, min_threshold=cfg.min_threshold, blocked=blocked,
    )
    gates = flag.packed_to_positions(np.asarray(gate).reshape(-1), n_heads)
    res = None
    if not cfg.snv:
        cand = None
        if (
            len(gates)
            and not hasattr(host_bf, "counters")
            and cfg.mode != 2
            and native_repair.available()  # the Oracle fallback takes no
            # masks — don't pay the extra dense pass just to discard it
        ):
            # device pre-verification of substitution candidates: the
            # sharded changelast pass rides the same tiles; host trials
            # then touch only surviving (site, base) pairs
            pw = np.asarray(sharded_polish_cand_planes(
                mesh, tiles, words, k=k, hash_num=cfg.hash_num,
                nbits=host_bf.bits, blocked=blocked,
            ))
            planes = pw.transpose(1, 0, 2).reshape(5, -1)
            cand = flag.cand_masks_from_planes(planes, gates)
        res = native_repair.polish_contig_segmented(
            host_bf, None, cfg, header, bytes(draft), gates, threads=threads,
            gate_cand=cand,
        )
    if res is None:  # native lib unavailable or SNV: exact sequential path
        res = Oracle(host_bf, None, cfg).polish_contig(
            header, bytes(draft), gate_hint=gates
        )
    return res


def tile_contig(seq: np.ndarray, chunk: int, k: int, n_tiles_multiple: int = 1):
    """Tile one contig into [T, chunk + k - 1] windows with k-1 halos,
    padding the tail (and T up to a multiple) with zero bytes.  Returns
    (tiles, n_heads) where n_heads = len(seq) - k + 1 valid head count."""
    L = len(seq)
    n = max(0, L - k + 1)
    T = max(1, -(-n // chunk))
    T = -(-T // n_tiles_multiple) * n_tiles_multiple
    padded = np.zeros(T * chunk + k - 1, dtype=np.uint8)
    padded[:L] = seq
    tiles = np.stack([padded[i * chunk : i * chunk + chunk + k - 1] for i in range(T)])
    return tiles, n

"""Bloom-filter construction: the ntCard + ntStat + make_genome_bf path.

Replaces the reference pipeline's three external native tools (SURVEY.md
§2.2) with one module over the same nthash/bloom core the engine uses:

* ``count_histogram``  — ntCard's role: k-mer frequency histogram
  (F1 = total k-mers, F0 = distinct, f_i spectrum), saved/loaded in
  ntCard's .hist text format (demo/ntcard_k25.hist).  Exact by default;
  for large read sets it switches to ntCard-style hash sampling (count
  k-mers whose canonical hash falls in a 2^-s slice of hash space, scale
  by 2^s) — the estimator contract the pipeline actually relies on
  (ntedit_run_pipeline.smk:168-176, 250-256 reads only F0 and the shape).
* ``solid_cutoff``     — ntStat's ``--solid`` role: derive the
  error/true-kmer threshold from the histogram valley
  (run-ntedit:90-96; rule ntstat passes ``-cmin 0`` to mean "derive",
  ntedit_run_pipeline.smk:163).
* ``build_read_filter`` — ntStat ``filter``'s role: BF (or counting CBF)
  of read k-mers with multiplicity >= cutoff, sized by the
  Broder–Mitzenmacher formula for the post-cutoff cardinality
  (``ntstat filter -k K -cmin C -e FPR -f hist -o out [--counts]``,
  ntedit_run_pipeline.smk:165,202).
* ``build_genome_bf``  — ntedit_make_genome_bf's role: BF over genome
  k-mers, sized from --bf | --num_elements | total genome length with
  the same formula (src/ntedit_make_genome_bf.cpp:41-47,124-158).

K-mers containing non-ACGT bases are skipped everywhere (btllib ntHash
semantics).  Counting uses the CBF's count-min behavior: a k-mer's count
is the minimum across its slots, so multiplicities are never undercounted
and the >=cutoff test has no false negatives.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Sequence

import numpy as np

from ntedit_tpu.core import bloom
from ntedit_tpu.core import nthash_ref as nh
from ntedit_tpu.io import fastx

_ACGT = np.zeros(256, dtype=bool)
for _c in b"ACGTacgt":
    _ACGT[_c] = True


def valid_canonical_hashes(seq: np.ndarray, k: int) -> np.ndarray:
    """Canonical ntHash2 base hashes of every ACGT-only k-mer window."""
    L = len(seq)
    if L < k:
        return np.empty(0, dtype=np.uint64)
    fh, rh = nh.all_window_hashes(seq, k)
    acc = _ACGT[seq].astype(np.int32)
    cs = np.concatenate([[0], np.cumsum(acc)])
    ok = (cs[k:] - cs[:-k]) == k
    return nh.canonical(fh, rh)[ok]


def _iter_seqs(paths: Sequence[str]) -> Iterable[np.ndarray]:
    for p in paths:
        for rec in fastx.read_fastx(p):
            yield rec.seq


_FLUSH = 1 << 22  # base hashes buffered before one vectorized insert


def _iter_hash_batches(paths: Sequence[str], k: int) -> Iterable[np.ndarray]:
    """Canonical base hashes of all valid k-mers, in ~_FLUSH-sized
    batches (amortizes the vectorized scatter over many records)."""
    buf: list[np.ndarray] = []
    n = 0
    for seq in _iter_seqs(paths):
        h = valid_canonical_hashes(seq, k)
        if len(h):
            buf.append(h)
            n += len(h)
        if n >= _FLUSH:
            yield np.concatenate(buf)
            buf, n = [], 0
    if buf:
        yield np.concatenate(buf)


def _sample_key(h: np.ndarray) -> np.ndarray:
    """Avalanche mix (splitmix64 finalizer) for hash-slice sampling.

    The canonical ntHash value is a combination of the forward and
    reverse-complement hashes whose raw top bits are NOT uniform (it
    behaves like a min of two uniforms, density 2(1-x)); slicing on it
    directly would over-sample ~2x.  A bijective mixer decorrelates the
    slice from that skew while preserving distinctness."""
    with np.errstate(over="ignore"):
        x = h * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(29)
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(32)
    return x


# ---------------------------------------------------------------------------
# Histogram (ntCard role)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Histogram:
    k: int
    f1: int                 # total k-mers (F1)
    f0: int                 # distinct k-mers (F0)
    spectrum: np.ndarray    # spectrum[i] = # distinct k-mers with count i (i>=1)

    def f(self, i: int) -> int:
        return int(self.spectrum[i]) if 0 < i < len(self.spectrum) else 0

    def solid_cardinality(self, cutoff: int) -> int:
        """Distinct k-mers with multiplicity >= cutoff."""
        below = int(self.spectrum[1:cutoff].sum()) if cutoff > 1 else 0
        return max(1, self.f0 - below)

    def save(self, path: str) -> None:
        """ntCard .hist text format (demo/ntcard_k25.hist)."""
        with open(path, "w") as f:
            f.write(f"F1\t{self.f1}\n")
            f.write(f"F0\t{self.f0}\n")
            for i in range(1, len(self.spectrum)):
                f.write(f"{i}\t{int(self.spectrum[i])}\n")

    @classmethod
    def load(cls, path: str, k: int = 0) -> "Histogram":
        f1 = f0 = 0
        pairs = {}
        with open(path) as f:
            for line in f:
                key, val = line.split()
                if key == "F1":
                    f1 = int(val)
                elif key == "F0":
                    f0 = int(val)
                else:
                    pairs[int(key)] = int(val)
        top = max(pairs) if pairs else 0
        spec = np.zeros(top + 1, dtype=np.int64)
        for i, v in pairs.items():
            spec[i] = v
        return cls(k=k, f1=f1, f0=f0, spectrum=spec)


def count_histogram(
    paths: Sequence[str],
    k: int,
    max_count: int = 255,
    sample_budget: int = 1 << 26,
) -> Histogram:
    """Stream reads, build the k-mer multiplicity histogram.

    Starts exact (sample_log2 = 0); if the number of retained sampled
    hashes would exceed ``sample_budget``, re-samples to a thinner hash
    slice (each step halves retention) and scales counts back up —
    ntCard's estimator contract with a simpler mechanism.
    """
    s = 0
    total = 0
    kept: list[np.ndarray] = []
    kept_n = 0
    for seq in _iter_seqs(paths):
        h = valid_canonical_hashes(seq, k)
        total += len(h)
        if s:
            h = h[(_sample_key(h) >> np.uint64(64 - s)) == 0]
        kept.append(h)
        kept_n += len(h)
        while kept_n > sample_budget:
            s += 1
            kept_n = 0
            for i, arr in enumerate(kept):
                arr = arr[(_sample_key(arr) >> np.uint64(64 - s)) == 0]
                kept[i] = arr
                kept_n += len(arr)
    sampled = np.concatenate(kept) if kept else np.empty(0, np.uint64)
    _uniq, counts = np.unique(sampled, return_counts=True)
    scale = 1 << s
    counts = np.minimum(counts, max_count)
    spec_s = np.bincount(counts, minlength=max_count + 1)
    spectrum = (spec_s * scale).astype(np.int64)
    spectrum[0] = 0
    return Histogram(k=k, f1=total, f0=int(len(_uniq)) * scale, spectrum=spectrum)


def solid_cutoff(hist: Histogram) -> int:
    """First valley of the multiplicity spectrum: errors dominate low
    counts with a steeply falling f_i; genuine coverage forms a later
    peak.  The first i where f_i stops falling separates them (the
    ntHits/ntStat solid heuristic; legacy contract at ntedit-make:122-127).
    Clamped to [2, 255]."""
    f = hist.spectrum
    top = len(f) - 1
    i = 2
    while i < top and f[i] > f[i + 1]:
        i += 1
    return int(min(max(i, 2), 255))


# ---------------------------------------------------------------------------
# Read-derived BF / CBF (ntStat filter role)
# ---------------------------------------------------------------------------

def build_read_filter(
    paths: Sequence[str],
    k: int,
    cutoff: int = 2,
    solid: bool = False,
    fpr: float = 0.01,
    hash_num: int = 3,
    counts: bool = False,
    hist: Optional[Histogram] = None,
):
    """BF (or CBF when counts=True) of read k-mers with multiplicity
    >= cutoff.  ``solid`` derives the cutoff from the histogram
    (ntstat -cmin 0 semantics).  Returns (filter, hist, cutoff)."""
    if hist is None:
        hist = count_histogram(paths, k)
    if solid:
        cutoff = solid_cutoff(hist)
    cutoff = max(1, int(cutoff))

    n_solid = hist.solid_cardinality(cutoff)
    out_bytes = bloom.bf_size_bytes(n_solid, hash_num, fpr)

    # counting filters need as many SLOTS as the bit-array formula gives
    # bits (one byte per slot): same collision behavior, 8x the memory
    cbf_slots = bloom.bf_size_bytes(hist.f0, hash_num, fpr) * 8
    if counts:
        cbf = bloom.KmerCountingBloomFilter8.zeros(cbf_slots, hash_num, k)
        for h in _iter_hash_batches(paths, k):
            cbf.insert_hashes(nh.extend_hashes_vec(h, k, hash_num))
        return cbf, hist, cutoff

    bf = bloom.KmerBloomFilter.zeros(out_bytes, hash_num, k)
    if cutoff <= 1:
        for h in _iter_hash_batches(paths, k):
            bf.insert_hashes(nh.extend_hashes_vec(h, k, hash_num))
        return bf, hist, cutoff

    # two passes: count-min multiplicities, then threshold-insert
    counter = bloom.KmerCountingBloomFilter8.zeros(cbf_slots, hash_num, k)
    for h in _iter_hash_batches(paths, k):
        counter.insert_hashes(nh.extend_hashes_vec(h, k, hash_num))
    for h in _iter_hash_batches(paths, k):
        ext = nh.extend_hashes_vec(h, k, hash_num)
        ok = counter.count_hashes(ext) >= cutoff
        if ok.any():
            bf.insert_hashes(ext[ok])
    return bf, hist, cutoff


# ---------------------------------------------------------------------------
# Genome BF (ntedit_make_genome_bf role)
# ---------------------------------------------------------------------------

def build_genome_bf(
    genome_paths: Sequence[str],
    k: int,
    fpr: float = 0.01,
    hash_num: int = 3,
    bf_bytes: Optional[int] = None,
    num_elements: Optional[int] = None,
) -> bloom.KmerBloomFilter:
    """BF over all genome k-mers.  Size precedence --bf > --num_elements >
    total genome length, each through the Broder–Mitzenmacher formula
    (src/ntedit_make_genome_bf.cpp:124-138)."""
    if bf_bytes is None:
        n = num_elements if num_elements is not None else fastx.total_length(genome_paths)
        bf_bytes = bloom.bf_size_bytes(max(1, n), hash_num, fpr)
    bf = bloom.KmerBloomFilter.zeros(bf_bytes, hash_num, k)
    for h in _iter_hash_batches(genome_paths, k):
        bf.insert_hashes(nh.extend_hashes_vec(h, k, hash_num))
    return bf

"""Readers + BF construction path (ntCard/ntStat/make_genome_bf roles)."""

import gzip

import numpy as np
import pytest

from ntedit_tpu.core import bfbuild, bloom
from ntedit_tpu.engine.polish import Polisher
from ntedit_tpu.io import fastx
from ntedit_tpu.utils import simulate


# ---------------------------------------------------------------------------
# fastx readers
# ---------------------------------------------------------------------------

def test_fasta_multiline_comment_case(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">ctg1 a comment here\nACGTac\ngtAC\n>ctg2\nTTTT\n\n>empty3\n")
    recs = list(fastx.read_fastx(str(p)))
    assert [r.name for r in recs] == ["ctg1", "ctg2", "empty3"]
    assert recs[0].comment == "a comment here"
    assert recs[0].seq.tobytes() == b"ACGTacgtAC"
    assert recs[1].comment == ""
    assert recs[1].seq.tobytes() == b"TTTT"
    assert len(recs[2].seq) == 0
    assert recs[0].header == "ctg1 a comment here"


def test_fastq_and_gzip(tmp_path):
    content = b"@r1 lib=x\nACGTACGT\n+\nIIIIIIII\n@r2\nGGGGCCCC\n+r2\nJJJJJJJJ\n"
    p = tmp_path / "r.fq"
    p.write_bytes(content)
    pg = tmp_path / "r.fq.gz"
    pg.write_bytes(gzip.compress(content))
    for path in (p, pg):
        recs = list(fastx.read_fastx(str(path)))
        assert [r.name for r in recs] == ["r1", "r2"]
        assert recs[0].seq.tobytes() == b"ACGTACGT"
        assert recs[0].qual == b"IIIIIIII"
        assert recs[1].seq.tobytes() == b"GGGGCCCC"


def test_fastx_rejects_garbage(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("hello world\n")
    with pytest.raises(ValueError):
        list(fastx.read_fastx(str(p)))


def test_write_fasta_roundtrip(tmp_path):
    p = tmp_path / "w.fa"
    fastx.write_fasta(str(p), [("c1 note", b"ACGT"), ("c2", b"TTAA")])
    recs = list(fastx.read_fastx(str(p)))
    assert recs[0].header == "c1 note"
    assert recs[1].seq.tobytes() == b"TTAA"


# ---------------------------------------------------------------------------
# histogram (ntCard role)
# ---------------------------------------------------------------------------

def _write_reads(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def _sim_reads(truth, n_reads, read_len, seed, err=0.0):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(truth) - read_len, size=n_reads)
    out = []
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for s in starts:
        r = truth[s : s + read_len].copy()
        if err:
            flips = rng.random(read_len) < err
            r[flips] = bases[rng.integers(0, 4, size=int(flips.sum()))]
        out.append(r.tobytes().decode())
    return out


def test_histogram_exact_matches_bruteforce(tmp_path):
    truth = simulate.random_genome(2000, seed=1)
    reads = _sim_reads(truth, 300, 100, seed=2)
    p = tmp_path / "r.fq"
    _write_reads(p, reads)
    k = 21
    hist = bfbuild.count_histogram([str(p)], k)
    # brute force over canonical hashes
    from collections import Counter
    cnt = Counter()
    total = 0
    for r in reads:
        h = bfbuild.valid_canonical_hashes(
            np.frombuffer(r.encode(), dtype=np.uint8), k
        )
        total += len(h)
        cnt.update(h.tolist())
    assert hist.f1 == total
    assert hist.f0 == len(cnt)
    mult = Counter(min(c, 255) for c in cnt.values())
    for i in range(1, len(hist.spectrum)):
        assert hist.spectrum[i] == mult.get(i, 0)


def test_histogram_ntcard_format_roundtrip(tmp_path):
    spec = np.zeros(7, dtype=np.int64)
    spec[1:] = [6843678, 86823, 1246, 191, 63, 256]
    h = bfbuild.Histogram(k=25, f1=105829544, f0=11488448, spectrum=spec)
    p = tmp_path / "k25.hist"
    h.save(str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == "F1\t105829544"
    assert lines[1] == "F0\t11488448"
    assert lines[2] == "1\t6843678"
    h2 = bfbuild.Histogram.load(str(p), k=25)
    assert h2.f1 == h.f1 and h2.f0 == h.f0
    assert (h2.spectrum == h.spectrum).all()


def test_histogram_sampled_estimates(tmp_path):
    truth = simulate.random_genome(30000, seed=3)
    reads = _sim_reads(truth, 3000, 100, seed=4)
    p = tmp_path / "r.fq"
    _write_reads(p, reads)
    exact = bfbuild.count_histogram([str(p)], 25)
    approx = bfbuild.count_histogram([str(p)], 25, sample_budget=1 << 14)
    assert approx.f1 == exact.f1  # F1 is always exact
    assert abs(approx.f0 - exact.f0) / exact.f0 < 0.25
    assert bfbuild.solid_cutoff(approx) >= 2


def test_solid_cutoff_demo_shape():
    spec = np.zeros(9, dtype=np.int64)
    spec[1:] = [6843678, 86823, 1246, 191, 63, 256, 900, 4000]
    h = bfbuild.Histogram(k=25, f1=0, f0=0, spectrum=spec)
    # falling run 1..5, valley at 5 (63 < 256)
    assert bfbuild.solid_cutoff(h) == 5


# ---------------------------------------------------------------------------
# read filter (ntStat role)
# ---------------------------------------------------------------------------

def test_build_read_filter_cutoff_excludes_singletons(tmp_path):
    truth = simulate.random_genome(3000, seed=5)
    reads = _sim_reads(truth, 900, 100, seed=6, err=0.01)  # ~30x with errors
    p = tmp_path / "r.fq"
    _write_reads(p, reads)
    bf, hist, cutoff = bfbuild.build_read_filter([str(p)], 25, cutoff=2)
    assert cutoff == 2
    # genuine genome k-mers (coverage ~30) are present
    genome_h = bfbuild.valid_canonical_hashes(truth, 25)
    from ntedit_tpu.core import nthash_ref as nh
    ext = nh.extend_hashes_vec(genome_h, 25, bf.hash_num)
    frac = bf.contains_hashes(ext).mean()
    assert frac > 0.98
    # most error k-mers (singletons) are excluded: sample absent-from-truth
    rng = np.random.default_rng(7)
    junk = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, size=5000)]
    junk_h = bfbuild.valid_canonical_hashes(junk, 25)
    jext = nh.extend_hashes_vec(junk_h, 25, bf.hash_num)
    assert bf.contains_hashes(jext).mean() < 0.05


def test_build_read_filter_counts_mode(tmp_path):
    truth = simulate.random_genome(1500, seed=8)
    reads = [truth.tobytes().decode()] * 4  # every k-mer exactly 4x
    p = tmp_path / "r.fq"
    _write_reads(p, reads)
    cbf, hist, _ = bfbuild.build_read_filter([str(p)], 25, counts=True)
    from ntedit_tpu.core import nthash_ref as nh
    h = bfbuild.valid_canonical_hashes(truth, 25)
    counts = cbf.count_hashes(nh.extend_hashes_vec(h, 25, cbf.hash_num))
    assert (counts >= 4).all()  # count-min never undercounts
    assert np.median(counts) <= 6  # and rarely overcounts much


def test_build_read_filter_solid_mode(tmp_path):
    truth = simulate.random_genome(4000, seed=9)
    reads = _sim_reads(truth, 2000, 100, seed=10, err=0.01)  # ~50x
    p = tmp_path / "r.fq"
    _write_reads(p, reads)
    bf, hist, cutoff = bfbuild.build_read_filter([str(p)], 25, solid=True)
    assert cutoff >= 2  # derived from the valley, not the default


def test_read_filter_skips_non_acgt(tmp_path):
    p = tmp_path / "r.fq"
    _write_reads(p, ["ACGTNACGTACGTACGTACGTACGTACGTA"])
    bf, hist, _ = bfbuild.build_read_filter([str(p)], 25, cutoff=1)
    # only windows right of the N are valid: positions 5..5 (L=30, k=25)
    assert hist.f1 == 1


# ---------------------------------------------------------------------------
# genome BF (make_genome_bf role)
# ---------------------------------------------------------------------------

def test_build_genome_bf_contains_all(tmp_path):
    truth = simulate.random_genome(5000, seed=11)
    p = tmp_path / "g.fa"
    fastx.write_fasta(str(p), [("g", truth.tobytes())])
    bf = bfbuild.build_genome_bf([str(p)], 25)
    assert bf.bytes == bloom.bf_size_bytes(5000, 3, 0.01)
    from ntedit_tpu.core import nthash_ref as nh
    h = bfbuild.valid_canonical_hashes(truth, 25)
    assert bf.contains_hashes(nh.extend_hashes_vec(h, 25, 3)).all()


def test_build_genome_bf_size_precedence(tmp_path):
    truth = simulate.random_genome(1000, seed=12)
    p = tmp_path / "g.fa"
    fastx.write_fasta(str(p), [("g", truth.tobytes())])
    bf1 = bfbuild.build_genome_bf([str(p)], 25, bf_bytes=4096)
    assert bf1.bytes == 4096
    bf2 = bfbuild.build_genome_bf([str(p)], 25, num_elements=50000)
    assert bf2.bytes == bloom.bf_size_bytes(50000, 3, 0.01)


# ---------------------------------------------------------------------------
# end-to-end: reads -> filter -> polish
# ---------------------------------------------------------------------------

def test_pipeline_reads_to_polish(tmp_path):
    truth = simulate.random_genome(8000, seed=13)
    draft, injected = simulate.inject_errors(truth, sub_rate=2e-3, seed=14)
    reads = _sim_reads(truth, 4000, 100, seed=15, err=0.005)  # ~50x
    p = tmp_path / "r.fq"
    _write_reads(p, reads)
    bf, hist, cutoff = bfbuild.build_read_filter([str(p)], 25, cutoff=2)
    res = Polisher(bf).polish_contig("ctg", draft)
    fixed = sum(
        1 for pos, kind, _ in injected
        if kind == "sub"
    )
    assert res.edited == truth.tobytes()

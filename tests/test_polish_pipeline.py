"""Pipeline equivalence: dense-flag + fast-forward repair must be
bit-identical to the plain scalar oracle on every workload shape."""

import io

import numpy as np
import pytest

from ntedit_tpu.core import bloom, nthash_ref as nh
from ntedit_tpu.engine.config import EngineConfig
from ntedit_tpu.engine.oracle import Oracle
from ntedit_tpu.engine.polish import Polisher
from ntedit_tpu.io import writers
from ntedit_tpu.utils import simulate


def render(result, snv=False):
    d, r, v = io.StringIO(), io.StringIO(), io.StringIO()
    writers.write_contig(result, d, r, v, snv=snv)
    return d.getvalue() + "\x00" + r.getvalue() + "\x00" + v.getvalue()


def assert_equivalent(draft, bf, bfrep=None, **cfg_kw):
    cfg = EngineConfig(k=bf.k, hash_num=bf.hash_num, **cfg_kw)
    slow = Oracle(bf, bfrep, cfg).polish_contig("ctg", bytes(draft))
    fast = Polisher(bf, bfrep, cfg, chunk=8192).polish_contig("ctg", np.asarray(draft))
    assert fast.edited == slow.edited
    assert render(fast, snv=cfg.snv) == render(slow, snv=cfg.snv)
    return fast


class TestEquivalence:
    def test_clean_contig(self):
        truth = simulate.random_genome(3000, seed=21)
        bf = simulate.truth_bf(truth, 25)
        res = assert_equivalent(truth, bf)
        assert res.edited == truth.tobytes()

    @pytest.mark.parametrize("mode", [0, 1, 2])
    def test_sparse_errors(self, mode):
        wl = simulate.make_workload(length=12000, k=25, seed=22)
        res = assert_equivalent(wl.draft, wl.bf, mode=mode)
        assert res.edited == wl.truth.tobytes()

    def test_clustered_errors(self):
        # errors closer than the dirty-zone horizon stress fast-forward
        truth = simulate.random_genome(6000, seed=23)
        draft, _ = simulate.inject_errors(truth, sub_rate=5e-3, min_gap=8, seed=24)
        bf = simulate.truth_bf(truth, 25)
        assert_equivalent(draft, bf)

    def test_non_acgt_runs(self):
        truth = simulate.random_genome(4000, seed=25)
        draft = truth.copy()
        draft[1000:1020] = ord("N")
        draft[2000] = ord("R")
        draft[2500] = ord("A") if truth[2500] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        assert_equivalent(draft, bf)

    def test_lowercase_draft(self):
        truth = simulate.random_genome(3000, seed=26)
        draft = truth.copy()
        lower = draft[500:600] + 32
        draft[500:600] = lower
        draft[550] = ord("a") if truth[550] != ord("A") else ord("c")
        bf = simulate.truth_bf(truth, 25)
        assert_equivalent(draft, bf)

    def test_mask_mode(self):
        truth = simulate.random_genome(3000, seed=27)
        draft = truth.copy()
        p = 1500
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        bf = bloom.KmerBloomFilter.zeros(1 << 14, 3, 25)
        bf.insert_seq(truth[: p - 40])
        bf.insert_seq(truth[p + 40 :])
        assert_equivalent(draft, bf, mask=True)

    def test_cbf_band(self):
        truth = simulate.random_genome(3000, seed=28)
        draft = truth.copy()
        p = 1200
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        cbf = bloom.KmerCountingBloomFilter8.zeros(1 << 17, 3, 25)
        fh, rh = nh.all_window_hashes(truth, 25)
        hashes = nh.extend_hashes_vec(nh.canonical(fh, rh), 25, 3)
        for _ in range(4):
            cbf.insert_hashes(hashes)
        assert_equivalent(draft, cbf, min_threshold=2)

    def test_secondary_bf(self):
        wl = simulate.make_workload(length=5000, k=25, seed=29)
        rep = bloom.KmerBloomFilter.zeros(1 << 12, 3, 25)
        rep.insert_seq(wl.truth[2000:2600])  # reject a repeat-ish region
        assert_equivalent(wl.draft, wl.bf, bfrep=rep)

    def test_snv_mode(self):
        truth = simulate.random_genome(1200, seed=30)
        p = 600
        variant = truth.copy()
        variant[p] = ord("A") if truth[p] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        bf.insert_seq(variant)
        assert_equivalent(truth, bf, snv=True)

    def test_error_near_contig_ends(self):
        truth = simulate.random_genome(800, seed=31)
        draft = truth.copy()
        draft[27] = ord("A") if truth[27] != ord("A") else ord("C")
        draft[-27] = ord("A") if truth[-27] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        assert_equivalent(draft, bf)

    def test_short_contig_skipped(self):
        truth = simulate.random_genome(80, seed=32)
        bf = simulate.truth_bf(truth, 25)
        pol = Polisher(bf, chunk=8192)
        results = list(pol.polish([("tiny", truth)]))
        assert results == []  # shorter than min_contig_len: not emitted

    def test_multi_contig_stream(self):
        bf = None
        contigs = []
        truths = []
        for s in range(3):
            t = simulate.random_genome(2000, seed=40 + s)
            truths.append(t)
        cat = np.concatenate(truths)
        bf = simulate.truth_bf(cat, 25)
        drafts = []
        for s, t in enumerate(truths):
            d, _ = simulate.inject_errors(t, seed=50 + s)
            drafts.append((f"c{s}", d))
        pol = Polisher(bf, chunk=8192)
        out = list(pol.polish(drafts))
        assert len(out) == 3
        for res, t in zip(out, truths):
            assert res.edited == t.tobytes()


def test_polish_stream_overlapped_matches_serial():
    """Cross-contig overlapped polish == serial polish, input order kept."""
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.polish import Polisher
    from ntedit_tpu.utils import simulate
    import numpy as np

    contigs = []
    bf = None
    from ntedit_tpu.core import bloom as _bloom

    bf = _bloom.KmerBloomFilter.zeros(1 << 17, 3, 25)
    for c in range(5):
        truth = simulate.random_genome(6000 + 500 * c, seed=700 + c)
        draft, _ = simulate.inject_errors(
            truth, sub_rate=2e-3, ins_rate=5e-4, del_rate=5e-4, seed=710 + c
        )
        bf.insert_seq(truth)
        contigs.append((f"ctg{c}", draft))
    contigs.append(("tiny", simulate.random_genome(50, seed=720)))  # dropped

    cfg = EngineConfig(k=25, hash_num=3, threads=4)
    pol = Polisher(bf, cfg=cfg)
    streamed = list(pol.polish(iter(contigs)))
    serial = [
        pol.polish_contig(h, s) for h, s in contigs if len(s) >= 100
    ]
    assert [r.header for r in streamed] == [r.header for r in serial]
    assert [r.edited for r in streamed] == [r.edited for r in serial]
    assert [r.subs for r in streamed] == [r.subs for r in serial]


def test_device_pipeline_k52():
    """Full Polisher pipeline at the human-SNV-recommended k (52): device
    hash/probe programs are k-parametric (u32-pair srol algebra)."""
    from ntedit_tpu.core import bloom as _bloom
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.oracle import Oracle
    from ntedit_tpu.engine.polish import Polisher
    from ntedit_tpu.utils import simulate

    k = 52
    truth = simulate.random_genome(15000, seed=920)
    draft, _ = simulate.inject_errors(
        truth, sub_rate=2e-3, ins_rate=5e-4, del_rate=5e-4, seed=921
    )
    bf = _bloom.KmerBloomFilter.zeros(1 << 17, 3, k)
    bf.insert_seq(truth)
    cfg = EngineConfig(k=k, hash_num=3)
    fast = Polisher(bf, cfg=cfg, chunk=8192).polish_contig("c", draft)
    slow = Oracle(bf, None, cfg).polish_contig("c", bytes(draft))
    assert fast.edited == slow.edited and fast.subs == slow.subs


def test_site_rows_indel_rich_corpus(monkeypatch):
    """Device polish site rows (flag.iter_polish_site_chunks, opt-in via
    NTEDIT_TPU_SITE_ROWS=1) on an indel-heavy corpus: most sites trigger
    the engine's bail-to-live condition (a pre-passing alternate fails
    verify before any qualifier -> tryIndels), the rest consume rows —
    output must equal the oracle either way, and the indels must still
    be repaired."""
    monkeypatch.setenv("NTEDIT_TPU_SITE_ROWS", "1")
    truth = simulate.random_genome(40000, seed=90)
    draft, edits = simulate.inject_errors(
        truth, sub_rate=1e-3, ins_rate=2e-3, del_rate=2e-3, seed=91)
    bf = simulate.truth_bf(truth, 25)
    res = assert_equivalent(draft, bf)
    assert res.edited == truth.tobytes()
    assert sum(1 for e in edits if e[1] != "sub") >= 50  # indels dominated


def test_site_rows_weak_filter_type0_sites(monkeypatch):
    """Sites where NO alternate qualifies (truncated-truth filter): rows
    resolve to type-0 no-ops without probing; with -a 1 the same rows
    drive the soft-mask write.  Byte-identical to the oracle."""
    monkeypatch.setenv("NTEDIT_TPU_SITE_ROWS", "1")
    truth = simulate.random_genome(24000, seed=92)
    draft, _ = simulate.inject_errors(truth, sub_rate=3e-3, seed=93)
    bf = simulate.truth_bf(truth[:18000], 25)  # tail unfixable
    assert_equivalent(draft, bf)
    assert_equivalent(draft, bf, mask=True)


def test_site_rows_sparse_and_clustered(monkeypatch):
    """Rows path (opt-in) across the standard corpus shapes: sparse and
    clustered substitutions, exceptions — byte-identical to the oracle."""
    monkeypatch.setenv("NTEDIT_TPU_SITE_ROWS", "1")
    wl = simulate.make_workload(length=12000, k=25, seed=22)
    res = assert_equivalent(wl.draft, wl.bf)
    assert res.edited == wl.truth.tobytes()
    truth = simulate.random_genome(6000, seed=23)
    draft, _ = simulate.inject_errors(truth, sub_rate=5e-3, min_gap=8, seed=24)
    bf = simulate.truth_bf(truth, 25)
    assert_equivalent(draft, bf)
    draft2 = truth.copy()
    draft2[1000:1020] = ord("N")
    draft2[2000] = ord("R")
    draft2[2500] = ord("A") if truth[2500] != ord("A") else ord("C")
    assert_equivalent(draft2, bf)

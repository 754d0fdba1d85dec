"""Oracle behaviour: the scalar spec fixes injected errors and produces the
reference's output formats."""

import io

import numpy as np
import pytest

from ntedit_tpu.core import bloom
from ntedit_tpu.engine.config import EngineConfig
from ntedit_tpu.engine.oracle import Oracle
from ntedit_tpu.io import writers
from ntedit_tpu.utils import simulate


def run_oracle(draft, bf, cfg=None, header="ctg", bfrep=None, **cfg_kw):
    cfg = cfg or EngineConfig(k=bf.k, hash_num=bf.hash_num, **cfg_kw)
    orc = Oracle(bf, bfrep, cfg)
    return orc.polish_contig(header, bytes(draft))


def render(result, snv=False, clinvar=None):
    d, r, v = io.StringIO(), io.StringIO(), io.StringIO()
    writers.write_contig(result, d, r, v, clinvar=clinvar, snv=snv)
    return d.getvalue(), r.getvalue(), v.getvalue()


class TestSubstitutionOnly:
    def test_single_sub_fixed(self):
        truth = simulate.random_genome(400, seed=3)
        draft = truth.copy()
        # corrupt one base mid-contig
        p = 200
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf, max_insertions=0, max_deletions=0)
        assert res.edited == truth.tobytes()
        assert len(res.subs) == 1
        rec = res.subs[0]
        assert rec.pos == p
        assert rec.draft_char == draft[p] and rec.sub_base == truth[p]
        # interior site with full support: ceil(k/j) = 9 subset k-mers
        assert rec.num_support == 9

    def test_no_errors_no_edits(self):
        truth = simulate.random_genome(300, seed=4)
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(truth.copy(), bf)
        assert res.edited == truth.tobytes()
        assert res.subs == []

    def test_n_in_draft_skipped(self):
        truth = simulate.random_genome(400, seed=5)
        draft = truth.copy()
        draft[150] = ord("N")
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf, max_insertions=0, max_deletions=0)
        # N is never "fixed" by polish (no window containing it is checked)
        assert res.edited == draft.tobytes()

    def test_soft_mask(self):
        truth = simulate.random_genome(400, seed=6)
        draft = truth.copy()
        p = 200
        # make an unfixable error: also remove truth kmers from filter
        bf = simulate.truth_bf(truth, 25)
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        # empty filter region: rebuild bf WITHOUT kmers covering p
        masked = truth.copy()
        bf2 = bloom.KmerBloomFilter.zeros(bf.bytes, bf.hash_num, bf.k)
        bf2.insert_seq(masked[: p - 30])
        bf2.insert_seq(masked[p + 30 :])
        res = run_oracle(draft, bf2, mask=True, max_insertions=0, max_deletions=0)
        ed = res.edited
        assert ed.lower() == draft.tobytes().lower()
        assert ed != draft.tobytes()  # something got lowercased
        assert chr(ed[p]).islower()


class TestIndels:
    def test_missing_base_inserted(self):
        truth = simulate.random_genome(500, seed=7)
        p = 250
        draft = np.concatenate([truth[:p], truth[p + 2 :]])  # draft misses 2 bases
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf)
        assert res.edited == truth.tobytes()

    def test_extra_bases_deleted(self):
        truth = simulate.random_genome(500, seed=8)
        p = 250
        extra = np.frombuffer(b"GT", dtype=np.uint8)
        draft = np.concatenate([truth[:p], extra, truth[p:]])
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf)
        assert res.edited == truth.tobytes()

    @pytest.mark.parametrize("mode", [0, 1, 2])
    def test_workload_all_modes(self, mode):
        wl = simulate.make_workload(length=8000, k=25, seed=10)
        res = run_oracle(wl.draft, wl.bf, mode=mode)
        # all isolated injected errors should be repaired
        assert res.edited == wl.truth.tobytes(), f"mode {mode}"

    def test_workload_larger(self):
        wl = simulate.make_workload(length=30000, k=25, seed=11, sub_rate=2e-3)
        res = run_oracle(wl.draft, wl.bf)
        edited = res.edited
        # near-perfect repair
        n_mismatch = sum(a != b for a, b in zip(edited, wl.truth.tobytes())) if len(
            edited
        ) == len(wl.truth) else -1
        assert edited == wl.truth.tobytes() or 0 <= n_mismatch <= 2


class TestWriters:
    def test_tsv_and_vcf_sub(self):
        truth = simulate.random_genome(400, seed=12)
        draft = truth.copy()
        p = 180
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf)
        fa, tsv, vcf = render(res)
        assert fa == f">ctg\n{truth.tobytes().decode()}\n"
        row = tsv.strip().split("\n")[0].split("\t")
        assert row[0] == "ctg" and int(row[1]) == p + 1
        assert row[2] == chr(draft[p]) and row[3] == chr(truth[p])
        vrow = vcf.strip().split("\n")[0].split("\t")
        assert vrow[1] == str(p + 1) and vrow[3] == chr(draft[p]) and vrow[4] == chr(truth[p])
        assert vrow[7].startswith("AD=") and "^NA" in vrow[7]
        assert vrow[9] == "1/1"

    def test_insertion_row_format(self):
        truth = simulate.random_genome(500, seed=13)
        p = 250
        draft = np.concatenate([truth[:p], truth[p + 1 :]])
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf)
        fa, tsv, vcf = render(res)
        assert fa.split("\n")[1] == truth.tobytes().decode()
        rows = [r.split("\t") for r in tsv.strip().split("\n")]
        ins_rows = [r for r in rows if r[3].startswith("+")]
        assert len(ins_rows) == 1
        assert ins_rows[0][3] == "+" + chr(truth[p])

    def test_deletion_row_format(self):
        truth = simulate.random_genome(500, seed=14)
        p = 250
        extra = np.frombuffer(b"C", dtype=np.uint8)
        draft = np.concatenate([truth[:p], extra, truth[p:]])
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf)
        fa, tsv, vcf = render(res)
        assert fa.split("\n")[1] == truth.tobytes().decode()
        rows = [r.split("\t") for r in tsv.strip().split("\n")]
        del_rows = [r for r in rows if r[3].startswith("-")]
        assert len(del_rows) == 1

    def test_headers(self):
        h = writers.changes_tsv_header(25, 3, counting=False)
        assert "Support 25-mer (out of 9)" in h
        h2 = writers.changes_tsv_header(25, 3, counting=True)
        assert "Coverage (max 255)" in h2
        v = writers.vcf_header("draft.fa", file_date="20260817")
        assert "##fileformat=VCFv4.2" in v and "##fileDate=20260817" in v
        assert v.strip().split("\n")[-1].endswith("FORMAT\tINTEGRATION")

    def test_clinvar_annotation(self):
        truth = simulate.random_genome(400, seed=15)
        draft = truth.copy()
        p = 180
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf)
        key = f"ctg>{chr(draft[p])}{p + 1}{chr(truth[p])}"
        clin = {key: "CLNSIG=Pathogenic"}
        _, _, vcf = render(res, clinvar=clin)
        assert "^CLNSIG=Pathogenic" in vcf


class TestSNV:
    def test_snv_calls_variant_without_editing(self):
        truth = simulate.random_genome(600, seed=16)
        # reads contain BOTH alleles: truth + variant at p
        p = 300
        variant = truth.copy()
        variant[p] = ord("A") if truth[p] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        bf.insert_seq(variant)  # add variant allele kmers
        res = run_oracle(truth.copy(), bf, snv=True)
        _, tsv, vcf = render(res, snv=True)
        # the edited fasta must be unchanged except possibly edits where
        # variant allele wins; draft allele is supported so no-edit rows
        vcf_rows = [r.split("\t") for r in vcf.strip().split("\n") if r]
        assert any(int(r[1]) == p + 1 for r in vcf_rows), vcf_rows[:5]
        row = next(r for r in vcf_rows if int(r[1]) == p + 1)
        assert row[9] in ("0/1", "1/2")
        # no-edit rows are suppressed from the TSV
        assert not any(
            line.split("\t")[1] == str(p + 1) and line.split("\t")[2] == line.split("\t")[3]
            for line in tsv.strip().split("\n")
        )

    def test_snv_forces_no_indels(self):
        cfg = EngineConfig(k=25, hash_num=3, snv=True, max_insertions=5, max_deletions=5).validate()
        assert cfg.max_insertions == 0 and cfg.max_deletions == 0


class TestCBF:
    def test_coverage_band(self):
        truth = simulate.random_genome(400, seed=17)
        draft = truth.copy()
        p = 200
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        from ntedit_tpu.core import nthash_ref as nh
        cbf = bloom.KmerCountingBloomFilter8.zeros(1 << 16, 3, 25)
        fh, rh = nh.all_window_hashes(truth, 25)
        hashes = nh.extend_hashes_vec(nh.canonical(fh, rh), 25, 3)
        for _ in range(5):
            cbf.insert_hashes(hashes)
        res = run_oracle(draft, cbf, min_threshold=2, max_threshold=255,
                         max_insertions=0, max_deletions=0)
        assert res.edited == truth.tobytes()
        assert len(res.subs) == 1


class TestSecondaryBF:
    def test_reject_filter_blocks_fix(self):
        truth = simulate.random_genome(400, seed=18)
        draft = truth.copy()
        p = 200
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
        bf = simulate.truth_bf(truth, 25)
        # secondary BF containing ALL truth kmers: nothing is solid
        rep = simulate.truth_bf(truth, 25)
        res = run_oracle(draft, bf, bfrep=rep)
        # fix is blocked because every candidate kmer is "repeat"
        assert res.edited == draft.tobytes()


def test_verbose_trial_trace(capsys):
    """-v prints the per-trial supports in the reference's shape
    (ntedit.cpp:1982-1990 substitutions, 1650-1657 insertions,
    1524-1530 deletions)."""
    from ntedit_tpu.utils import simulate

    truth = simulate.random_genome(2000, seed=70)
    draft = truth.copy()
    draft[1000] = ord("A") if truth[1000] != ord("A") else ord("C")
    bf = simulate.truth_bf(truth, 25)
    cfg = EngineConfig(k=25, hash_num=3, verbose=True)
    res = Oracle(bf, None, cfg).polish_contig("ctg", bytes(draft))
    out = capsys.readouterr().out
    assert len(res.subs) == 1
    assert "\t\tsub: " in out and " check_present: " in out
    # the accepted substitution's support appears on its trace line
    assert f"check_present: {res.subs[0].num_support}" in out


def test_vcf_multiallelic_1_2_genotype():
    """Two qualifying alternate bases at one SNV site emit a 1/2 record
    with ALT=b1,b2 and AD=s1,s2 (ntedit.cpp:1054-1162 heuristics)."""
    truth = simulate.random_genome(1600, seed=170)
    p = 800
    bases = [b for b in b"ACGT" if b != truth[p]]
    va = truth.copy(); va[p] = bases[0]
    vb = truth.copy(); vb[p] = bases[1]
    bf = bloom.KmerBloomFilter.zeros(1 << 15, 3, 25)
    # both variant alleles in the filter; the draft allele is NOT
    for v in (va, vb):
        bf.insert_seq(v)
    bf.insert_seq(truth[: p - 30])
    bf.insert_seq(truth[p + 30 :])
    cfg = EngineConfig(k=25, hash_num=3, snv=True)
    res = Oracle(bf, None, cfg).polish_contig("ctg", bytes(truth))
    d, r, v = io.StringIO(), io.StringIO(), io.StringIO()
    writers.write_contig(res, d, r, v, snv=True)
    rows = [l.split("\t") for l in v.getvalue().splitlines() if l and not l.startswith("#")]
    multi = [row for row in rows if "," in row[4]]
    assert multi, f"expected a multi-allelic record, got {rows}"
    row = multi[0]
    assert row[9] == "1/2"
    alt1, alt2 = row[4].split(",")
    assert {alt1, alt2} == {chr(bases[0]), chr(bases[1])}
    ad = row[7].split(";")[0]
    assert ad.startswith("AD=") and "," in ad


def test_vcf_ref_supported_0_1_genotype_exact():
    """SNV no-edit record where the draft allele outsupports the variant:
    GT must be exactly 0/1 (ref-supported heterozygous heuristic,
    ntedit.cpp:1070-1153) with the variant as ALT."""
    truth = simulate.random_genome(1500, seed=180)
    p = 700
    variant = truth.copy()
    alt = ord("A") if truth[p] != ord("A") else ord("C")
    variant[p] = alt
    bf = simulate.truth_bf(truth, 25)
    # insert the variant k-mers TWICE-sparse? presence BF: once is enough;
    # the draft baseline (check_there) counts the truth allele's support
    bf.insert_seq(variant)
    cfg = EngineConfig(k=25, hash_num=3, snv=True)
    res = Oracle(bf, None, cfg).polish_contig("ctg", bytes(truth))
    d, r, v = io.StringIO(), io.StringIO(), io.StringIO()
    writers.write_contig(res, d, r, v, snv=True)
    rows = [l.split("\t") for l in v.getvalue().splitlines()
            if l and not l.startswith("#")]
    row = next((x for x in rows if int(x[1]) == p + 1), None)
    assert row is not None, rows[:4]
    # both alleles carry equal support here: REF is the draft base, ALT
    # the variant, and the ref-supported heuristic emits exactly 0/1
    assert row[3] == chr(truth[p])
    assert row[4] == chr(alt)
    assert row[9] == "0/1"
    assert row[7].startswith("AD=")

"""Per-contig record spill + resume (io/spill.py, cli._run_engine).

SURVEY §5.4 names "per-shard edit-record spill" as the framework's
intra-stage mirror of Snakemake's artifact resume (run-ntedit:232-239).
Pinned here: a run killed mid-way resumes from the spill and produces
byte-identical output to an uninterrupted run; stale spills (parameter
or input drift) are discarded, not resumed.
"""

import os

import numpy as np
import pytest

from ntedit_tpu import cli
from ntedit_tpu.core import bloom
from ntedit_tpu.utils import simulate


@pytest.fixture()
def corpus(tmp_path):
    """6-contig draft + truth filter on disk."""
    k = 25
    rng_seeds = range(6)
    contigs = []
    bf = bloom.KmerBloomFilter.zeros(1 << 18, 3, k)
    for s in rng_seeds:
        truth = simulate.random_genome(8_000, seed=100 + s)
        draft, _ = simulate.inject_errors(truth, seed=200 + s)
        contigs.append(draft)
        bf.insert_seq(truth)
    draft_path = str(tmp_path / "draft.fa")
    with open(draft_path, "w") as f:
        for i, seq in enumerate(contigs):
            f.write(f">ctg{i} sim\n" + seq.tobytes().decode() + "\n")
    bf_path = str(tmp_path / "truth.bf")
    bf.save(bf_path)
    return draft_path, bf_path


def _outputs(prefix):
    out = {}
    for suffix in ("_edited.fa", "_changes.tsv", "_variants.vcf"):
        with open(prefix + suffix, "rb") as f:
            out[suffix] = f.read()
    return out


def test_kill_and_resume_byte_identical(tmp_path, corpus, monkeypatch):
    draft_path, bf_path = corpus
    monkeypatch.chdir(tmp_path)

    # ground truth: uninterrupted run, spill off
    cli._run_engine(bf_path, draft_path, "clean", threads=1, spill="off")
    want = _outputs("clean")

    # interrupted run: die after 3 contigs (simulated kill)
    from ntedit_tpu.engine.polish import Polisher

    real = Polisher.polish_contig
    calls = {"n": 0}

    def dying(self, header, seq):
        if calls["n"] >= 3:
            raise KeyboardInterrupt("simulated kill")
        calls["n"] += 1
        return real(self, header, seq)

    monkeypatch.setattr(Polisher, "polish_contig", dying)
    with pytest.raises(KeyboardInterrupt):
        cli._run_engine(bf_path, draft_path, "out", threads=1, spill="on")
    spill_dir = "out_spill"
    assert os.path.isdir(spill_dir)
    n_spilled = len([n for n in os.listdir(spill_dir) if n.endswith(".rec")])
    assert 1 <= n_spilled <= 3

    # resume: only the remaining contigs are polished
    monkeypatch.setattr(Polisher, "polish_contig", real)
    polished = []

    def counting(self, header, seq):
        polished.append(header)
        return real(self, header, seq)

    monkeypatch.setattr(Polisher, "polish_contig", counting)
    cli._run_engine(bf_path, draft_path, "out", threads=1, spill="on")
    assert len(polished) == 6 - n_spilled
    assert _outputs("out") == want
    assert not os.path.isdir(spill_dir)  # removed on success


def test_stale_spill_discarded(tmp_path, corpus, monkeypatch):
    draft_path, bf_path = corpus
    monkeypatch.chdir(tmp_path)
    cli._run_engine(bf_path, draft_path, "a", threads=1, spill="on")
    want = _outputs("a")

    # seed a spill from a run with DIFFERENT parameters (-x): records
    # must not be resumed into an -x-default run
    monkeypatch.setenv("NTEDIT_TPU_KEEP_SPILL", "1")
    cli._run_engine(bf_path, draft_path, "a", threads=1, spill="on", x=2.0)
    assert os.path.isdir("a_spill")
    monkeypatch.delenv("NTEDIT_TPU_KEEP_SPILL")

    from ntedit_tpu.engine.polish import Polisher

    real = Polisher.polish_contig
    polished = []

    def counting(self, header, seq):
        polished.append(header)
        return real(self, header, seq)

    monkeypatch.setattr(Polisher, "polish_contig", counting)
    cli._run_engine(bf_path, draft_path, "a", threads=1, spill="on")
    assert len(polished) == 6  # stale records discarded, all re-polished
    assert _outputs("a") == want


def test_spill_with_threads_matches_spill_off(tmp_path, corpus, monkeypatch):
    """Spill on + t=4 (the overlapped pipeline, lookahead active) must
    still merge in input order, byte-identical to spill off."""
    draft_path, bf_path = corpus
    monkeypatch.chdir(tmp_path)
    cli._run_engine(bf_path, draft_path, "t4off", threads=4, spill="off")
    cli._run_engine(bf_path, draft_path, "t4on", threads=4, spill="on")
    assert {k: v for k, v in _outputs("t4on").items()} == _outputs("t4off")

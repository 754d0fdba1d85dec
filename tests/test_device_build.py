"""On-device BF construction (DeviceFilterBuilder) vs host semantics.

Forced onto the CPU backend via NTEDIT_TPU_DEVICE_BUILD=1 — the same jit
stages run compiled on the TPU.
"""

import gzip
import os

import numpy as np
import pytest

from ntedit_tpu.core import bfbuild, bloom
from ntedit_tpu.utils import simulate


@pytest.fixture()
def reads(tmp_path):
    rng = np.random.default_rng(1)
    genome = simulate.random_genome(20_000, seed=9)
    path = tmp_path / "reads.fq.gz"
    with gzip.open(path, "wb") as f:
        for i in range(600):  # ~3x coverage of 100bp reads
            s = int(rng.integers(0, len(genome) - 100))
            seq = bytes(genome[s : s + 100])
            f.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * 100 + b"\n")
    return str(path), genome


def _forced_device(monkeypatch):
    monkeypatch.setenv("NTEDIT_TPU_DEVICE_BUILD", "1")


def test_device_build_cutoff1_matches_host_blocked(tmp_path, reads, monkeypatch):
    _forced_device(monkeypatch)
    path, _genome = reads
    bf_dev, hist, cut = bfbuild.build_read_filter([path], k=25, cutoff=1)
    assert isinstance(bf_dev, bloom.BlockedKmerBloomFilter)
    # host blocked filter over the same k-mers, same size: identical bits
    host = bloom.BlockedKmerBloomFilter.zeros(bf_dev.bytes, bf_dev.hash_num, 25)
    for h in bfbuild._iter_hash_batches([path], 25):
        host.insert_base(h)
    assert host.words.size == bf_dev.words.size
    assert (host.words == bf_dev.words).all()


def test_device_build_cutoff2_no_false_negatives(tmp_path, reads, monkeypatch):
    _forced_device(monkeypatch)
    path, genome = reads
    bf_dev, hist, cut = bfbuild.build_read_filter([path], k=25, cutoff=2)
    assert cut == 2
    # true multiplicities of all read k-mers
    from collections import Counter

    counts = Counter()
    for h in bfbuild._iter_hash_batches([path], 25):
        counts.update(h.tolist())
    keys = np.fromiter(counts.keys(), dtype=np.uint64, count=len(counts))
    mult = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    got = bf_dev.contains_base(keys)
    solid = mult >= 2
    assert got[solid].all(), "count-min thresholding must not drop solid k-mers"
    # singletons mostly rejected (count-min collisions allow a small leak)
    leak = got[~solid].mean() if (~solid).any() else 0.0
    assert leak < 0.05, f"singleton leak too high: {leak:.3f}"

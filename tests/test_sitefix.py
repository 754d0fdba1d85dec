"""Vectorized site fixer == scalar oracle, across modes and filter types."""

import io

import numpy as np
import pytest

from ntedit_tpu.core import bloom, nthash_ref as nh
from ntedit_tpu.engine.config import EngineConfig
from ntedit_tpu.engine.oracle import Oracle
from ntedit_tpu.io import writers
from ntedit_tpu.utils import simulate


def render(result, snv=False):
    d, r, v = io.StringIO(), io.StringIO(), io.StringIO()
    writers.write_contig(result, d, r, v, snv=snv)
    return d.getvalue() + "\x00" + r.getvalue() + "\x00" + v.getvalue()


def assert_fast_equals_scalar(draft, bf, bfrep=None, **cfg_kw):
    cfg = EngineConfig(k=bf.k, hash_num=bf.hash_num, **cfg_kw)
    slow = Oracle(bf, bfrep, cfg, fast=False).polish_contig("c", bytes(draft))
    fast = Oracle(bf, bfrep, cfg, fast=True).polish_contig("c", bytes(draft))
    assert fast.edited == slow.edited
    assert render(fast, snv=cfg.snv) == render(slow, snv=cfg.snv)
    return fast


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_modes_with_indels(mode):
    wl = simulate.make_workload(length=10000, k=25, seed=60)
    res = assert_fast_equals_scalar(wl.draft, wl.bf, mode=mode)
    assert res.edited == wl.truth.tobytes()


def test_clustered_and_near_end():
    truth = simulate.random_genome(3000, seed=61)
    draft, _ = simulate.inject_errors(
        truth, sub_rate=4e-3, ins_rate=1e-3, del_rate=1e-3, min_gap=10, seed=62
    )
    draft[30] = ord("T") if truth[30] != ord("T") else ord("G")
    draft[-30] = ord("T") if truth[-30] != ord("T") else ord("G")
    bf = simulate.truth_bf(truth, 25)
    assert_fast_equals_scalar(draft, bf)


def test_iupac_and_n_mixed():
    truth = simulate.random_genome(3000, seed=63)
    draft = truth.copy()
    draft[500] = ord("R")
    draft[900:905] = ord("N")
    draft[1500] = ord("A") if truth[1500] != ord("A") else ord("C")
    bf = simulate.truth_bf(truth, 25)
    assert_fast_equals_scalar(draft, bf)


def test_cbf_and_reject():
    truth = simulate.random_genome(2500, seed=64)
    draft = truth.copy()
    for p in (600, 1200, 1800):
        draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
    cbf = bloom.KmerCountingBloomFilter8.zeros(1 << 17, 3, 25)
    fh, rh = nh.all_window_hashes(truth, 25)
    hashes = nh.extend_hashes_vec(nh.canonical(fh, rh), 25, 3)
    for _ in range(4):
        cbf.insert_hashes(hashes)
    rep = bloom.KmerBloomFilter.zeros(1 << 12, 3, 25)
    rep.insert_seq(truth[1150:1260])
    assert_fast_equals_scalar(draft, cbf, bfrep=rep, min_threshold=2)


def test_snv_fast():
    truth = simulate.random_genome(1500, seed=65)
    p = 700
    variant = truth.copy()
    variant[p] = ord("A") if truth[p] != ord("A") else ord("C")
    bf = simulate.truth_bf(truth, 25)
    bf.insert_seq(variant)
    assert_fast_equals_scalar(truth, bf, snv=True)


def test_mask_fast():
    truth = simulate.random_genome(2000, seed=66)
    draft = truth.copy()
    p = 1000
    draft[p] = ord("A") if truth[p] != ord("A") else ord("C")
    bf = bloom.KmerBloomFilter.zeros(1 << 14, 3, 25)
    bf.insert_seq(truth[: p - 40])
    bf.insert_seq(truth[p + 40 :])
    assert_fast_equals_scalar(draft, bf, mask=True)


@pytest.mark.parametrize("use_ratio", [False, True])
def test_ratio_thresholds(use_ratio):
    wl = simulate.make_workload(length=6000, k=25, seed=67)
    kw = dict(use_ratio=True, missing_ratio=0.4, edit_ratio=0.3) if use_ratio else {}
    assert_fast_equals_scalar(wl.draft, wl.bf, **kw)

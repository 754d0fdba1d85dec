"""Vectorized flagged-site repair.

Batch-evaluates everything the scalar oracle's ``_fix_site`` does
sequentially — the subset-missing confirmation, all substitution verify
scans, all 341 insertion trials, and all deletion trials — as window
hashes over patched local slices, probed in bulk.  This is the exact
blueprint of the on-device repair machine: every reference "roll loop" is
re-expressed as "hashes of consecutive windows of a patched sequence",
which the reference's own rolling recurrences guarantee are equal (tested
in tests/test_nthash.py::test_roll_matches_scratch).

Applicable only at *pristine* sites — the k-window plus trial lookahead
lies in untouched, contiguous original cells away from the contig ends.
Anything else (recent edits nearby, contig ends where the reference's
truncation semantics kick in, inserted characters in the window) falls
back to the scalar path.  Equivalence with the scalar path on both the
fast and fallback routes is property-tested in tests/test_sitefix.py.

Median collections inside trials are deliberately skipped: the reference
computes them but uses them only for verbose output (the threshold code is
commented out, ntedit.cpp:2000-2007, 1536-1541, 1664-1670); only the
confirmation scan's check_there median is live (gate + SNV baseline).
"""

from __future__ import annotations

import numpy as np

from ntedit_tpu.core import nthash_ref as nh
from ntedit_tpu.engine.config import MULTI_POSSIBLE_BASES, NUM_TRIES
from ntedit_tpu.engine.oracle import (
    ORIG,
    is_accepted,
    is_atgc,
    median_u8,
    shuffle_best,
)


def _bulk(oracle, mat: np.ndarray):
    """Hash every window of every row and probe in bulk.

    mat [R, L] -> dict with contains/solid/count arrays [R, L-k+1]."""
    cfg = oracle.cfg
    k = cfg.k
    fh, rh = nh.batch_window_hashes(mat, k)
    base = nh.canonical(fh, rh)
    flat = nh.extend_hashes_vec(base.reshape(-1), k, cfg.hash_num)
    shape = base.shape
    bl = oracle.bloom
    if bl.is_counting:
        counts = bl.bf.count_hashes(flat).reshape(shape)
        contains = counts > 0
        cnt_ok = (counts >= cfg.min_threshold) & (counts <= cfg.max_threshold)
    else:
        contains = bl.bf.contains_hashes(flat).reshape(shape)
        counts = contains.astype(np.uint8)
        cnt_ok = np.ones(shape, dtype=bool)
    if oracle.bloomrep is not None:
        rep = oracle.bloomrep.bf
        if oracle.bloomrep.is_counting:
            rep_in = rep.count_hashes(flat).reshape(shape) > 0
        else:
            rep_in = rep.contains_hashes(flat).reshape(shape)
    else:
        rep_in = np.zeros(shape, dtype=bool)
    solid = (~rep_in) & cnt_ok
    return contains, solid, counts


def try_fix_site_fast(oracle, draft_char: int, st, fh, rh):
    """Vectorized equivalent of Oracle._fix_site.  Returns
    (fh, rh, edited) or None when the site is not eligible (caller falls
    back to the scalar path)."""
    cfg = oracle.cfg
    k = cfg.k
    cells = oracle.cells
    h_idx = st[0]
    span = 2 * k + cfg.max_deletions + 2
    if h_idx + span > len(cells):
        return None
    base_seq = st[1]
    for i in range(span):
        if cells[h_idx + i][ORIG] != base_seq + i:
            return None
    w = np.frombuffer(bytes(oracle.contig[base_seq : base_seq + span]), dtype=np.uint8)

    # ---- confirmation scan (ntedit.cpp:1820-1873) ----
    tail = w[k : 2 * k]  # charIn for roll kk = 0..k-1
    upper = np.where((tail >= 97) & (tail <= 122), tail - 32, tail)
    acc = np.array([is_accepted(int(c)) for c in upper], dtype=bool)
    bad = np.nonzero(~acc)[0]
    limit = int(bad[0]) if len(bad) else k
    do_not_fix = len(bad) > 0
    conf_contains, conf_solid, conf_counts = _bulk(oracle, w[None, : 2 * k])
    # window at offset kk+1 corresponds to roll kk
    kk = np.arange(limit)
    stride = (kk % cfg.jump) == 0
    miss = stride & ~conf_contains[0, kk + 1]
    there_ok = (
        stride
        & conf_contains[0, kk + 1]
        & (is_atgc(draft_char))
        & (
            np.ones(limit, bool)
            if not oracle.bloom.is_counting
            else conf_counts[0, kk + 1] >= cfg.min_threshold
        )
    )
    check_missing = int(miss.sum())
    check_there = int(there_ok.sum())
    check_there_median = (
        median_u8(list(conf_counts[0, kk + 1][there_ok])) if oracle.bloom.is_counting else 0
    )

    attempt = cfg.snv or (
        not do_not_fix
        and (
            check_missing >= cfg.missing_needed
            or (oracle.bloom.is_counting and check_there_median < cfg.min_threshold)
        )
    )
    best = dict(
        type=0, sub_base=0, indel="", alt_indel="", support=0,
        altbase1=0, altsupp1=0, altbase2=0, altsupp2=0, altbase3=0, altsupp3=0,
    )
    if not attempt:
        return fh, rh, False

    del_state = [1]
    if cfg.snv and check_there >= cfg.present_needed:
        best["sub_base"] = draft_char
        best["support"] = check_there_median if oracle.bloom.is_counting else check_there

    alts = oracle.bases_tab.get(chr(draft_char), "")
    if alts:
        # batch all substitution pre-checks + verify scans at once
        n_alt = len(alts)
        patched = np.repeat(w[None, : 2 * k], n_alt, axis=0)
        for i, b in enumerate(alts):
            patched[i, k - 1] = ord(b)
        sub_contains, sub_solid, _ = _bulk(oracle, patched)
        kk2 = np.arange(k)
        stride2 = (kk2 % cfg.jump) == 0
        # verify: rolls kk=0..k-1 -> windows at offsets kk+1
        sub_present = (
            stride2[None, :] & sub_contains[:, kk2 + 1] & sub_solid[:, kk2 + 1]
        ).sum(axis=1)
        pre_ok = sub_contains[:, 0] & sub_solid[:, 0]

        for i, b_ch in enumerate(alts):
            sub_base = ord(b_ch)
            if pre_ok[i] or cfg.mode == 2:
                check_present = int(sub_present[i])
                if check_present >= cfg.present_needed:
                    shuffle_best(best, sub_base, check_present)
                    if cfg.mode in (0, 1):
                        continue
                if cfg.mode == 2 or best["type"] != 1:
                    if _try_indels_fast(oracle, w, draft_char, sub_base, del_state, best):
                        if cfg.mode in (0, 1):
                            break
    return oracle._make_edit(draft_char, best, st, fh, rh)


def _try_indels_fast(oracle, w: np.ndarray, draft_char: int, index_char: int,
                     del_state, best: dict) -> bool:
    """Vectorized tryIndels (ntedit.cpp:1548-1744) over a pristine slice.

    Insertion trial i: windows of  w[:k-1] + ins_i + w[k-1:...]  at offsets
    1..k-1, counted at (offset-1) % j == 0.
    Deletion length d: windows of  w[:k-1] + w[k-1+d:...]  at offsets
    0..k-2; offset 0 unconditionally, offsets kk>=1 at kk % j == 0.
    Winner arbitration replays the reference's interleaved trial order.
    """
    cfg = oracle.cfg
    k = cfg.k
    n_tries = NUM_TRIES[cfg.max_insertions]
    if n_tries == 0:
        return False
    ins_list = MULTI_POSSIBLE_BASES[chr(index_char)][:n_tries]
    width = 2 * k + 4  # k-1 + max_ins(5) + k windows worth
    rows = np.zeros((n_tries, width), dtype=np.uint8)
    for i, ins in enumerate(ins_list):
        li = len(ins)
        rows[i, : k - 1] = w[: k - 1]
        rows[i, k - 1 : k - 1 + li] = np.frombuffer(ins.encode(), dtype=np.uint8)
        take = width - (k - 1 + li)
        rows[i, k - 1 + li :] = w[k - 1 : k - 1 + take]
    ins_contains, ins_solid, _ = _bulk(oracle, rows)
    kk = np.arange(k - 1)  # roll kk -> window offset kk+1
    stride = (kk % cfg.jump) == 0
    ins_support = (
        stride[None, :] & ins_contains[:, kk + 1] & ins_solid[:, kk + 1]
    ).sum(axis=1)
    ins_qual = ins_support >= cfg.present_needed

    # deletions: lengths s..max_d tried at iterations 0..(max_d - s)
    s = del_state[0]
    del_lengths = list(range(s, cfg.max_deletions + 1))
    if del_lengths:
        drows = np.zeros((len(del_lengths), 2 * k - 1), dtype=np.uint8)
        for di, d in enumerate(del_lengths):
            drows[di, : k - 1] = w[: k - 1]
            drows[di, k - 1 :] = w[k - 1 + d : k - 1 + d + k]
        del_contains, del_solid, _ = _bulk(oracle, drows)
        dkk = np.arange(1, k - 1)  # rolls 1..k-2 -> offsets 1..k-2
        dstride = (dkk % cfg.jump) == 0
        del_support = (
            (del_contains[:, 0] & del_solid[:, 0]).astype(np.int64)
            + (dstride[None, :] & del_contains[:, dkk] & del_solid[:, dkk]).sum(axis=1)
        )
        del_qual = del_support >= cfg.present_needed_deletion
        del_state[0] = cfg.max_deletions + 1 if n_tries >= len(del_lengths) else s + n_tries
    else:
        del_support = np.zeros(0, dtype=np.int64)
        del_qual = np.zeros(0, dtype=bool)

    # interleaved trial order: ins_i at rank 2i, deletion (iteration i) at 2i+1
    candidates = []  # (rank, type, support, payload)
    for i in np.nonzero(ins_qual)[0]:
        candidates.append((2 * int(i), 2, int(ins_support[i]), ins_list[int(i)]))
    for di in np.nonzero(del_qual)[0]:
        if int(di) < n_tries:  # deletion at iteration di must exist
            deleted = w[k - 1 : k - 1 + del_lengths[int(di)]].tobytes().decode()
            candidates.append((2 * int(di) + 1, 3, int(del_support[di]), deleted))
    candidates.sort(key=lambda c: c[0])
    if not candidates:
        return False

    if cfg.mode == 0:
        rank, typ, sup, payload = candidates[0]
        best.update(type=typ, indel=payload, support=sup)
        return True

    # modes 1/2: last-max wins; alt = best before the final replacement
    t_best_sup = 0
    t_alt_sup = 0
    t_best = None
    t_alt = None
    for rank, typ, sup, payload in candidates:
        if sup >= t_best_sup:
            if t_best_sup:
                t_alt, t_alt_sup = t_best, t_best_sup
            t_best, t_best_sup = (typ, payload), sup
    if (cfg.mode == 2 and t_best_sup > best["support"]) or cfg.mode == 1:
        best.update(
            type=t_best[0], indel=t_best[1], support=t_best_sup,
            alt_indel=t_alt[1] if t_alt else "",
        )
        best["altsupp1"] = t_alt_sup
    return True

#!/usr/bin/env python3
"""Benchmark: E. coli-scale polish throughput on one TPU chip.

Workload mirrors the reference demo (SURVEY.md §6): a 4,708,041 bp draft
(E. coli U00096.3 size) with ~0.001 substitution + ~0.0001 indel error
rates, k=25, Bloom filter of truth k-mers.  The metric is end-to-end
engine throughput — dense device flag pass + sparse native repair +
record generation, excluding BF construction (the reference's `ntedit`
stage also excludes ntcard/ntstat).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}
plus verification fields.  Stage breakdown, engine-identity checks, the
residual-error census, and the SNV/CBF mode benches go to stderr.

vs_baseline: the reference C++ engine cannot run here (btllib is not
installable in this environment); BASELINE_BASES_PER_SEC is the measured
throughput of our from-spec C++ scalar engine when built (native/, same
algorithm, -O3), else a documented estimate of ntEdit v2.1.1 at t=4
(~6 Mbp/s on E. coli-class inputs).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_BASES_PER_SEC = 6.0e6  # documented estimate; see module docstring
ECOLI_LEN = 4_708_041
K = 25
HERE = os.path.dirname(os.path.abspath(__file__))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measured_cpp_baseline():
    path = os.path.join(HERE, "native", "baseline.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                return float(json.load(f)["bases_per_sec"])
        except Exception:
            return None
    return None


def residual_census(edited: bytes, truth: bytes, window: int = 30,
                    max_skew: int = 12):
    """Classify every locus where the polished sequence still differs from
    the truth: resynchronizing walk, one site per divergence."""
    sites = []
    i = j = 0
    E, T = edited, truth
    while i < len(E) and j < len(T):
        if E[i] == T[j]:
            i += 1
            j += 1
            continue
        found = None
        for d in range(1, 2 * max_skew + 2):
            for di in range(min(d, max_skew) + 1):
                dj = d - di
                if dj > max_skew:
                    continue
                if E[i + di : i + di + window] == T[j + dj : j + dj + window]:
                    found = (di, dj)
                    break
            if found:
                break
        if found is None:
            sites.append({"truth_pos": j, "kind": "desync"})
            break
        di, dj = found
        kind = "sub" if di == dj else ("extra_bases" if di > dj else "missing_bases")
        sites.append({
            "truth_pos": j, "kind": kind,
            "edited": E[i : i + di].decode(), "truth": T[j : j + dj].decode(),
        })
        i += di
        j += dj
    if i < len(E) or j < len(T):
        sites.append({"truth_pos": j, "kind": "tail_len_diff",
                      "extra": len(E) - i, "missing": len(T) - j})
    return sites


def main():
    from ntedit_tpu.core import bloom
    from ntedit_tpu.engine import native_repair, wavefront
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.polish import Polisher
    from ntedit_tpu.utils import simulate

    t0 = time.time()
    truth = simulate.random_genome(ECOLI_LEN, seed=42)
    draft, injected = simulate.inject_errors(
        truth, sub_rate=1e-3, ins_rate=1e-4, del_rate=1e-4, seed=43
    )
    # framework-native blocked filter: power-of-two sizing, one HBM gather
    # per probe (see bloom.BlockedKmerBloomFilter)
    nbytes = bloom.pow2_size_bytes(ECOLI_LEN, 3, 0.001)
    bf = bloom.BlockedKmerBloomFilter.zeros(nbytes, 3, K)
    bf.insert_seq(truth)
    log(f"# setup {time.time() - t0:.1f}s: draft {len(draft)} bp, "
        f"{len(injected)} injected errors, BF {nbytes >> 20} MiB")

    cfg = EngineConfig(k=K, hash_num=3)
    pol = Polisher(bf, None, cfg)
    log(f"# repair engine: {pol.engine}")

    # warmup (compile) with the production chunk shape
    warm = pol.gate_positions(draft)
    log(f"# warmup gates: {len(warm)}")

    # --- timed runs: median of 3 (the tunneled device adds multi-hundred-
    # ms jitter per run; the C++ baseline on the local CPU has none) ---
    times = []
    for _ in range(3):
        t1 = time.time()
        res = pol.polish_contig("ecoli_sim", draft)
        times.append(time.time() - t1)
    dt = sorted(times)[1]
    bases_per_sec = len(draft) / dt

    # stage costs measured unoverlapped (the pipelined path overlaps them)
    t1 = time.time()
    hint = pol.gate_positions(draft)
    stage_gate = time.time() - t1
    t1 = time.time()
    _ = native_repair.polish_contig_segmented(
        pol.oracle.bloom, None, cfg, "ecoli_sim", draft, hint,
        threads=cfg.threads,
    )
    stage_repair = time.time() - t1
    log(f"# stages unoverlapped: gate pass {stage_gate*1e3:.0f}ms, "
        f"threaded repair {stage_repair*1e3:.0f}ms; pipelined total "
        f"{dt*1e3:.0f}ms ({bases_per_sec:,.0f} bp/s)")

    # --- engine identity at full scale: native == wavefront ---
    t4 = time.time()
    res_wf = wavefront.polish_contig_wavefront(
        pol.oracle, "ecoli_sim", bytes(draft), hint
    )
    identical = (res.edited == res_wf.edited and res.subs == res_wf.subs)
    log(f"# identity: native == wavefront: {identical} "
        f"(wavefront {time.time()-t4:.2f}s, edits={len(res.subs)})")

    # --- residual-error census: why edited != truth ---
    correct = res.edited == truth.tobytes()
    census = residual_census(res.edited, truth.tobytes())
    kinds = {}
    for s in census:
        kinds[s["kind"]] = kinds.get(s["kind"], 0) + 1
    log(f"# correct={correct}: {len(injected)} injected errors, "
        f"{len(res.subs)} sub records, {len(census)} residual sites {kinds}")
    for s in census[:5]:
        log(f"#   residual example: {s}")
    # residuals are sites where mode-0 took the first qualifying indel
    # instead of the true one, or BF FPs masked the error (the reference
    # engine has the same failure modes; see VERDICT r1 item 2)

    # --- three-way output identity on the SAME btllib-layout filter:
    # C++ scalar baseline == native repair == wavefront ---
    three_way = None
    binary = os.path.join(HERE, "native", "ntedit_baseline")
    if os.path.exists(binary):
        pbf = bloom.KmerBloomFilter.zeros(nbytes, 3, K)
        pbf.insert_seq(truth)
        with tempfile.TemporaryDirectory() as td:
            fa = os.path.join(td, "d.fa")
            with open(fa, "w") as f:
                f.write(">c\n" + draft.tobytes().decode() + "\n")
            bfp = os.path.join(td, "t.bf")
            pbf.save(bfp)
            ed = os.path.join(td, "edited.txt")
            out = subprocess.check_output([binary, fa, bfp, ed]).decode()
            with open(ed, "rb") as f:
                base_edited = f.read().rstrip(b"\n")
        from ntedit_tpu.core import nthash_ref as nh

        cfgp = EngineConfig(k=K, hash_num=3)
        polp = Polisher(pbf, None, cfgp, use_device=False)
        o = polp.oracle
        rn = native_repair.polish_contig_native(o.bloom, None, cfgp, "c", draft)
        # host-derived exact gates feed the wavefront (same as the device
        # hint, computed against the plain filter)
        fh, rh = nh.all_window_hashes(draft, K)
        hs = nh.extend_hashes_vec(nh.canonical(fh, rh), K, 3)
        gates = np.nonzero(~pbf.contains_hashes(hs))[0]
        rw = wavefront.polish_contig_wavefront(o, "c", bytes(draft), gates)
        three_way = (rn.edited == rw.edited == base_edited)
        log(f"# three-way identity (plain BF): baseline.cpp == native == "
            f"wavefront: {three_way} (baseline {json.loads(out)['seconds']}s)")
        if not three_way:
            log(f"#   native==wavefront: {rn.edited == rw.edited}; "
                f"native==baseline: {rn.edited == base_edited}; "
                f"lens {len(rn.edited)}/{len(rw.edited)}/{len(base_edited)}")

    # --- mode-family side benches (1 Mbp slices; stderr JSON) ---
    try:
        from ntedit_tpu.core import nthash_ref as nh

        sl = 1_000_000
        tr_s = truth[:sl]
        dr_s = draft[:sl]
        # SNV mode through the device candidate fast path
        cfg_snv = EngineConfig(k=K, hash_num=3, snv=True)
        pol_snv = Polisher(bf, None, cfg_snv)
        rs = pol_snv.polish_contig("s", dr_s)  # warm (compile)
        t5 = time.time()
        rs = pol_snv.polish_contig("s", dr_s)
        log(json.dumps({"metric": "bases_snv_per_sec_chip_1mbp",
                        "value": round(sl / (time.time() - t5), 1),
                        "unit": "bases/s", "records": len(rs.subs)}))
        # CBF coverage mode
        cbf = bloom.KmerCountingBloomFilter8.zeros(nbytes, 3, K)
        fh, rh = nh.all_window_hashes(tr_s, K)
        hs = nh.extend_hashes_vec(nh.canonical(fh, rh), K, 3)
        for _ in range(3):
            cbf.insert_hashes(hs)
        cfg_cbf = EngineConfig(k=K, hash_num=3, min_threshold=2)
        oc = Polisher(cbf, None, cfg_cbf, use_device=False).oracle
        t6 = time.time()
        rc = native_repair.polish_contig_native(oc.bloom, None, cfg_cbf, "c", dr_s)
        log(json.dumps({"metric": "bases_cbf_polish_per_sec_chip_1mbp",
                        "value": round(sl / (time.time() - t6), 1),
                        "unit": "bases/s", "edits": len(rc.subs)}))
    except Exception as exc:  # side benches must never sink the headline
        log(f"# mode-family benches skipped: {exc}")

    baseline = measured_cpp_baseline() or BASELINE_BASES_PER_SEC
    print(json.dumps({
        "metric": "bases_polished_per_sec_chip_ecoli_k25",
        "value": round(bases_per_sec, 1),
        "unit": "bases/s",
        "vs_baseline": round(bases_per_sec / baseline, 3),
        "identical_to_wavefront": bool(identical),
        "three_way_identical": three_way,
        "gate_ms": round(stage_gate * 1e3, 1),
        "repair_ms": round(stage_repair * 1e3, 1),
    }))


if __name__ == "__main__":
    main()

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


def measured_cpp_baseline(key: str = "bases_per_sec"):
    path = os.path.join(HERE, "native", "baseline.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                return float(json.load(f)[key])
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


def wait_device(max_wait: float = 240.0, probe_timeout: float = 45.0) -> bool:
    """The tunneled device wedges intermittently (PERF.md): even trivial
    transfers hang for minutes, then recover.  Probe with a tiny op in a
    SUBPROCESS (so a hung probe never poisons this process's backend) and
    retry; if the device never responds, fall back to the virtual CPU
    backend so the bench still produces an honest, clearly-flagged line."""
    probe_src = (
        "import numpy as np, jax; "
        "x = jax.device_put(np.arange(8)); print(int(x.sum()))"
    )
    deadline = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe_src],
                capture_output=True, timeout=probe_timeout, text=True,
            )
            if out.returncode == 0 and "28" in out.stdout:
                if attempt > 1:
                    log(f"# device responsive after {attempt} probes")
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            log("# WARNING: device unresponsive after "
                f"{max_wait:.0f}s of probing — falling back to the CPU "
                "backend (device_unavailable flagged in the JSON line)")
            import jax

            jax.config.update("jax_platforms", "cpu")
            return False
        log(f"# device probe {attempt} timed out; retrying "
            f"(tunnel wedge — see PERF.md)")
        time.sleep(20)


def main():
    device_ok = wait_device()
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
    native_ok = native_repair.available()
    log(f"# repair engine: {pol.engine} (native lib: {native_ok})")

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
    stage_repair = 0.0
    if native_ok:
        t1 = time.time()
        _ = native_repair.polish_contig_segmented(
            pol.oracle.bloom, None, cfg, "ecoli_sim", draft, hint,
            threads=cfg.threads,
        )
        stage_repair = time.time() - t1
    log(f"# stages unoverlapped: gate pass {stage_gate*1e3:.0f}ms, "
        f"threaded repair {stage_repair*1e3:.0f}ms; pipelined total "
        f"{dt*1e3:.0f}ms ({bases_per_sec:,.0f} bp/s)")

    # --- engine identity at full scale: native == wavefront; plus the
    # sequential spec oracle directly on a 1 Mbp slice (the full-contig
    # oracle run takes ~21 s and is covered transitively: wavefront ==
    # oracle is property-tested, and a full-scale run verified identical
    # once — see PERF.md) ---
    t4 = time.time()
    res_wf = wavefront.polish_contig_wavefront(
        pol.oracle, "ecoli_sim", bytes(draft), hint
    )
    identical = (res.edited == res_wf.edited and res.subs == res_wf.subs)
    log(f"# identity: native == wavefront: {identical} "
        f"(wavefront {time.time()-t4:.2f}s, edits={len(res.subs)})")
    sl0 = 1_000_000
    hint0 = hint[hint < sl0 - K]
    res_or = pol.oracle.polish_contig("s", bytes(draft[:sl0]), gate_hint=hint0)
    if native_ok:
        res_sl = native_repair.polish_contig_native(
            pol.oracle.bloom, None, cfg, "s", draft[:sl0], gate_hint=hint0)
        identical_oracle = (
            res_sl is not None
            and res_sl.edited == res_or.edited and res_sl.subs == res_or.subs
        )
        log(f"# identity: native == sequential oracle (1 Mbp direct): "
            f"{identical_oracle}")
    else:
        res_wf0 = wavefront.polish_contig_wavefront(
            pol.oracle, "s", bytes(draft[:sl0]), hint0)
        identical_oracle = (
            res_wf0.edited == res_or.edited and res_wf0.subs == res_or.subs
        )
        log(f"# identity: wavefront == sequential oracle (1 Mbp direct, "
            f"no native lib): {identical_oracle}")

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
    # C++ scalar baseline == native repair == wavefront.  The baseline
    # binary is also TIMED here (median of 3): this host's CPU speed
    # varies run to run, so the honest denominator is measured at the
    # same moment as our own numbers ---
    three_way = None
    baseline_live = None
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
            runs = []
            for _ in range(3):
                out = subprocess.check_output([binary, fa, bfp, ed]).decode()
                runs.append(json.loads(out))
            base_stats = sorted(runs, key=lambda r: r["seconds"])[1]
            baseline_live = float(base_stats["bases_per_sec"])
            with open(ed, "rb") as f:
                base_edited = f.read().rstrip(b"\n")
        from ntedit_tpu.core import nthash_ref as nh

        cfgp = EngineConfig(k=K, hash_num=3)
        polp = Polisher(pbf, None, cfgp, use_device=False)
        o = polp.oracle
        rn = (
            native_repair.polish_contig_native(o.bloom, None, cfgp, "c", draft)
            if native_ok else None
        )
        # host-derived exact gates feed the wavefront (same as the device
        # hint, computed against the plain filter)
        fh, rh = nh.all_window_hashes(draft, K)
        hs = nh.extend_hashes_vec(nh.canonical(fh, rh), K, 3)
        gates = np.nonzero(~pbf.contains_hashes(hs))[0]
        rw = wavefront.polish_contig_wavefront(o, "c", bytes(draft), gates)
        three_way = (
            rn is not None and rn.edited == rw.edited == base_edited
            if native_ok else rw.edited == base_edited
        )
        log(f"# three-way identity (plain BF): baseline.cpp == native == "
            f"wavefront: {three_way} (baseline {base_stats['seconds']}s = "
            f"{baseline_live:,.0f} bp/s live)")
        if not three_way and rn is not None:
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
        # CBF coverage mode through the device gate pass (counting probes)
        cbf = bloom.KmerCountingBloomFilter8.zeros(nbytes, 3, K)
        fh, rh = nh.all_window_hashes(tr_s, K)
        hs = nh.extend_hashes_vec(nh.canonical(fh, rh), K, 3)
        for _ in range(3):
            cbf.insert_hashes(hs)
        cfg_cbf = EngineConfig(k=K, hash_num=3, min_threshold=2)
        pol_cbf = Polisher(cbf, None, cfg_cbf)
        rc = pol_cbf.polish_contig("c", dr_s)  # warm (compile)
        t6 = time.time()
        rc = pol_cbf.polish_contig("c", dr_s)
        log(json.dumps({"metric": "bases_cbf_polish_per_sec_chip_1mbp",
                        "value": round(sl / (time.time() - t6), 1),
                        "unit": "bases/s", "edits": len(rc.subs)}))
    except Exception as exc:  # side benches must never sink the headline
        log(f"# mode-family benches skipped: {exc}")

    baseline = baseline_live or measured_cpp_baseline() or BASELINE_BASES_PER_SEC
    print(json.dumps({
        "metric": "bases_polished_per_sec_chip_ecoli_k25",
        "value": round(bases_per_sec, 1),
        "unit": "bases/s",
        "vs_baseline": round(bases_per_sec / baseline, 3),
        "identical_to_wavefront": bool(identical),
        "identical_to_oracle": bool(identical_oracle),
        "three_way_identical": three_way,
        "gate_ms": round(stage_gate * 1e3, 1),
        "repair_ms": round(stage_repair * 1e3, 1),
        "device_unavailable": (not device_ok) or None,
    }))


def _run_section(flag_arg: str, timeout_s: float, retries: int):
    """Run a bench section in a subprocess (wedge isolation — a killed
    attempt poisons only its own process); returns the section's JSON
    record or None."""
    for attempt in range(1, retries + 1):
        try:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__), flag_arg],
                capture_output=True, text=True, timeout=timeout_s,
            )
            for ln in child.stderr.splitlines():
                if "WARNING" not in ln:
                    log(ln)
            out = child.stdout.strip().splitlines()
            if not out:
                log(f"# section {flag_arg} attempt {attempt}: no output "
                    f"(device unavailable for the whole attempt)")
                continue
            return json.loads(out[-1])
        except Exception as exc:
            log(f"# section {flag_arg} attempt {attempt} failed: "
                f"{type(exc).__name__}")
    return None


def orchestrate():
    """Default entry: every device-touching section runs in its own
    subprocess with a hard timeout and one retry, so a tunnel wedge at
    any point costs one section attempt, never the headline line."""
    rec = _run_section("--ecoli-only", 480.0, 2)
    scale = _run_section("--scale-only", 780.0, 2)
    giant = _run_section("--giant-only", 900.0, 2)
    if rec is None:
        rec = {
            "metric": "bases_polished_per_sec_chip_ecoli_k25",
            "value": 0.0, "unit": "bases/s", "vs_baseline": 0.0,
            "device_unavailable": True,
        }
    if scale is not None:
        log(json.dumps(scale))
        rec["scale_50mbp_vs_baseline"] = scale.get("vs_baseline")
        rec["scale_50mbp_vs_reference_engine"] = scale.get("vs_reference_engine")
    else:
        rec["scale_50mbp_vs_baseline"] = None
    if giant is not None:
        log(json.dumps(giant))
        rec["scale_250mbp_vs_baseline"] = giant.get("vs_baseline")
    print(json.dumps(rec))


def _build_scale_corpus(scale: int, seed: int):
    """Simulated draft + device-built blocked filter at `scale` bp."""
    from ntedit_tpu.core import bfbuild, bloom
    from ntedit_tpu.utils import simulate

    truth = simulate.random_genome(scale, seed=seed)
    draft, _ = simulate.inject_errors(
        truth, sub_rate=1e-3, ins_rate=1e-4, del_rate=1e-4, seed=seed + 1
    )
    # the device BUILDER scatters per-BIT byte indices (int32): cap at
    # 2^31 bits = 256 MiB.  At 250 Mbp that is ~8.6 bits/k-mer (FPR
    # ~2.5%) — more gates to repair, identically for both engines (they
    # probe the same artifact), so the ratio stays honest
    nbits = min(bloom.pow2_size_bytes(scale, 3, 0.001) * 8, 1 << 31)
    builder = bfbuild.DeviceFilterBuilder(K, 3, nbits, 1 << 10)
    B = bfbuild._DEV_BATCH
    for s in range(0, scale, B):
        builder.insert_batch(truth[s : min(scale, s + B + K - 1)], 1)
    return truth, draft, builder.finish(), nbits


def _plain_bf_artifacts(truth, scale: int, nbits: int, td: str, draft):
    """Plain btllib-layout filter + FASTA on disk for the C++ engines,
    built on device (host insert at this scale costs minutes)."""
    import jax
    import jax.numpy as jnp

    from ntedit_tpu.core import bfbuild, bloom
    from ntedit_tpu.parallel import mesh as pmesh

    B = bfbuild._DEV_BATCH
    acc = None
    or_ = jax.jit(jnp.bitwise_or)
    for s in range(0, scale, B):
        row = np.zeros(B + K - 1, dtype=np.uint8)
        chunk = truth[s : min(scale, s + B + K - 1)]
        row[: len(chunk)] = chunk
        w = pmesh.build_bf_words(jnp.asarray(row[None]), K, 3, nbits)
        acc = w if acc is None else or_(acc, w)
    pbf = bloom.KmerBloomFilter(np.asarray(acc).view(np.uint8).copy(), 3, K)
    fa = os.path.join(td, "d.fa")
    with open(fa, "w") as f:
        f.write(">c\n" + draft.tobytes().decode() + "\n")
    bfp = os.path.join(td, "t.bf")
    pbf.save(bfp)
    return fa, bfp


def _time_binary(cmd, runs: int):
    """Median wall-clock of `runs` executions (live denominator: this
    host's CPU speed varies run to run)."""
    times = []
    for _ in range(runs):
        t = time.time()
        subprocess.run(cmd, check=True, capture_output=True)
        times.append(time.time() - t)
    return sorted(times)[len(times) // 2]


def scale_main():
    """--scale-only: the 50 Mbp scale section, isolated in its own
    process.  Both C++ denominators run on the SAME 50 Mbp workload (the
    128 MiB filter misses cache exactly like ours), timed live:
    ntedit_baseline (median of 5) and the UNMODIFIED reference engine
    itself (native/reference_ntedit, median of 3).  Prints one JSON line
    on stdout; progress on stderr."""
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.polish import Polisher

    if not wait_device(max_wait=480.0):
        # the 50 Mbp build/polish is sized for the chip; on the CPU
        # fallback it cannot finish inside the section budget — skip
        # (the orchestrator reports scale_50mbp_vs_baseline: null)
        log("# scale section skipped: device unavailable")
        raise SystemExit(1)
    SCALE = 50_000_000
    t7 = time.time()
    truth50, draft50, bf50, nbits50 = _build_scale_corpus(SCALE, seed=52)
    cfg = EngineConfig(k=K, hash_num=3)
    pol50 = Polisher(bf50, None, cfg)
    log(f"# scale setup {time.time()-t7:.1f}s: 50 Mbp draft, "
        f"BF {nbits50>>23} MiB (device-built)")
    r50 = pol50.polish_contig("chr", draft50)  # warm
    t50 = []
    for _ in range(3):
        t8 = time.time()
        r50 = pol50.polish_contig("chr", draft50)
        t50.append(time.time() - t8)
    dt50 = sorted(t50)[1]

    baseline50 = None
    ref50 = None
    binary = os.path.join(HERE, "native", "ntedit_baseline")
    ref_bin = os.path.join(HERE, "native", "reference_ntedit")
    if os.path.exists(binary):
        try:
            with tempfile.TemporaryDirectory() as td:
                fa, bfp = _plain_bf_artifacts(truth50, SCALE, nbits50, td, draft50)
                dt_base = _time_binary([binary, fa, bfp], 5)
                baseline50 = SCALE / dt_base
                log(f"# 50 Mbp C++ baseline (live, median of 5): "
                    f"{baseline50:,.0f} bp/s ({dt_base:.2f}s)")
                if os.path.exists(ref_bin):
                    dt_ref = _time_binary(
                        [ref_bin, "-f", fa, "-r", bfp, "-b",
                         os.path.join(td, "ref"), "-t", "4"], 3)
                    ref50 = SCALE / dt_ref
                    log(f"# 50 Mbp REFERENCE engine (unmodified ntedit.cpp, "
                        f"live, median of 3, -t 4): {ref50:,.0f} bp/s "
                        f"({dt_ref:.2f}s)")
        except Exception as exc:
            log(f"# 50 Mbp baseline measurement skipped: {exc}")
    baseline50 = (
        baseline50
        or measured_cpp_baseline("bases_per_sec_50mbp")
        or measured_cpp_baseline()
        or BASELINE_BASES_PER_SEC
    )
    rec = {
        "metric": "bases_polished_per_sec_chip_50mbp_k25",
        "value": round(SCALE / dt50, 1), "unit": "bases/s",
        "vs_baseline": round(SCALE / dt50 / baseline50, 2),
        "edits": len(r50.subs),
        "wall_ms": round(dt50 * 1e3, 1),
    }
    if ref50:
        rec["vs_reference_engine"] = round(SCALE / dt50 / ref50, 2)
    print(json.dumps(rec))


def giant_main():
    """--giant-only: a 250 Mbp single-contig polish (human-chromosome
    class) — device-built 512 MiB filter, one packed upload, streamed
    chunked dense pass, threaded repair.  The C++ baseline runs once on
    the same corpus (its wall-clock alone exceeds our whole section)."""
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.polish import Polisher

    if not wait_device(max_wait=480.0):
        log("# giant section skipped: device unavailable")
        raise SystemExit(1)
    SCALE = 250_000_000
    t0 = time.time()
    truth, draft, bf, nbits = _build_scale_corpus(SCALE, seed=72)
    cfg = EngineConfig(k=K, hash_num=3)
    pol = Polisher(bf, None, cfg)
    log(f"# giant setup {time.time()-t0:.1f}s: 250 Mbp draft, "
        f"BF {nbits>>23} MiB (device-built)")
    import resource

    r = pol.polish_contig("chr1", draft)  # warm
    times = []
    for _ in range(2):
        t1 = time.time()
        r = pol.polish_contig("chr1", draft)
        times.append(time.time() - t1)
    dt = min(times)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log(f"# 250 Mbp polish: {dt:.2f}s ({SCALE/dt:,.0f} bp/s), "
        f"{len(r.subs)} records, peak RSS {rss:.1f} GB")

    baseline = None
    binary = os.path.join(HERE, "native", "ntedit_baseline")
    if os.path.exists(binary):
        try:
            with tempfile.TemporaryDirectory() as td:
                fa, bfp = _plain_bf_artifacts(truth, SCALE, nbits, td, draft)
                dt_base = _time_binary([binary, fa, bfp], 1)
                baseline = SCALE / dt_base
                log(f"# 250 Mbp C++ baseline (live, 1 run): "
                    f"{baseline:,.0f} bp/s ({dt_base:.1f}s)")
        except Exception as exc:
            log(f"# 250 Mbp baseline measurement skipped: {exc}")
    baseline = baseline or measured_cpp_baseline() or BASELINE_BASES_PER_SEC
    print(json.dumps({
        "metric": "bases_polished_per_sec_chip_250mbp_k25",
        "value": round(SCALE / dt, 1), "unit": "bases/s",
        "vs_baseline": round(SCALE / dt / baseline, 2),
        "edits": len(r.subs),
        "wall_ms": round(dt * 1e3, 1),
        "peak_rss_gb": round(rss, 2),
    }))


if __name__ == "__main__":
    if "--scale-only" in sys.argv:
        scale_main()
    elif "--giant-only" in sys.argv:
        giant_main()
    elif "--ecoli-only" in sys.argv:
        main()
    else:
        orchestrate()

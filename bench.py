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
Sections: --ecoli-only (4.7 Mbp, identity asserts), --scale-only
(50 Mbp + sharded D=1 + cand A/B + C++ denominators), --giant-only
(250 Mbp, 1 GiB filter), --human-only (3 Gbp over 24 contigs, 4 GiB
on-device-built filter — the BASELINE.md north-star workload).

Denominators are LIVE: our from-spec scalar C++ baseline
(native/ntedit_baseline) and the UNMODIFIED reference engine compiled
against the btllib-compat shim (native/reference_ntedit,
`vs_reference_engine`) — both timed on the same artifacts at the same
moment as our runs.
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
    device_ok = wait_device(max_wait=600.0)
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

    # --- timed runs: median of 5 (VERDICT r3 #6 — the tunneled device
    # adds multi-hundred-ms jitter per run; medians on BOTH sides keep
    # the headline within noise round over round) ---
    times = []
    for _ in range(5):
        t1 = time.time()
        res = pol.polish_contig("ecoli_sim", draft)
        times.append(time.time() - t1)
    dt = sorted(times)[2]
    bases_per_sec = len(draft) / dt

    # Pallas fused prep kernel, captured every round (VERDICT r3 #4):
    # opt-in in production (PERF.md); measured here so the decision
    # stays data-backed on this chip
    pallas_ms = None
    try:
        from ntedit_tpu.ops import flag_kernel

        g_pl = flag_kernel.flag_contig_gates_pallas(draft, pol.df)  # compile
        tp = []
        for _ in range(3):
            t1 = time.time()
            g_pl = flag_kernel.flag_contig_gates_pallas(draft, pol.df)
            tp.append(time.time() - t1)
        pallas_ms = sorted(tp)[1] * 1e3
        g_x = pol.gate_positions(draft)
        log(f"# pallas prep kernel: {pallas_ms:.0f} ms (gates identical "
            f"to XLA path: {np.array_equal(g_pl, g_x)})")
    except Exception as exc:
        log(f"# pallas timing skipped: {exc}")

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
            for _ in range(5):  # median-of-5 both sides (VERDICT r3 #6)
                out = subprocess.check_output([binary, fa, bfp, ed]).decode()
                runs.append(json.loads(out))
            base_stats = sorted(runs, key=lambda r: r["seconds"])[2]
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
        "pallas_gate_ms": round(pallas_ms, 1) if pallas_ms else None,
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
    rec = _run_section("--ecoli-only", 700.0, 2)
    scale = _run_section("--scale-only", 1500.0, 2)
    giant = _run_section("--giant-only", 1600.0, 2)
    human = _run_section("--human-only", 3000.0, 1)
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
        rec["scale_250mbp_vs_reference_engine"] = giant.get(
            "vs_reference_engine")
        rec["scale_250mbp_vs_baseline"] = giant.get("vs_baseline")
    if human is not None:
        log(json.dumps(human))
        rec["scale_3gbp_vs_reference_engine"] = human.get(
            "vs_reference_engine")
        rec["scale_3gbp_bp_per_sec"] = human.get("value")
    print(json.dumps(rec))


def _build_scale_corpus(scale: int, seed: int, plain_too: bool = False):
    """Simulated draft + device-built filter(s) at `scale` bp.

    Properly sized (pow2 Broder-Mitzenmacher at fpr 0.001) — the old
    2^31-bit cap is gone (scatter-OR build, bfbuild.scatter_or_words).
    With plain_too, a btllib-layout twin for the C++ engines is built in
    the SAME pass (each truth batch uploaded once, fed to both builders).

    Returns (truth, draft, blocked_host, blocked_df, plain_host|None)."""
    import jax.numpy as jnp

    from ntedit_tpu.core import bfbuild, bloom
    from ntedit_tpu.utils import simulate

    truth = simulate.random_genome(scale, seed=seed)
    draft, _ = simulate.inject_errors(
        truth, sub_rate=1e-3, ins_rate=1e-4, del_rate=1e-4, seed=seed + 1
    )
    nbits = bloom.pow2_size_bytes(scale, 3, 0.001) * 8
    bb = bfbuild.DeviceFilterBuilder(K, 3, nbits, 1 << 10)
    pb = (
        bfbuild.DeviceFilterBuilder(K, 3, nbits, 1 << 10, layout="plain")
        if plain_too else None
    )
    B = bfbuild._DEV_BATCH
    t_build = time.time()
    for s in range(0, scale, B):
        if s:
            log(f"#   build batch {s // B}/{-(-scale // B)} "
                f"({time.time() - t_build:.0f}s)")
        # pad the tail batch to the uniform shape: ONE compiled insert
        # program per layout per section (each first-compile costs
        # minutes over the tunnel); pad bytes are 0x00 = invalid windows
        chunk = truth[s : min(scale, s + B + K - 1)]
        if len(chunk) < B + K - 1:
            chunk = np.concatenate(
                [chunk, np.zeros(B + K - 1 - len(chunk), np.uint8)])
        enc = bb.encode_batch(chunk)
        bb.insert_batch(enc, 1)
        if pb is not None:
            pb.insert_batch(enc, 1)
    words_dev = bb.device_words()
    blocked = bb.finish()
    df = bloom.DeviceFilter(words_dev, None, nbits, 0, 3, K, False,
                            blocked=True)
    plain = pb.finish() if pb is not None else None
    return truth, draft, blocked, df, plain


def _download_words(words_dev, piece: int = 1 << 26):
    """Chunked D2H of a big device word array (one multi-GiB transfer
    RPC stalls on the tunnel far more often than a sequence of 256 MiB
    pieces; progress is visible per piece)."""
    n = words_dev.shape[0]
    out = np.empty(n, dtype=np.uint32)
    for s in range(0, n, piece):
        e = min(n, s + piece)
        out[s:e] = np.asarray(words_dev[s:e])
        if n > piece:
            log(f"#   download {e * 4 >> 20}/{n * 4 >> 20} MiB")
    return out


def _cpp_artifacts(plain_bf, draft, td: str, header: str = "c"):
    """FASTA + plain-layout .bf on disk for the C++ engines."""
    fa = os.path.join(td, "d.fa")
    with open(fa, "w") as f:
        if draft.ndim == 1:
            f.write(f">{header}\n" + draft.tobytes().decode() + "\n")
        else:
            raise ValueError("1-D draft expected")
    bfp = os.path.join(td, "t.bf")
    plain_bf.save(bfp)
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
    256 MiB filter misses cache exactly like ours), timed live:
    ntedit_baseline (median of 5) and the UNMODIFIED reference engine
    itself (native/reference_ntedit, median of 3).  Also times the
    production sharded path on a 1-device mesh (byte-equality asserted)
    and the device candidate-mask variant.  Prints one JSON line on
    stdout; progress on stderr."""
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.polish import Polisher

    if not wait_device(max_wait=900.0):
        # the 50 Mbp build/polish is sized for the chip; on the CPU
        # fallback it cannot finish inside the section budget — skip
        # (the orchestrator reports scale_50mbp_vs_baseline: null)
        log("# scale section skipped: device unavailable")
        raise SystemExit(1)
    SCALE = 50_000_000
    t7 = time.time()
    truth50, draft50, bf50, df50, plain50 = _build_scale_corpus(
        SCALE, seed=52, plain_too=True)
    cfg = EngineConfig(k=K, hash_num=3)
    pol50 = Polisher(bf50, None, cfg, df=df50)
    log(f"# scale setup {time.time()-t7:.1f}s: 50 Mbp draft, "
        f"BF {bf50.bits>>23} MiB blocked + plain twin (device-built, "
        f"one pass)")
    r50 = pol50.polish_contig("chr", draft50)  # warm
    t50 = []
    for _ in range(3):
        t8 = time.time()
        r50 = pol50.polish_contig("chr", draft50)
        t50.append(time.time() - t8)
    dt50 = sorted(t50)[1]

    # device candidate-mask pre-verification: time the threaded segment
    # repair with vs without masks (the masks only matter when repair is
    # the wall — the pipelined headline overlaps it, so this is the
    # honest A/B for the default decision; PERF.md)
    dt_cand = dt_seg0 = None
    try:
        from ntedit_tpu.engine import flag as _flag
        from ntedit_tpu.engine import native_repair as _nr

        hint50 = pol50.gate_positions(draft50)
        _flag.polish_candidate_masks(draft50, df50, hint50)  # warm
        t8 = time.time()
        masks = _flag.polish_candidate_masks(draft50, df50, hint50)
        r_cand = _nr.polish_contig_segmented(
            bf50, None, cfg, "chr", bytes(draft50), hint50,
            threads=cfg.threads, gate_cand=masks)
        dt_cand = time.time() - t8
        t9 = time.time()
        r_seg0 = _nr.polish_contig_segmented(
            bf50, None, cfg, "chr", bytes(draft50), hint50,
            threads=cfg.threads)
        dt_seg0 = time.time() - t9
        same = (r_cand is not None and r_seg0 is not None
                and r_cand.edited == r50.edited == r_seg0.edited)
        log(f"# 50 Mbp segmented repair: {dt_seg0:.2f}s plain vs "
            f"{dt_cand:.2f}s with device cand-masks (identical: {same})")
        if not same:
            dt_cand = dt_seg0 = None
    except Exception as exc:
        log(f"# cand-mask A/B skipped: {exc}")

    # production sharded path, 1-device mesh (VERDICT r3 #5): the
    # multi-chip code path timed on the real chip, byte-equal asserted
    dt_sh = None
    try:
        from ntedit_tpu.parallel import mesh as pmesh

        mesh1 = pmesh.make_mesh(1)
        r_sh = pmesh.sharded_polish(
            mesh1, "chr", draft50, bf50, df50.words, cfg, chunk=1 << 21)
        t8 = time.time()
        r_sh = pmesh.sharded_polish(
            mesh1, "chr", draft50, bf50, df50.words, cfg, chunk=1 << 21)
        dt_sh = time.time() - t8
        same = r_sh.edited == r50.edited and r_sh.subs == r50.subs
        log(f"# 50 Mbp sharded_polish D=1: {dt_sh:.2f}s "
            f"(identical to Polisher: {same})")
        if not same:
            dt_sh = None
    except Exception as exc:
        log(f"# sharded_polish timing skipped: {exc}")

    baseline50 = None
    ref50 = None
    binary = os.path.join(HERE, "native", "ntedit_baseline")
    ref_bin = os.path.join(HERE, "native", "reference_ntedit")
    if os.path.exists(binary):
        try:
            with tempfile.TemporaryDirectory() as td:
                fa, bfp = _cpp_artifacts(plain50, draft50, td)
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
    if dt_sh:
        rec["sharded_d1_wall_ms"] = round(dt_sh * 1e3, 1)
    if dt_cand and dt_seg0:
        rec["repair_cand_ms"] = round(dt_cand * 1e3, 1)
        rec["repair_plain_ms"] = round(dt_seg0 * 1e3, 1)
    if ref50:
        rec["vs_reference_engine"] = round(SCALE / dt50 / ref50, 2)
    print(json.dumps(rec))


def giant_main():
    """--giant-only: a 250 Mbp single-contig polish (human-chromosome
    class) — properly-sized 1 GiB device-built filter (the old 2^31-bit
    cap is gone), one packed upload, streamed chunked dense pass,
    threaded repair.  The UNMODIFIED reference engine runs once on the
    same corpus as the denominator of record (its single run alone is
    several minutes; the scalar ntedit_baseline curve lives in the
    50 Mbp section)."""
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.polish import Polisher

    if not wait_device(max_wait=900.0):
        log("# giant section skipped: device unavailable")
        raise SystemExit(1)
    SCALE = 250_000_000
    t0 = time.time()
    truth, draft, bf, df, plain = _build_scale_corpus(
        SCALE, seed=72, plain_too=True)
    cfg = EngineConfig(k=K, hash_num=3)
    pol = Polisher(bf, None, cfg, df=df)
    log(f"# giant setup {time.time()-t0:.1f}s: 250 Mbp draft, "
        f"BF {bf.bits>>23} MiB blocked + plain twin (device-built)")
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

    ref = None
    ref_bin = os.path.join(HERE, "native", "reference_ntedit")
    if os.path.exists(ref_bin):
        try:
            with tempfile.TemporaryDirectory() as td:
                fa, bfp = _cpp_artifacts(plain, draft, td)
                dt_ref = _time_binary(
                    [ref_bin, "-f", fa, "-r", bfp, "-b",
                     os.path.join(td, "ref"), "-t", "4"], 1)
                ref = SCALE / dt_ref
                log(f"# 250 Mbp REFERENCE engine (unmodified ntedit.cpp, "
                    f"live, 1 run, -t 4): {ref:,.0f} bp/s ({dt_ref:.1f}s)")
        except Exception as exc:
            log(f"# 250 Mbp reference measurement skipped: {exc}")
    rec = {
        "metric": "bases_polished_per_sec_chip_250mbp_k25",
        "value": round(SCALE / dt, 1), "unit": "bases/s",
        "edits": len(r.subs),
        "wall_ms": round(dt * 1e3, 1),
        "peak_rss_gb": round(rss, 2),
    }
    if ref:
        rec["vs_reference_engine"] = round(SCALE / dt / ref, 2)
        rec["vs_baseline"] = rec["vs_reference_engine"]
    else:
        rec["vs_baseline"] = round(
            SCALE / dt / (measured_cpp_baseline() or BASELINE_BASES_PER_SEC), 2)
    print(json.dumps(rec))


def human_main():
    """--human-only: the stated north-star workload (BASELINE.md) — a
    3 Gbp, 24-contig human-scale draft with a 4 GiB (2^35-bit) filter,
    both BUILT ON THE CHIP (blocked for our engine + the plain btllib
    layout for the reference, one pass over the truth stream), polished
    contig-streamed, with the unmodified reference engine timed live on
    the first 2 contigs (250 Mbp) of the SAME corpus/filter as the
    per-base denominator (a full 3 Gbp reference run is ~1 h on this
    2-core host — the 250 Mbp slice is the honest affordable sample; at
    fixed filter size the scalar engine's per-base rate is scale-free,
    and -t 4 over 2 contigs saturates both cores exactly like the full
    run would).  Prints one JSON line on stdout."""
    import jax.numpy as jnp

    from ntedit_tpu.core import bfbuild, bloom
    from ntedit_tpu.engine.config import EngineConfig
    from ntedit_tpu.engine.polish import Polisher
    from ntedit_tpu.utils import simulate

    mini = os.environ.get("NTEDIT_BENCH_MINI") == "1"  # CPU shakeout
    if not mini and not wait_device(max_wait=900.0):
        log("# human section skipped: device unavailable")
        raise SystemExit(1)
    if mini:
        N_CONTIGS, CLEN, NBITS = 3, 1 << 20, 1 << 22
    else:
        N_CONTIGS, CLEN = 24, 125_000_000
        NBITS = 1 << 35  # 4 GiB: the SURVEY §5.8 human-read-set sizing
    TOTAL = N_CONTIGS * CLEN
    t0 = time.time()
    bb = bfbuild.DeviceFilterBuilder(K, 3, NBITS, 1 << 10)
    pb = bfbuild.DeviceFilterBuilder(K, 3, NBITS, 1 << 10, layout="plain")
    drafts = []
    B = bfbuild._DEV_BATCH
    for c in range(N_CONTIGS):
        truth = simulate.random_genome(CLEN, seed=5000 + c)
        draft, _ = simulate.inject_errors(
            truth, sub_rate=1e-3, ins_rate=1e-4, del_rate=1e-4,
            seed=6000 + c,
        )
        drafts.append(draft)
        for s in range(0, CLEN, B):
            chunk = truth[s : min(CLEN, s + B + K - 1)]
            if len(chunk) < B + K - 1:  # one compiled shape per layout
                chunk = np.concatenate(
                    [chunk, np.zeros(B + K - 1 - len(chunk), np.uint8)])
            enc = bb.encode_batch(chunk)
            bb.insert_batch(enc, 1)
            pb.insert_batch(enc, 1)
        del truth
        if c % 6 == 0:
            log(f"# human build: contig {c + 1}/{N_CONTIGS} "
                f"({time.time() - t0:.0f}s)")
    words_dev = bb.device_words()
    t_dl = time.time()
    host_words = _download_words(words_dev)  # host repair probes need it
    bb.words = None
    blocked = bloom.BlockedKmerBloomFilter(host_words, 3, K)
    log(f"# blocked filter download: {time.time() - t_dl:.0f}s "
        f"({host_words.nbytes >> 30} GiB)")
    df = bloom.DeviceFilter(words_dev, None, NBITS, 0, 3, K, False,
                            blocked=True)
    log(f"# human setup {time.time() - t0:.0f}s: {TOTAL / 1e9:.2f} Gbp "
        f"over {N_CONTIGS} contigs, filter 2^{NBITS.bit_length() - 1} bits "
        f"= {NBITS >> 33} GiB (blocked + plain twins, device-built)")

    import resource

    cfg = EngineConfig(k=K, hash_num=3)
    pol = Polisher(blocked, None, cfg, df=df)
    _ = pol.polish_contig("warm", drafts[0][: min(CLEN, 4_194_304) + K])  # compile
    t1 = time.time()
    edits = 0
    for c, draft in enumerate(drafts):
        r = pol.polish_contig(f"chr{c + 1}", draft)
        edits += len(r.subs)
        del r
    dt = time.time() - t1
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log(f"# 3 Gbp polish: {dt:.1f}s ({TOTAL / dt:,.0f} bp/s), "
        f"{edits} records, peak RSS {rss:.1f} GB")

    ref = None
    ref_bp = 2 * CLEN
    ref_bin = os.path.join(HERE, "native", "reference_ntedit")
    try:
        t_dl = time.time()
        plain_words = _download_words(pb.device_words())
        pb.words = None
        plain = bloom.KmerBloomFilter(plain_words.view(np.uint8), 3, K)
        log(f"# plain filter download: {time.time() - t_dl:.0f}s")
        if os.path.exists(ref_bin):
            with tempfile.TemporaryDirectory() as td:
                fa = os.path.join(td, "d.fa")
                with open(fa, "w") as f:
                    for c in range(2):
                        f.write(f">chr{c + 1}\n"
                                + drafts[c].tobytes().decode() + "\n")
                bfp = os.path.join(td, "t.bf")
                plain.save(bfp)
                del plain
                dt_ref = _time_binary(
                    [ref_bin, "-f", fa, "-r", bfp, "-b",
                     os.path.join(td, "ref"), "-t", "4"], 1)
                ref = ref_bp / dt_ref
                log(f"# REFERENCE engine on 250 Mbp of the corpus (4 GiB "
                    f"filter, -t 4 over 2 contigs = both cores, 1 run): "
                    f"{ref:,.0f} bp/s ({dt_ref:.0f}s)")
    except Exception as exc:
        log(f"# human reference measurement skipped: {exc}")

    rec = {
        "metric": "bases_polished_per_sec_chip_3gbp_k25",
        "value": round(TOTAL / dt, 1), "unit": "bases/s",
        "edits": edits,
        "wall_ms": round(dt * 1e3, 1),
        "peak_rss_gb": round(rss, 2),
        "filter_bits_log2": NBITS.bit_length() - 1,
        "contigs": N_CONTIGS,
    }
    if ref:
        rec["vs_reference_engine"] = round(TOTAL / dt / ref, 2)
        rec["reference_bp_per_sec"] = round(ref, 1)
        rec["reference_timed_bp"] = ref_bp
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--scale-only" in sys.argv:
        scale_main()
    elif "--giant-only" in sys.argv:
        giant_main()
    elif "--human-only" in sys.argv:
        human_main()
    elif "--ecoli-only" in sys.argv:
        main()
    else:
        orchestrate()

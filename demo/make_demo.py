#!/usr/bin/env python3
"""Generate the hermetic demo inputs (deterministic, seeded).

The reference's demo downloads 100x E. coli reads from bcgsc.ca
(/root/reference/demo/runme.sh:6) — network-dependent.  This demo keeps
the same SHAPE hermetically: a 120 kbp genome, a draft with ~0.001
substitution + ~0.0001 indel error rates (README.md:333 rates), and 30x
error-free 100 bp reads, regenerated bit-identically from seeds on every
run.  Only the expected OUTPUTS are committed (golden_changes.tsv,
golden_edited.fa.gz) — the acceptance bar is the reference's own:
byte-identical _changes.tsv and _edited.fa (demo/runme.sh:9-10).
"""

import gzip
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402

from ntedit_tpu.io import fastx  # noqa: E402
from ntedit_tpu.utils import simulate  # noqa: E402

GENOME_LEN = 120_000
READ_LEN = 100
COVERAGE = 30


def main(outdir: str = ".") -> None:
    truth = simulate.random_genome(GENOME_LEN, seed=2026)
    draft, injected = simulate.inject_errors(
        truth, sub_rate=1e-3, ins_rate=1e-4, del_rate=1e-4, seed=2027
    )
    fastx.write_fasta(
        os.path.join(outdir, "demo_draft.fa"),
        [("demo_contig synthetic", draft.tobytes())],
    )
    # the truth genome doubles as the comparison assembly for the SNV
    # --genome flavor (run-ntedit snv --genome contract)
    fastx.write_fasta(
        os.path.join(outdir, "demo_genome.fa"),
        [("demo_genome synthetic", truth.tobytes())],
    )
    rng = np.random.default_rng(2028)
    n_reads = GENOME_LEN * COVERAGE // READ_LEN
    with gzip.open(os.path.join(outdir, "demoReads_1.fq.gz"), "wt") as f:
        for i in range(n_reads):
            s = int(rng.integers(0, GENOME_LEN - READ_LEN))
            r = truth[s : s + READ_LEN].tobytes().decode()
            f.write(f"@r{i}\n{r}\n+\n{'I' * READ_LEN}\n")
    print(
        f"demo inputs: demo_draft.fa ({len(draft)} bp, "
        f"{len(injected)} injected errors), demoReads_1.fq.gz "
        f"({n_reads} reads, {COVERAGE}x)"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")

"""Native batch reader == pure-Python reader (when the library is built)."""

import gzip
import os

import numpy as np
import pytest

from ntedit_tpu.io import fastx, native


def _write_corpus(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(
        ">c1 first contig\nACGTacgtNNRY\nGGTTAA\n"
        ">c2\nAAAA\n"
        ">c3 tab\tsep comment\nCCGG\n"
    )
    fq = tmp_path / "y.fq.gz"
    body = b"@r1 lane1\nACGTACGT\n+\nFFFFFFFF\n@r2\nGGGG\n+junk\n!!!!\n"
    with gzip.open(fq, "wb") as f:
        f.write(body)
    return str(fa), str(fq)


@pytest.mark.skipif(native.get_lib() is None, reason="libntpu_io.so not built")
def test_native_matches_python(tmp_path):
    fa, fq = _write_corpus(tmp_path)
    for path in (fa, fq):
        os.environ["NTEDIT_TPU_NATIVE_IO"] = "1"
        got = list(fastx.read_fastx(path))
        # force pure-python reference
        ref = list(fastx._read_fasta(fastx._open_text_stream(path))) \
            if path.endswith(".fa") else \
            list(fastx._read_fastq(fastx._open_text_stream(path)))
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            assert g.name == r.name
            assert g.comment == r.comment
            assert bytes(g.seq) == bytes(r.seq)


@pytest.mark.skipif(native.get_lib() is None, reason="libntpu_io.so not built")
def test_native_large_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    path = tmp_path / "big.fa"
    seqs = [bases[rng.integers(0, 4, size=int(n))] for n in rng.integers(10, 5000, 200)]
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n")
            b = bytes(s).decode()
            for j in range(0, len(b), 70):
                f.write(b[j : j + 70] + "\n")
    recs = list(fastx.read_fastx(str(path)))
    assert len(recs) == len(seqs)
    for r, s in zip(recs, seqs):
        assert bytes(r.seq) == bytes(s)

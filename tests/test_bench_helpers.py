"""Unit coverage for bench.py's verification helpers (the census that
explains correct=False, and the sparse gate-bitmap unpacker)."""

import numpy as np

import bench
from ntedit_tpu.engine import flag


class TestResidualCensus:
    def test_identical(self):
        assert bench.residual_census(b"ACGT" * 100, b"ACGT" * 100) == []

    def test_substitution(self):
        t = bytearray(b"ACGTACGTACGT" * 20)
        e = bytearray(t)
        e[100] = ord("A") if t[100] != ord("A") else ord("C")
        sites = bench.residual_census(bytes(e), bytes(t))
        assert len(sites) == 1 and sites[0]["kind"] == "sub"
        assert sites[0]["truth_pos"] == 100

    def test_extra_and_missing(self):
        import numpy as _np

        rng = _np.random.default_rng(5)
        t = bytes(_np.frombuffer(b"ACGT", _np.uint8)[rng.integers(0, 4, 4000)])
        e = t[:1000] + b"GG" + t[1000:3000] + t[3003:]  # extra 2, missing 3
        sites = bench.residual_census(e, t)
        kinds = [s["kind"] for s in sites]
        assert kinds == ["extra_bases", "missing_bases"]
        assert sites[0]["edited"] == "GG"
        assert sites[1]["truth_pos"] == 3000 + 2 - 2  # resync anchors nearby

    def test_tail_difference(self):
        t = b"A" * 50 + b"CGTACGTACG"
        e = t[:-3]
        sites = bench.residual_census(e, t)
        assert sites and sites[-1]["kind"] in ("tail_len_diff", "missing_bases", "desync")


class TestPackedToPositions:
    def test_empty(self):
        assert len(flag.packed_to_positions(np.zeros(8, np.uint32), 100)) == 0

    def test_bits_roundtrip(self):
        rng = np.random.default_rng(9)
        n = 1000
        bits = rng.random(n) < 0.05
        padded = np.zeros(-(-n // 32) * 32, bool)
        padded[:n] = bits
        words = np.packbits(
            padded.reshape(-1, 32), axis=1, bitorder="little"
        ).view(np.uint32).reshape(-1)
        got = flag.packed_to_positions(words, n)
        np.testing.assert_array_equal(got, np.nonzero(bits)[0])

    def test_truncation_at_n(self):
        words = np.full(2, 0xFFFFFFFF, np.uint32)
        got = flag.packed_to_positions(words, 40)
        np.testing.assert_array_equal(got, np.arange(40))

"""Bloom filter layer: host semantics, file round-trip, device probe parity."""

import numpy as np
import pytest

from ntedit_tpu.core import bloom, nthash_ref as ref

RNG = np.random.default_rng(7)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n):
    return BASES[RNG.integers(0, 4, size=n)]


def make_bf(k=25, h=3, n_kmers=2000, nbytes=8192):
    bf = bloom.KmerBloomFilter.zeros(nbytes, h, k)
    seq = rand_seq(n_kmers + k - 1)
    bf.insert_seq(seq)
    return bf, seq


class TestHostBF:
    def test_insert_contains(self):
        bf, seq = make_bf()
        assert bf.contains_seq_kmers(seq).all()

    def test_absent_mostly_missing(self):
        bf, _ = make_bf()
        other = rand_seq(3000)
        frac = bf.contains_seq_kmers(other).mean()
        assert frac < 0.2  # fpr of a loaded small filter, generous bound

    def test_strand_canonical(self):
        bf, seq = make_bf()
        comp = np.zeros(256, np.uint8)
        for a, b in zip(b"ACGT", b"TGCA"):
            comp[a] = b
        rc = comp[seq][::-1]
        assert bf.contains_seq_kmers(rc).all()

    def test_sizing_formula(self):
        # values from the reference formula at fpr=0.01, h=3 (~12.4 bits/elem)
        b = bloom.bf_size_bytes(11488448, 3, 0.01)
        assert 11488448 * 10 // 8 < b < 11488448 * 14 // 8

    def test_roundtrip(self, tmp_path):
        bf, seq = make_bf()
        p = str(tmp_path / "t.bf")
        bf.save(p)
        assert bloom.check_file_signature(p, bloom.KMER_BF_SIGNATURE)
        bf2 = bloom.KmerBloomFilter.load(p)
        assert bf2.k == bf.k and bf2.hash_num == bf.hash_num
        np.testing.assert_array_equal(bf2.data, bf.data)
        lf = bloom.load_any(p)
        assert isinstance(lf, bloom.KmerBloomFilter)


class TestHostCBF:
    def test_counts(self, tmp_path):
        k, h = 11, 3
        cbf = bloom.KmerCountingBloomFilter8.zeros(1 << 14, h, k)
        seq = rand_seq(200)
        fh, rh = ref.all_window_hashes(seq, k)
        hashes = ref.extend_hashes_vec(ref.canonical(fh, rh), k, h)
        for _ in range(3):
            cbf.insert_hashes(hashes)
        counts = cbf.count_hashes(hashes)
        assert (counts >= 3).all()  # count-min never underestimates
        p = str(tmp_path / "t.cbf")
        cbf.save(p)
        cbf2 = bloom.load_any(p)
        assert isinstance(cbf2, bloom.KmerCountingBloomFilter8)
        np.testing.assert_array_equal(cbf2.counters, cbf.counters)


class TestDeviceParity:
    def test_contains_parity(self):
        import jax.numpy as jnp
        from ntedit_tpu.core import nthash as nt
        from ntedit_tpu.utils import u64
        bf, seq = make_bf(nbytes=8192 + 13)  # non-pow2 size: Barrett path
        df = bloom.DeviceFilter.from_host(bf)
        probe = rand_seq(4000)
        want = bf.contains_seq_kmers(probe)
        fh, rh = nt.window_hashes(jnp.asarray(probe), bf.k)
        hashes = nt.extend(nt.canonical(fh, rh), bf.k, bf.hash_num)
        got = np.asarray(df.contains(hashes))
        np.testing.assert_array_equal(got, want)

    def test_count_parity(self):
        import jax.numpy as jnp
        from ntedit_tpu.core import nthash as nt
        k, h = 15, 4
        cbf = bloom.KmerCountingBloomFilter8.zeros(4099, h, k)
        seq = rand_seq(300)
        fh, rh = ref.all_window_hashes(seq, k)
        hashes = ref.extend_hashes_vec(ref.canonical(fh, rh), k, h)
        cbf.insert_hashes(hashes)
        cbf.insert_hashes(hashes[:100])
        df = bloom.DeviceFilter.from_host(cbf)
        probe = np.concatenate([seq, rand_seq(100)])
        want_f, want_r = ref.all_window_hashes(probe, k)
        want_h = ref.extend_hashes_vec(ref.canonical(want_f, want_r), k, h)
        want = cbf.count_hashes(want_h)
        jfh, jrh = nt.window_hashes(jnp.asarray(probe), k)
        jh = nt.extend(nt.canonical(jfh, jrh), k, h)
        got = np.asarray(df.count(jh))
        np.testing.assert_array_equal(got, want)
        # contains == count > 0
        np.testing.assert_array_equal(np.asarray(df.contains(jh)), want > 0)

    def test_jit_pytree(self):
        import jax
        import jax.numpy as jnp
        from ntedit_tpu.core import nthash as nt
        bf, seq = make_bf()
        df = bloom.DeviceFilter.from_host(bf)

        @jax.jit
        def f(df, s):
            fh, rh = nt.window_hashes(s, df.k)
            return df.contains(nt.extend(nt.canonical(fh, rh), df.k, df.hash_num))

        got = np.asarray(f(df, jnp.asarray(seq)))
        np.testing.assert_array_equal(got, bf.contains_seq_kmers(seq))


class TestFileFormatTripwire:
    """FIDELITY #10 defensive pins: btllib is not installable here, so the
    .bf/.cbf header layout cannot be diffed against a real btllib artifact.
    These tests (a) pin the writer's exact header bytes — any future drift
    in the framework's on-disk format fails loudly instead of silently
    breaking interop with artifacts written by earlier versions — and
    (b) fuzz the parser over header variants (spacing, key order, unknown
    keys, quoted values) so the 'tolerant parser' claim stays true."""

    def test_bf_header_bytes_pinned(self, tmp_path):
        bf = bloom.KmerBloomFilter.zeros(8, 3, 25)
        bf.data[:] = np.arange(8, dtype=np.uint8)
        p = str(tmp_path / "t.bf")
        bf.save(p)
        raw = open(p, "rb").read()
        want_header = (
            b"[BTLKmerBloomFilter_v6]\n"
            b"bytes = 8\n"
            b"hash_num = 3\n"
            b"k = 25\n"
            b"[HEADER_END]\n"
        )
        assert raw == want_header + bytes(range(8)), raw

    def test_cbf_header_bytes_pinned(self, tmp_path):
        cbf = bloom.KmerCountingBloomFilter8.zeros(4, 3, 21)
        cbf.counters[:] = [9, 8, 7, 6]
        p = str(tmp_path / "t.cbf")
        cbf.save(p)
        raw = open(p, "rb").read()
        want_header = (
            b"[BTLKmerCountingBloomFilter_v6]\n"
            b"bytes = 4\n"
            b"hash_num = 3\n"
            b"k = 21\n"
            b"counter_bits = 8\n"
            b"[HEADER_END]\n"
        )
        assert raw == want_header + bytes([9, 8, 7, 6]), raw

    def test_parser_tolerates_header_variants(self, tmp_path):
        payload = bytes(range(8))
        variants = [
            # no spaces around '='
            b"bytes=8\nhash_num=3\nk=25\n",
            # extra whitespace and blank-ish lines
            b"  bytes =  8  \nhash_num\t=\t3\nk = 25\n\n",
            # reordered keys plus unknown keys the parser must skip
            b"k = 25\nversion = 6\nhash_num = 3\nbloom_type = \"kmer\"\nbytes = 8\n",
            # quoted values
            b"bytes = \"8\"\nhash_num = \"3\"\nk = \"25\"\n",
        ]
        for i, hdr in enumerate(variants):
            p = str(tmp_path / f"v{i}.bf")
            with open(p, "wb") as f:
                f.write(b"[BTLKmerBloomFilter_v6]\n" + hdr
                        + b"[HEADER_END]\n" + payload)
            bf = bloom.load_any(p)
            assert isinstance(bf, bloom.KmerBloomFilter), i
            assert bf.hash_num == 3 and bf.k == 25, i
            np.testing.assert_array_equal(bf.data, np.frombuffer(payload, np.uint8))

    def test_parser_rejects_truncated_array(self, tmp_path):
        p = str(tmp_path / "short.bf")
        with open(p, "wb") as f:
            f.write(b"[BTLKmerBloomFilter_v6]\nbytes = 64\nhash_num = 3\n"
                    b"k = 25\n[HEADER_END]\n" + bytes(8))
        import pytest

        with pytest.raises(ValueError, match="truncated"):
            bloom.KmerBloomFilter.load(p)

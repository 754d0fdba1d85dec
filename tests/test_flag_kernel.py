"""Pallas fused flag-prep kernel == XLA dense pass (interpret mode on the
CPU test mesh; the same code path runs compiled on TPU)."""

import numpy as np
import pytest

from ntedit_tpu.core import bloom
from ntedit_tpu.engine import flag
from ntedit_tpu.ops import flag_kernel
from ntedit_tpu.utils import simulate


@pytest.mark.parametrize("k", [25, 17])
def test_pallas_gates_match_xla(k):
    rng = np.random.default_rng(5)
    truth = simulate.random_genome(40_000, seed=11)
    draft, _ = simulate.inject_errors(
        truth, sub_rate=2e-3, ins_rate=2e-4, del_rate=2e-4, seed=12
    )
    # sprinkle some non-ACGT draft bases (IUPAC accepted + N rejected)
    pos = rng.integers(0, len(draft), size=30)
    draft = draft.copy()
    draft[pos[:15]] = ord("N")
    draft[pos[15:]] = ord("R")
    bf = bloom.BlockedKmerBloomFilter.zeros(1 << 18, 3, k)
    bf.insert_seq(truth)
    df = bloom.DeviceFilter.from_host(bf)
    ref = flag.flag_contig_gates(draft, df)
    got = flag_kernel.flag_contig_gates_pallas(draft, df, chunk=4096)
    assert len(ref) == len(got)
    assert (ref == got).all()


def test_pallas_gates_snv_and_short():
    truth = simulate.random_genome(6_000, seed=3)
    bf = bloom.BlockedKmerBloomFilter.zeros(1 << 16, 4, 25)
    bf.insert_seq(truth)
    df = bloom.DeviceFilter.from_host(bf)
    ref = flag.flag_contig_gates(truth, df, snv=True)
    got = flag_kernel.flag_contig_gates_pallas(truth, df, snv=True, chunk=2048)
    assert (ref == got).all()
    assert len(flag_kernel.flag_contig_gates_pallas(truth[:10], df)) == 0


def test_iter_gate_chunks_equals_one_shot():
    """Streamed per-chunk gates (the pipelined feed) == the one-shot gate
    pass, including tail-chunk padding and frontier accounting."""
    import numpy as np

    from ntedit_tpu.core import bloom
    from ntedit_tpu.engine import flag
    from ntedit_tpu.utils import simulate

    truth = simulate.random_genome(20000, seed=40)
    draft, _ = simulate.inject_errors(truth, sub_rate=3e-3, seed=41)
    bf = bloom.BlockedKmerBloomFilter.zeros(1 << 15, 3, 25)
    bf.insert_seq(truth)
    df = bloom.DeviceFilter.from_host(bf)
    want = flag.flag_contig_gates(draft, df, chunk=4096)
    got = []
    last_frontier = 0
    for frontier, g in flag.iter_gate_chunks(draft, df, chunk=4096):
        assert frontier > last_frontier
        assert ((g >= last_frontier) & (g < frontier)).all()
        last_frontier = frontier
        got.append(g)
    np.testing.assert_array_equal(np.concatenate(got), want)
    assert last_frontier == len(draft) - 24

import itertools

import numpy as np
import pytest

from turbotpu.spec.rate_match import (circular_buffer_map, de_rate_match,
                                      rate_match, select_indices,
                                      sub_block_maps)
from turbotpu.spec.rate_match_ref import rate_match_ref


def test_sub_block_maps_are_permutations():
    for D in (44, 100, 6148):
        p01, p2, K_pi = sub_block_maps(D)
        assert K_pi % 32 == 0 and K_pi >= D
        assert len(np.unique(p01)) == K_pi
        assert len(np.unique(p2)) == K_pi


def test_circular_buffer_covers_all_d_bits():
    for K in (40, 512, 6144):
        wmap, valid, K_pi = circular_buffer_map(K)
        D = K + 4
        got = np.sort(wmap[valid])
        assert (got == np.arange(3 * D)).all()
        assert valid.sum() == 3 * D


def test_mother_rate_selects_everything_once():
    K = 40
    E = 3 * K + 12
    idx = select_indices(K, E, rv=0)
    assert len(np.unique(idx)) == E  # no repetition at exactly the mother rate


def test_repetition_combines_and_puncture_zero():
    K = 40
    D = K + 4
    rng = np.random.default_rng(0)
    llr_tx = rng.normal(size=3 * D)
    # Strong repetition: E = 2x mother rate.
    E = 2 * (3 * K + 12)
    idx = select_indices(K, E)
    e = llr_tx[idx]
    l0, l1, l2 = de_rate_match(e, K)
    acc = np.concatenate([l0, l1, l2])
    counts = np.bincount(idx, minlength=3 * D)
    assert (counts >= 1).all()
    np.testing.assert_allclose(acc, counts * llr_tx, rtol=1e-12)

    # Puncturing: E = half the mother rate; unsent positions are exactly 0.
    E = (3 * K + 12) // 2
    idx = select_indices(K, E)
    l0, l1, l2 = de_rate_match(llr_tx[idx], K)
    acc = np.concatenate([l0, l1, l2])
    sent = np.zeros(3 * D, bool)
    sent[idx] = True
    assert (acc[~sent] == 0).all()
    np.testing.assert_allclose(acc[sent], llr_tx[sent])


def test_systematic_first_at_rv0():
    # rv0 starts 2 rows into the systematic sub-block: the first selected
    # bits are (almost) all systematic-stream bits.
    K = 512
    E = K  # fewer than the systematic stream
    idx = select_indices(K, E, rv=0)
    frac_sys = (idx < K + 4).mean()
    assert frac_sys > 0.9


def test_rv_offsets_differ():
    K = 512
    E = 600
    sets = [frozenset(select_indices(K, E, rv=r).tolist()) for r in range(4)]
    assert len(set(sets)) == 4


def test_rate_match_golden_bits():
    rng = np.random.default_rng(1)
    K = 104
    d = rng.integers(0, 2, 3 * (K + 4)).astype(np.int8)
    D = K + 4
    e = rate_match(d[:D], d[D:2 * D], d[2 * D:], E=200, rv=1)
    assert e.shape == (200,)
    idx = select_indices(K, 200, rv=1)
    assert (e == d[idx]).all()


# ---------------------------------------------------------------------------
# Independent-oracle conformance (VERDICT round-1 item 1b): the index-map
# production path must agree with the literal TS 36.212 while-loop path of
# spec/rate_match_ref.py over a (K, E, rv, n_cb, F) grid.
# ---------------------------------------------------------------------------

def _d_symbol_streams(K):
    D = K + 4
    return (list(range(D)), list(range(D, 2 * D)), list(range(2 * D, 3 * D)))


@pytest.mark.parametrize("K", [40, 104, 512, 1024, 6144])
def test_matches_literal_spec_oracle(K):
    d0, d1, d2 = _d_symbol_streams(K)
    for E, rv in itertools.product((17, K, 2 * K, 3 * K + 12, 4 * K),
                                   range(4)):
        got = select_indices(K, E, rv).tolist()
        ref = rate_match_ref(d0, d1, d2, E, rv)
        assert got == ref, (K, E, rv)


def test_matches_literal_spec_oracle_limited_ncb():
    # Limited soft-buffer sizes N_cb < 3*K_pi (UE category soft limiting).
    K = 512
    d0, d1, d2 = _d_symbol_streams(K)
    K_pi = circular_buffer_map(K)[2]
    for n_cb in (K_pi + 32, 2 * K_pi, 3 * K_pi - 64):
        for rv in range(4):
            got = select_indices(K, 2 * K, rv, n_cb).tolist()
            ref = rate_match_ref(d0, d1, d2, 2 * K, rv, n_cb)
            assert got == ref, (n_cb, rv)


@pytest.mark.parametrize("K,F", [(40, 4), (512, 28), (6144, 63)])
def test_matches_literal_spec_oracle_with_fillers(K, F):
    d0, d1, d2 = _d_symbol_streams(K)
    for E, rv in itertools.product((K, 3 * K + 12, 4 * K), range(4)):
        got = select_indices(K, E, rv, F=F).tolist()
        ref = rate_match_ref(d0, d1, d2, E, rv, F=F)
        assert got == ref, (K, E, rv, F)


def test_filler_positions_never_selected():
    # TS 36.212 section 5.1.4.1: <NULL> filler bits in d0/d1 are skipped by
    # bit selection for any rv, even with heavy repetition.
    K, F = 256, 20
    D = K + 4
    filler_idx = set(range(F)) | set(range(D, D + F))
    for rv in range(4):
        idx = select_indices(K, 6 * K, rv, F=F)
        assert not (set(idx.tolist()) & filler_idx)
        # d2 and non-filler d0/d1 positions all still covered at this E.
        want = set(range(3 * D)) - filler_idx
        assert set(idx.tolist()) == want


def test_de_rate_match_fillers_stay_zero():
    K, F = 104, 12
    D = K + 4
    rng = np.random.default_rng(3)
    E = 2 * K
    llr = rng.normal(size=E)
    l0, l1, l2 = de_rate_match(llr, K, rv=0, F=F)
    assert (l0[:F] == 0).all() and (l1[:F] == 0).all()

import numpy as np
import pytest

from turbotpu.spec.qpp import LEGAL_K, qpp_inv, qpp_params, qpp_perm, nearest_legal_k


def test_table_size_and_k_grid():
    assert len(LEGAL_K) == 188
    ks = list(LEGAL_K)
    assert ks == sorted(ks)
    assert ks[0] == 40 and ks[-1] == 6144
    # TS 36.212: step 8 to 512, 16 to 1024, 32 to 2048, 64 to 6144.
    expect = (list(range(40, 513, 8)) + list(range(528, 1025, 16))
              + list(range(1056, 2049, 32)) + list(range(2112, 6145, 64)))
    assert ks == expect


@pytest.mark.parametrize("K", LEGAL_K)
def test_permutation_property(K):
    p = qpp_perm(K)
    assert p.shape == (K,)
    assert len(np.unique(p)) == K


def test_spot_values():
    # TS 36.212 Table 5.1.3-3 spot checks.
    assert qpp_params(40) == (3, 10)
    assert qpp_params(6144) == (263, 480)
    assert qpp_params(512) == (31, 64)
    assert qpp_params(1024) == (31, 64)
    assert qpp_params(2048) == (31, 64)
    assert qpp_params(4096) == (31, 64)
    p = qpp_perm(40)
    # Pi(i) = (3 i + 10 i^2) mod 40
    assert p[1] == 13 and p[2] == 46 % 40 and p[3] == (9 + 90) % 40


def test_inverse():
    for K in (40, 512, 6144):
        p, inv = qpp_perm(K), qpp_inv(K)
        assert (inv[p] == np.arange(K)).all()
        assert (p[inv] == np.arange(K)).all()


@pytest.mark.parametrize("K", [64, 320, 2048, 6144])
def test_contention_free(K):
    """QPP is contention-free: for W | K, floor(Pi(i + j*W)/W) hits each
    window exactly once over j (the parallel-SISO memory-bank property)."""
    p = qpp_perm(K).astype(np.int64)
    for W in (8, 16, 32, 64):
        if K % W:
            continue
        n_win = K // W
        banks = (p.reshape(n_win, W) // W)
        for col in range(W):
            assert len(np.unique(banks[:, col])) == n_win


def test_nearest_legal_k():
    assert nearest_legal_k(40) == 40
    assert nearest_legal_k(41) == 48
    assert nearest_legal_k(6144) == 6144
    with pytest.raises(ValueError):
        nearest_legal_k(6145)

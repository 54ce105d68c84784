"""Unit coverage of the partitioned-exchange routing tables
(dist/seq_parallel.exchange_tables / make_exchange), including the
round-3 real_len masking that folds the "rows >= K read a-priori 0"
rule into the gather instead of a full-tensor where pass.
"""

import numpy as np
import pytest

from turbotpu.dist.seq_parallel import exchange_tables


def _emulate(perm_e, C, n_seq, real_len=None):
    """Reference semantics: la[j*C + t] = le[perm_e[j*C + t]], zeroed
    where real_len masks the source."""
    local_tbl, send_tbl, slot_tbl, M = exchange_tables(
        np.asarray(perm_e), C, n_seq, real_len)
    KTp = C * n_seq
    le = np.arange(1, KTp + 1, dtype=np.float64)   # distinct nonzero rows
    la = np.zeros(KTp)
    for j in range(n_seq):
        shard = le[j * C:(j + 1) * C]
        # local part
        for t in range(C):
            o = local_tbl[j, t]
            la[j * C + t] = 0.0 if o == C else shard[o]
        # cross-shard part
        for s in range(n_seq):
            for m in range(M):
                o = send_tbl[s, j, m]
                t = slot_tbl[j, s * M + m]
                if t != C:
                    la[j * C + t] = 0.0 if o == C else le[s * C + o]
    return la, local_tbl, M


@pytest.mark.parametrize("n_seq", [1, 2, 4])
def test_tables_apply_permutation(n_seq):
    rng = np.random.default_rng(0)
    K, C = 40, None
    KT = K + 3
    C = -(-KT // n_seq)
    C = -(-C // 8) * 8
    KTp = C * n_seq
    perm = rng.permutation(K)
    perm_e = np.concatenate([perm, np.arange(K, KTp)])
    la, _, _ = _emulate(perm_e, C, n_seq)
    le = np.arange(1, KTp + 1, dtype=np.float64)
    np.testing.assert_array_equal(la, le[perm_e])


@pytest.mark.parametrize("n_seq", [1, 2, 4])
def test_real_len_masks_tail_sources(n_seq):
    rng = np.random.default_rng(1)
    K = 40
    KT = K + 3
    C = -(-KT // n_seq)
    C = -(-C // 8) * 8
    KTp = C * n_seq
    perm = rng.permutation(K)
    perm_e = np.concatenate([perm, np.arange(K, KTp)])
    la, local_tbl, M = _emulate(perm_e, C, n_seq, real_len=K)
    le = np.arange(1, KTp + 1, dtype=np.float64)
    expect = le[perm_e].copy()
    expect[perm_e >= K] = 0.0       # tail/pad sources read as zero
    np.testing.assert_array_equal(la, expect)
    # real targets (< K) always read real sources (perm is a permutation
    # of [0, K)), so no real position was masked
    assert (la[:K] != 0).all() if n_seq == 1 else True


def test_n_seq_1_real_len_has_pad_rows_but_no_cross_traffic():
    K = 40
    C = -(-(K + 3) // 8) * 8
    perm_e = np.concatenate([np.random.default_rng(2).permutation(K),
                             np.arange(K, C)])
    local_tbl, _, _, M = exchange_tables(perm_e, C, 1, real_len=K)
    assert M == 0                      # no cross-shard buckets
    assert (local_tbl == C).any()      # tail rows route to the zero slot
    local_tbl2, _, _, M2 = exchange_tables(perm_e, C, 1)
    assert M2 == 0 and not (local_tbl2 == C).any()  # unmasked: pure gather

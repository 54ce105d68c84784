"""UMTS interleaver conformance (TS 25.212 section 4.2.3.2.3).

Round 2 breaks the round-1 self-consistency loop (VERDICT item 1): the
production matrix-gather implementation (spec/umts.py) is checked against an
INDEPENDENT literal step-by-step spec implementation (spec/umts_ref.py) and
against frozen committed vectors (tests/vectors/umts_vectors.py), including
a K=40 vector derived by hand from the spec text.  The round-1 suite only
asserted bijectivity, which a wrong-but-bijective permutation passes -- and
indeed round 1 shipped one (missing "q_j > 6" floor), caught by this file.
"""

import hashlib

import numpy as np
import pytest

from tests.vectors.umts_vectors import FULL, SHA256
from turbotpu.spec.umts import MAX_K, MIN_K, umts_inv, umts_perm
from turbotpu.spec.umts_ref import umts_perm_ref

# By-hand derivation from the spec text (round 2): K=40 -> R=5, p=7, v=3,
# C=p+1=8; s=[1,3,2,6,4,5]; q=[1,7,11,13,17]; T=[4,3,2,1,0];
# U rows from (i*r_j mod 6) with the U[4][7]<->U[4][0] exchange (K=R*C).
HAND_K40 = [39, 25, 17, 9, 1, 35, 27, 21, 11, 5, 34, 26, 20, 10, 4,
            38, 30, 22, 14, 6, 36, 28, 18, 12, 2, 37, 29, 19, 13, 3,
            32, 24, 16, 8, 0, 33, 31, 23, 15, 7]


def test_hand_derived_k40():
    assert list(umts_perm(40)) == HAND_K40
    assert umts_perm_ref(40) == HAND_K40


@pytest.mark.parametrize("K", sorted(FULL))
def test_committed_full_vectors(K):
    assert list(umts_perm(K)) == FULL[K]
    assert umts_perm_ref(K) == FULL[K]


@pytest.mark.parametrize("K", sorted(SHA256))
def test_committed_hash_vectors(K):
    b = np.asarray(umts_perm(K), dtype="<i4").tobytes()
    assert hashlib.sha256(b).hexdigest() == SHA256[K]
    b2 = np.asarray(umts_perm_ref(K), dtype="<i4").tobytes()
    assert hashlib.sha256(b2).hexdigest() == SHA256[K]


# Every (R, C-vs-p) regime plus all the inter-row-pattern switch points:
# R=5; R=10 (160-200 and the p=53 special range 481-530); R=20 with
# C=p-1/p/p+1; PAT2 ranges 2281-2480 and 3161-3210; extremes.
CROSS_KS = (list(range(MIN_K, 202)) + [240, 320, 480, 481, 500, 529, 530,
            531, 1000, 1528, 2280, 2281, 2400, 2480, 2481, 3160, 3161,
            3210, 3211, 4000, 5000, 5113, 5114])


@pytest.mark.parametrize("K", CROSS_KS)
def test_matches_independent_spec_oracle(K):
    assert list(umts_perm(K)) == umts_perm_ref(K)


@pytest.mark.slow
def test_matches_independent_spec_oracle_full_range():
    for K in range(MIN_K, MAX_K + 1):
        assert list(umts_perm(K)) == umts_perm_ref(K), K


@pytest.mark.parametrize("K", [40, 99, 160, 320, 481, 530, 531, 1000, 2281,
                               2480, 3161, 3210, 5114])
def test_permutation_property(K):
    p = umts_perm(K)
    assert p.shape == (K,)
    assert len(np.unique(p)) == K


def test_inverse():
    for K in (40, 160, 530, 5114):
        p, inv = umts_perm(K), umts_inv(K)
        assert (inv[p] == np.arange(K)).all()


def test_bounds():
    with pytest.raises(ValueError):
        umts_perm(39)
    with pytest.raises(ValueError):
        umts_perm(5115)

import numpy as np
import pytest

from turbotpu.spec.umts import MAX_K, MIN_K, umts_inv, umts_perm


@pytest.mark.parametrize("K", list(range(MIN_K, 201)) + [320, 481, 530, 531,
                                                         1000, 2281, 2480,
                                                         3161, 3210, 5114])
def test_permutation_property(K):
    p = umts_perm(K)
    assert p.shape == (K,)
    assert len(np.unique(p)) == K


@pytest.mark.slow
def test_permutation_property_full_range():
    for K in range(MIN_K, MAX_K + 1):
        p = umts_perm(K)
        assert len(np.unique(p)) == K, K


def test_inverse():
    for K in (40, 160, 530, 5114):
        p, inv = umts_perm(K), umts_inv(K)
        assert (inv[p] == np.arange(K)).all()


def test_bounds():
    with pytest.raises(ValueError):
        umts_perm(39)
    with pytest.raises(ValueError):
        umts_perm(5115)

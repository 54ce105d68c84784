"""numpy golden == C++ golden, encoder and decoder (SURVEY.md section 5)."""

import numpy as np
import pytest

from turbotpu.golden import cpp_ref, numpy_ref
from turbotpu.spec.qpp import qpp_inv, qpp_perm
from turbotpu.spec.umts import umts_inv, umts_perm


@pytest.mark.parametrize("K,which", [(40, "lte"), (64, "lte"), (512, "lte"),
                                     (40, "umts"), (160, "umts")])
def test_encoders_match(K, which):
    rng = np.random.default_rng(K)
    bits = rng.integers(0, 2, K).astype(np.int8)
    perm = qpp_perm(K) if which == "lte" else umts_perm(K)
    a = numpy_ref.turbo_encode(bits, perm)
    b = cpp_ref.turbo_encode(bits, perm)
    for x, y in zip(a, b):
        assert (x == y).all()


def _noisy_llrs(K, seed, ebn0_db=1.0):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, K).astype(np.int8)
    perm, inv = qpp_perm(K), qpp_inv(K)
    parts = numpy_ref.turbo_encode(bits, perm)
    enc = np.concatenate(parts).astype(np.float64)
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    y = (1 - 2 * enc) + sigma * rng.normal(size=enc.shape)
    llr = 2 * y / sigma ** 2
    ofs = np.cumsum([0, K, K, K, 6, 6])
    return bits, perm, inv, [llr[ofs[i]:ofs[i + 1]] for i in range(5)]


@pytest.mark.parametrize("mode", ["logmap", "maxlog"])
@pytest.mark.parametrize("K", [40, 104])
def test_decoders_match(K, mode):
    bits, perm, inv, p = _noisy_llrs(K, seed=3)
    h1, _, L1 = numpy_ref.turbo_decode(*p, perm, inv, n_iters=4, mode=mode)
    h2, _, L2 = cpp_ref.turbo_decode(*p, perm, inv, n_iters=4, mode=mode)
    assert (h1 == h2).all()
    np.testing.assert_allclose(L1, L2, atol=1e-9)


def test_noiseless_roundtrip_umts():
    K = 80
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, K).astype(np.int8)
    perm, inv = umts_perm(K), umts_inv(K)
    parts = numpy_ref.turbo_encode(bits, perm)
    C = 5.0
    llrs = [C * (1 - 2 * x.astype(np.float64)) for x in parts]
    hard, _, _ = numpy_ref.turbo_decode(*llrs, perm, inv, n_iters=2)
    assert (hard == bits).all()

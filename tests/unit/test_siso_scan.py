import numpy as np
import pytest

import jax.numpy as jnp

from turbotpu.golden import numpy_ref as npr
from turbotpu.siso.scan import siso_decode_scan
from turbotpu.spec.qpp import qpp_inv, qpp_perm


def _make_inputs(K, B, seed=0, ebn0_db=1.0):
    rng = np.random.default_rng(seed)
    ls1 = np.empty((B, K + 3))
    lp1 = np.empty((B, K + 3))
    la = rng.normal(size=(B, K))
    bits_all = []
    for b in range(B):
        bits = rng.integers(0, 2, K).astype(np.int8)
        bits_all.append(bits)
        perm = qpp_perm(K)
        sys_, p1, p2, t1, t2 = npr.turbo_encode(bits, perm)
        enc = np.concatenate([sys_, t1[0::2], p1, t1[1::2]]).astype(float)
        sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
        y = (1 - 2 * enc) + sigma * rng.normal(size=enc.shape)
        llr = 2 * y / sigma ** 2
        ls1[b] = llr[:K + 3]
        lp1[b] = llr[K + 3:]
    return ls1, lp1, la, bits_all


@pytest.mark.parametrize("mode", ["logmap", "maxlog"])
@pytest.mark.parametrize("K,B", [(40, 1), (40, 3), (104, 2)])
def test_matches_golden(K, B, mode):
    ls1, lp1, la, _ = _make_inputs(K, B)
    Lj, Lej = siso_decode_scan(jnp.asarray(ls1, jnp.float32),
                               jnp.asarray(lp1, jnp.float32),
                               jnp.asarray(la, jnp.float32), mode=mode)
    for b in range(B):
        Lg, Leg = npr.bcjr_siso(ls1[b], lp1[b], la[b], mode)
        scale = np.maximum(1.0, np.abs(Lg))
        np.testing.assert_allclose(np.asarray(Lj)[b] / scale, Lg / scale,
                                   atol=2e-3)
        scale = np.maximum(1.0, np.abs(Leg))
        np.testing.assert_allclose(np.asarray(Lej)[b] / scale, Leg / scale,
                                   atol=2e-3)


def test_batch_consistency():
    """Each batch row decodes independently."""
    ls1, lp1, la, _ = _make_inputs(40, 4, seed=1)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    L_all, _ = siso_decode_scan(f32(ls1), f32(lp1), f32(la))
    L_one, _ = siso_decode_scan(f32(ls1[2:3]), f32(lp1[2:3]), f32(la[2:3]))
    np.testing.assert_allclose(np.asarray(L_all)[2], np.asarray(L_one)[0],
                               rtol=1e-5, atol=1e-5)

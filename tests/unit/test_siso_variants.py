"""All SISO implementations agree with the scan reference (SURVEY.md s5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from turbotpu.golden import numpy_ref as npr
from turbotpu.siso.ascan import siso_decode_ascan
from turbotpu.siso.pallas_kernel import siso_decode_pallas
from turbotpu.siso.scan import siso_decode_scan, siso_scan_boundary
from turbotpu.siso.windowed import make_windowed_siso
from turbotpu.spec.qpp import qpp_perm


def _inputs(K, B, seed=0, scale=4.0):
    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s) * scale, jnp.float32)
    return f32(B, K + 3), f32(B, K + 3), f32(B, K)


def _codeword_inputs(K, B, seed=0, ebn0_db=0.8):
    rng = np.random.default_rng(seed)
    perm = qpp_perm(K)
    ls1 = np.empty((B, K + 3))
    lp1 = np.empty((B, K + 3))
    for b in range(B):
        bits = rng.integers(0, 2, K).astype(np.int8)
        sys_, p1, _, t1, _ = npr.turbo_encode(bits, perm)
        enc = np.concatenate([sys_, t1[0::2], p1, t1[1::2]]).astype(float)
        sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
        y = (1 - 2 * enc) + sigma * rng.normal(size=enc.shape)
        llr = 2 * y / sigma ** 2
        ls1[b], lp1[b] = llr[:K + 3], llr[K + 3:]
    la = rng.normal(size=(B, K))
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return f32(ls1), f32(lp1), f32(la)


@pytest.mark.parametrize("mode", ["logmap", "maxlog"])
def test_ascan_matches_scan(mode):
    ls, lp, la = _inputs(104, 3)
    L1, Le1 = siso_decode_scan(ls, lp, la, mode=mode)
    L2, Le2 = siso_decode_ascan(ls, lp, la, mode=mode)
    np.testing.assert_allclose(np.asarray(Le2), np.asarray(Le1),
                               rtol=1e-4, atol=1e-4)


# One (K, mode) pair per distinct compiled kernel config: both modes and
# both window shapes stay covered while halving the interpret compiles
# (the suite's dominant cost).
@pytest.mark.parametrize("K,mode", [(40, "maxlog"), (104, "logmap")])
def test_pallas_matches_scan(K, mode):
    ls, lp, la = _inputs(K, 2, seed=K)
    L1, Le1 = siso_decode_scan(ls, lp, la, mode=mode)
    L2, Le2 = siso_decode_pallas(ls, lp, la, mode=mode)
    np.testing.assert_allclose(np.asarray(Le2), np.asarray(Le1),
                               rtol=1e-4, atol=1e-4)


def test_windowed_close_to_exact_on_codewords():
    ls, lp, la = _codeword_inputs(512, 2)
    _, Le1 = siso_decode_scan(ls, lp, la, mode="maxlog")
    _, Le2 = make_windowed_siso(128, 32)(ls, lp, la, mode="maxlog")
    a, b = np.asarray(Le1), np.asarray(Le2)
    # Approximate: sign agreement on confident extrinsics must be near-total.
    confident = np.abs(a) > 2.0
    assert ((a < 0) == (b < 0))[confident].mean() > 0.995
    assert np.abs(a - b).mean() < 0.2


def test_windowed_short_block_is_exact():
    ls, lp, la = _inputs(40, 2, seed=7)
    _, Le1 = siso_decode_scan(ls, lp, la, mode="maxlog")
    _, Le2 = make_windowed_siso(256, 32)(ls, lp, la, mode="maxlog")
    np.testing.assert_allclose(np.asarray(Le2), np.asarray(Le1),
                               rtol=1e-4, atol=1e-4)


def test_boundary_siso_splices_exactly():
    """Two half-trellis SISO calls with exchanged boundary metrics must
    reproduce the monolithic result exactly (the cross-device invariant)."""
    K = 104
    ls, lp, la = _inputs(K, 2, seed=9)
    mode = "maxlog"
    L_ref, Le_ref = siso_decode_scan(ls, lp, la, mode=mode)
    C = 53  # split *inside* the info region; KT = 107 = 53 + 54
    lsA, lsB = ls[:, :C], ls[:, C:]
    lpA, lpB = lp[:, :C], lp[:, C:]
    laf = jnp.pad(la, ((0, 0), (0, 3)))
    laA, laB = laf[:, :C], laf[:, C:]
    # Pass 1: get exact alpha at the cut from the left, beta from the right.
    _, _, aA, _ = siso_scan_boundary(lsA, lpA, laA, None, jnp.zeros((2, 8)), mode)
    _, _, _, bB = siso_scan_boundary(lsB, lpB, laB, jnp.zeros((2, 8)), None, mode)
    # Pass 2: decode each side with the other's exact boundary.
    _, LeA, _, _ = siso_scan_boundary(lsA, lpA, laA, None, bB, mode)
    _, LeB, _, _ = siso_scan_boundary(lsB, lpB, laB, aA, None, mode)
    Le = jnp.concatenate([LeA, LeB], axis=1)[:, :K]
    np.testing.assert_allclose(np.asarray(Le), np.asarray(Le_ref),
                               rtol=1e-4, atol=1e-4)


def test_linlog_close_to_logmap():
    """Linear-log-MAP stays much closer to log-MAP than max-log does."""
    ls, lp, la = _inputs(104, 2, seed=11)
    _, Le_log = siso_decode_scan(ls, lp, la, mode="logmap")
    _, Le_lin = siso_decode_scan(ls, lp, la, mode="linlog")
    _, Le_max = siso_decode_scan(ls, lp, la, mode="maxlog")
    import numpy as _np
    dlin = _np.abs(_np.asarray(Le_lin) - _np.asarray(Le_log)).mean()
    dmax = _np.abs(_np.asarray(Le_max) - _np.asarray(Le_log)).mean()
    assert dlin < dmax / 2
    # Pallas kernel agrees with the scan reference in linlog mode too.
    _, Le_p = siso_decode_pallas(ls, lp, la, mode="linlog")
    _np.testing.assert_allclose(_np.asarray(Le_p), _np.asarray(Le_lin),
                                rtol=1e-4, atol=1e-4)

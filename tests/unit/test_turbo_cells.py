import numpy as np
import pytest

import jax.numpy as jnp

from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from tests.unit.test_turbo_decode import _encode_noisy


@pytest.mark.parametrize("early", ["none", "crc"])
def test_cells_loop_matches_scan_loop(early):
    K, B = 104, 3
    bits, noisy = _encode_noisy(K, B, seed=3, ebn0_db=1.5,
                                with_crc=early == "crc")
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    h1, i1, L1 = turbo_decode(*args, DecoderConfig(K=K, n_iters=4,
                                                   early_term=early))
    h2, i2, L2 = turbo_decode(*args, DecoderConfig(K=K, n_iters=4,
                                                   early_term=early,
                                                   siso="pallas"))
    assert (np.asarray(h1) == np.asarray(h2)).all()
    assert (np.asarray(i1) == np.asarray(i2)).all()
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L2),
                               rtol=1e-3, atol=1e-3)


def test_cells_loop_maxlog_umts():
    K, B = 80, 2
    bits, noisy = _encode_noisy(K, B, seed=5, ebn0_db=3.0,
                                interleaver="umts")
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    cfg = DecoderConfig(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                        interleaver="umts", siso="pallas")
    h, i, L = turbo_decode(*args, cfg)
    assert (np.asarray(h) == bits).all()

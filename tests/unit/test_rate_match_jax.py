import numpy as np

import jax.numpy as jnp

from turbotpu.golden import numpy_ref as npr
from turbotpu.spec.qpp import qpp_perm
from turbotpu.spec.rate_match import de_rate_match, rate_match
from turbotpu.tx.rate_match_jax import (de_rate_match_jax, lte_demux_jax,
                                        lte_mux_jax, rate_match_jax)


def _encoded_batch(K, B, seed=0):
    rng = np.random.default_rng(seed)
    perm = qpp_perm(K)
    parts = [[] for _ in range(5)]
    for _ in range(B):
        bits = rng.integers(0, 2, K).astype(np.int8)
        for i, x in enumerate(npr.turbo_encode(bits, perm)):
            parts[i].append(x)
    return [jnp.asarray(np.stack(p)) for p in parts]


def test_mux_demux_matches_golden():
    K, B = 40, 3
    parts = _encoded_batch(K, B)
    d_flat = np.asarray(lte_mux_jax(*parts))
    D = K + 4
    for b in range(B):
        d0, d1, d2 = npr.lte_mux(*[np.asarray(p)[b] for p in parts])
        assert (d_flat[b, :D] == d0).all()
        assert (d_flat[b, D:2 * D] == d1).all()
        assert (d_flat[b, 2 * D:] == d2).all()
    back = lte_demux_jax(jnp.asarray(d_flat))
    for got, want in zip(back, parts):
        assert (np.asarray(got) == np.asarray(want)).all()


def test_rate_match_roundtrip_matches_spec():
    K, B, E, rv = 104, 2, 200, 1
    parts = _encoded_batch(K, B, seed=1)
    d_flat = lte_mux_jax(*parts).astype(jnp.float32)
    e = rate_match_jax(d_flat, E, rv)
    assert e.shape == (B, E)
    D = K + 4
    for b in range(B):
        want = rate_match(np.asarray(d_flat)[b, :D], np.asarray(d_flat)[b, D:2 * D],
                          np.asarray(d_flat)[b, 2 * D:], E, rv)
        assert (np.asarray(e)[b] == want).all()
    # de-rate-match matches spec scatter-add
    rng = np.random.default_rng(2)
    llr = rng.normal(size=(B, E)).astype(np.float32)
    acc = np.asarray(de_rate_match_jax(jnp.asarray(llr), K, rv))
    for b in range(B):
        l0, l1, l2 = de_rate_match(llr[b], K, rv)
        np.testing.assert_allclose(acc[b], np.concatenate([l0, l1, l2]),
                                   rtol=1e-5, atol=1e-5)

"""Determinism guards (SURVEY.md section 6): same seeds -> bit-identical
outputs across repeated runs, for both the tx chain and the decoder."""

import numpy as np

import jax
import jax.numpy as jnp

from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from turbotpu.harness.ber import SimConfig, make_step


def test_sim_step_deterministic():
    cfg = SimConfig(name="d", K=40, B=8,
                    decoder=DecoderConfig(K=40, n_iters=2), use_crc=False)
    step = make_step(cfg)
    k = jax.random.key(42)
    a = step(k, jnp.float32(1.0))
    b = step(k, jnp.float32(1.0))
    for x, y in zip(a, b):
        assert int(x) == int(y)


def test_decoder_deterministic():
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    args = (f32(2, 40), f32(2, 40), f32(2, 40), f32(2, 6), f32(2, 6))
    cfg = DecoderConfig(K=40, n_iters=4)
    h1, i1, L1 = turbo_decode(*args, cfg)
    h2, i2, L2 = turbo_decode(*args, cfg)
    assert (np.asarray(h1) == np.asarray(h2)).all()
    assert (np.asarray(L1) == np.asarray(L2)).all()

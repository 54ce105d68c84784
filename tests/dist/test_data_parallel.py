"""Distributed decode on 8 fake CPU devices (SURVEY.md section 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from turbotpu.dist.data_parallel import count_errors_sharded, decode_batch_sharded
from turbotpu.dist.mesh import make_mesh
from turbotpu.golden import numpy_ref as npr
from turbotpu.spec.qpp import qpp_perm


def _batch(K, B, seed=0, ebn0_db=2.0):
    rng = np.random.default_rng(seed)
    perm = qpp_perm(K)
    bits = np.empty((B, K), np.int8)
    parts = [[] for _ in range(5)]
    for b in range(B):
        row = rng.integers(0, 2, K).astype(np.int8)
        bits[b] = row
        for i, x in enumerate(npr.turbo_encode(row, perm)):
            parts[i].append(x)
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    noisy = []
    for p in parts:
        a = np.stack(p).astype(np.float64)
        y = (1 - 2 * a) + sigma * rng.normal(size=a.shape)
        noisy.append(jnp.asarray(2 * y / sigma ** 2, jnp.float32))
    return bits, noisy


def test_sharded_equals_single_device():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8, seq=1)
    K, B = 40, 16
    bits, noisy = _batch(K, B)
    cfg = DecoderConfig(K=K, n_iters=4)
    decode = decode_batch_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in noisy]
    hard_sh, iters_sh, L_sh = decode(*args)
    hard_1, iters_1, L_1 = turbo_decode(*noisy, cfg)
    assert (np.asarray(hard_sh) == np.asarray(hard_1)).all()
    np.testing.assert_allclose(np.asarray(L_sh), np.asarray(L_1),
                               rtol=1e-4, atol=1e-4)


def test_psum_error_counts():
    mesh = make_mesh(data=4, seq=2)
    K, B = 40, 8
    bits, noisy = _batch(K, B, seed=1)
    cfg = DecoderConfig(K=K, n_iters=4)
    decode = decode_batch_sharded(mesh, cfg)
    count = count_errors_sharded(mesh)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in noisy]
    hard, _, _ = decode(*args)
    bit, frame = count(hard, jax.device_put(jnp.asarray(bits), spec))
    want_bit = int((np.asarray(hard) != bits).sum())
    want_frame = int((np.asarray(hard) != bits).any(axis=1).sum())
    assert int(bit) == want_bit and int(frame) == want_frame

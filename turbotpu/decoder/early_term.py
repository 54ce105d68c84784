"""On-device early-termination oracles (SURVEY.md section 3, component 20).

The CRC check over a batch of hard decisions is one fp32 matmul against the
precomputed GF(2) generator matrix followed by mod 2 -- it runs on the MXU,
replacing the reference's per-codeword CRC kernel.  Exactness: fp32 matmul
of 0/1 values is exact for K < 2^24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.crc import crc_matrix


@functools.lru_cache(maxsize=None)
def _crc_check_matrix_np(K: int, poly: int) -> np.ndarray:
    """H (K, 24) with bits @ H == 0 (mod 2) iff the trailing 24 bits of the
    K-bit word are a valid CRC of the leading K-24: H = [G(K-24); I_24]."""
    G = crc_matrix(K - 24, poly)
    return np.concatenate([G, np.eye(24, dtype=G.dtype)]).astype(np.float32)


def make_crc_matrix(K: int, poly: int) -> jax.Array:
    return jnp.asarray(_crc_check_matrix_np(K, poly))


def crc_ok_batch(hard: jax.Array, G: jax.Array) -> jax.Array:
    """hard: (B, K) 0/1 int8; G: (K, 24) fp32. Returns (B,) bool."""
    syndrome = jnp.dot(hard.astype(jnp.float32), G,
                       preferred_element_type=jnp.float32)
    return jnp.all(syndrome % 2.0 == 0.0, axis=1)

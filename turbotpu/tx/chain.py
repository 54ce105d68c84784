"""JAX transmit chain: payload -> CRC -> turbo encode -> (rate match) ->
modulate -> AWGN -> LLR demap (SURVEY.md section 3, components 6-11).

Everything is batched (leading B axis) and jittable; permutations and CRC
matrices are baked in as constants per static K.  The encoder runs as a
`lax.scan` over the trellis table -- test-signal generation only, so clarity
beats peak speed here (the decode path is the hot one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.crc import crc_matrix
from ..spec.trellis import TRELLIS


def gen_payload(key: jax.Array, B: int, n_bits: int) -> jax.Array:
    """(B, n_bits) uniform random information bits, int8."""
    return jax.random.bernoulli(key, 0.5, (B, n_bits)).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("poly",))
def crc_attach_batch(bits: jax.Array, poly: int) -> jax.Array:
    """Append CRC-24 to each row: (B, n) -> (B, n + 24)."""
    n = bits.shape[1]
    G = jnp.asarray(crc_matrix(n, poly).astype(np.float32))
    crc = jnp.dot(bits.astype(jnp.float32), G,
                  preferred_element_type=jnp.float32) % 2.0
    return jnp.concatenate([bits, crc.astype(jnp.int8)], axis=1)


def _rsc_scan(bits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Batched RSC encoder: bits (B, K) -> (parity (B, K), tail (B, 6))."""
    ns = jnp.asarray(TRELLIS.next_state)   # (8, 2)
    par = jnp.asarray(TRELLIS.parity)
    tb = jnp.asarray(TRELLIS.tail_bit)

    def step(state, u):
        p = par[state, u]
        return ns[state, u], p

    B = bits.shape[0]
    s0 = jnp.zeros((B,), jnp.int32)
    sK, parity = jax.lax.scan(step, s0, bits.T.astype(jnp.int32))

    def tail_step(state, _):
        u = tb[state]
        p = par[state, u]
        return ns[state, u], (u, p)

    sF, (tu, tp) = jax.lax.scan(tail_step, sK, None, length=3)
    tail = jnp.stack([tu[0], tp[0], tu[1], tp[1], tu[2], tp[2]], axis=1)
    return parity.T.astype(jnp.int8), tail.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=())
def _turbo_encode_impl(bits: jax.Array, perm: jax.Array):
    par1, tail1 = _rsc_scan(bits)
    par2, tail2 = _rsc_scan(bits[:, perm])
    return bits, par1, par2, tail1, tail2


def turbo_encode(bits: jax.Array, perm: np.ndarray):
    """Canonical-format batched turbo encode.

    Returns (sys (B,K), par1, par2, tail1 (B,6), tail2 (B,6)), int8.
    """
    return _turbo_encode_impl(bits, jnp.asarray(perm))


def modulate_bpsk(bits: jax.Array) -> jax.Array:
    """0 -> +1, 1 -> -1 (so positive LLR favors 0)."""
    return (1 - 2 * bits).astype(jnp.float32)


def awgn(key: jax.Array, x: jax.Array, esn0_db: jax.Array | float) -> jax.Array:
    """Add white Gaussian noise at the given Es/N0 (dB); unit-energy symbols."""
    esn0 = 10.0 ** (jnp.asarray(esn0_db, jnp.float32) / 10.0)
    sigma = jnp.sqrt(1.0 / (2.0 * esn0))
    return x + sigma * jax.random.normal(key, x.shape, jnp.float32)


def demap_bpsk(y: jax.Array, esn0_db: jax.Array | float) -> jax.Array:
    """LLR = 2y / sigma^2 = 4 * (Es/N0) * y (channel reliability scaling)."""
    esn0 = 10.0 ** (jnp.asarray(esn0_db, jnp.float32) / 10.0)
    return 4.0 * esn0 * y


def modulate_qpsk(bits: jax.Array) -> jax.Array:
    """Gray-mapped QPSK as two independent BPSK rails at Es split across
    I/Q: bits (B, 2n) -> complex64 (B, n) with unit symbol energy."""
    i = modulate_bpsk(bits[:, 0::2]) / jnp.sqrt(2.0)
    q = modulate_bpsk(bits[:, 1::2]) / jnp.sqrt(2.0)
    return (i + 1j * q).astype(jnp.complex64)


def awgn_complex(key: jax.Array, x: jax.Array, esn0_db: jax.Array | float) -> jax.Array:
    """Circularly-symmetric AWGN at Es/N0 for unit-energy complex symbols:
    total noise power N0 = 1/(Es/N0), i.e. variance 1/(2*Es/N0) per real
    dimension -- the convention every demapper in this module assumes.
    (A round-2 fix: this used to inject half that power, making all
    complex-modulation BER curves 3 dB optimistic; the uncoded-QPSK
    closed-form anchor in tests/unit/test_qam.py now pins it.)"""
    esn0 = 10.0 ** (jnp.asarray(esn0_db, jnp.float32) / 10.0)
    sigma = jnp.sqrt(1.0 / (2.0 * esn0))  # per-real-dimension std
    kr, ki = jax.random.split(key)
    n = (jax.random.normal(kr, x.shape, jnp.float32)
         + 1j * jax.random.normal(ki, x.shape, jnp.float32))
    return x + sigma * n


def demap_qpsk(y: jax.Array, esn0_db: jax.Array | float) -> jax.Array:
    """Per-rail LLRs, interleaved back to bit order: (B, n) -> (B, 2n)."""
    esn0 = 10.0 ** (jnp.asarray(esn0_db, jnp.float32) / 10.0)
    scale = 4.0 * esn0 / jnp.sqrt(2.0)
    B, n = y.shape
    out = jnp.empty((B, 2 * n), jnp.float32)
    out = out.at[:, 0::2].set(scale * jnp.real(y))
    out = out.at[:, 1::2].set(scale * jnp.imag(y))
    return out


# ---------------------------------------------------------------------------
# Rayleigh flat fading with perfect CSI (SURVEY.md section 3 component 10/11
# extension: the standard second channel model decoder harnesses validate on)
# ---------------------------------------------------------------------------

def rayleigh_fading(key: jax.Array, x: jax.Array,
                    esn0_db: jax.Array | float
                    ) -> tuple[jax.Array, jax.Array]:
    """Per-symbol Rayleigh flat fading + noise; returns (z, a).

    Channel: y = h * x + n with h ~ CN(0, 1) i.i.d. per symbol and
    circularly-symmetric noise at the given Es/N0 (E[|h|^2] = 1, so the
    average Es/N0 label is unchanged).  The receiver has perfect CSI and
    applies the maximal-ratio rotation z = conj(h) * y / |h|, which leaves

        z = a * x + n'        a = |h| (Rayleigh),  n' ~ same law as n

    because the rotation is unitary on circular noise.  Returns the rotated
    observation `z` (real for real `x`, taking Re(.) -- the imaginary rail
    of a real constellation carries no signal) and the CSI amplitudes `a`,
    to be passed to the *_csi demappers / `demap_qam(..., amp=a)`.
    """
    kh, kn = jax.random.split(key)
    hr = jax.random.normal(kh, (2,) + x.shape, jnp.float32) / jnp.sqrt(2.0)
    h = (hr[0] + 1j * hr[1]).astype(jnp.complex64)
    a = jnp.abs(h)
    if jnp.iscomplexobj(x):
        y = awgn_complex(kn, h * x, esn0_db)
        return jnp.conj(h) / a.astype(jnp.complex64) * y, a
    # Real constellation on a complex channel: after the MRC rotation the
    # in-phase rail is a*x + Re(n'), Re(n') real Gaussian with the same
    # per-dimension variance as the real-channel AWGN model.
    y = awgn_complex(kn, (h * x.astype(jnp.complex64)), esn0_db)
    return jnp.real(jnp.conj(h) / a.astype(jnp.complex64) * y), a


def demap_bpsk_csi(z: jax.Array, a: jax.Array,
                   esn0_db: jax.Array | float) -> jax.Array:
    """BPSK LLR with per-symbol CSI amplitude: L = 4 * (Es/N0) * a * z."""
    esn0 = 10.0 ** (jnp.asarray(esn0_db, jnp.float32) / 10.0)
    return 4.0 * esn0 * a * z


def demap_qpsk_csi(z: jax.Array, a: jax.Array,
                   esn0_db: jax.Array | float) -> jax.Array:
    """QPSK per-rail LLRs with CSI: each rail is BPSK at amplitude a/sqrt(2)."""
    esn0 = 10.0 ** (jnp.asarray(esn0_db, jnp.float32) / 10.0)
    scale = 4.0 * esn0 / jnp.sqrt(2.0) * a
    B, n = z.shape
    out = jnp.empty((B, 2 * n), jnp.float32)
    out = out.at[:, 0::2].set(scale * jnp.real(z))
    out = out.at[:, 1::2].set(scale * jnp.imag(z))
    return out

"""Device-side rate matching: gather on tx, scatter-add on rx.

The index maps come from the host-side precompute in spec/rate_match.py;
on device the ops are a single `take` / `at[].add` over the batch
(SURVEY.md section 3, components 7-8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.rate_match import select_indices


def lte_mux_jax(sys, par1, par2, tail1, tail2) -> jax.Array:
    """Batched canonical -> flat LTE d-streams (B, 3*(K+4)).

    Layout [d0 | d1 | d2] with the TS 36.212 tail multiplexing of
    golden/numpy_ref.lte_mux.
    """
    d0 = jnp.concatenate([sys, tail1[:, 0:1], tail1[:, 3:4],
                          tail2[:, 0:1], tail2[:, 3:4]], axis=1)
    d1 = jnp.concatenate([par1, tail1[:, 1:2], tail1[:, 4:5],
                          tail2[:, 1:2], tail2[:, 4:5]], axis=1)
    d2 = jnp.concatenate([par2, tail1[:, 2:3], tail1[:, 5:6],
                          tail2[:, 2:3], tail2[:, 5:6]], axis=1)
    return jnp.concatenate([d0, d1, d2], axis=1)


def umts_mux_jax(sys, par1, par2, tail1, tail2) -> jax.Array:
    """Batched canonical -> UMTS wire order (B, 3K+12).

    TS 25.212 section 4.2.3.1 (golden/numpy_ref.umts_mux): per-bit
    interlace x1 z1 z'1 x2 z2 z'2 ... xK zK z'K, then the 12 tail bits
    x_K+1 z_K+1 x_K+2 z_K+2 x_K+3 z_K+3 then encoder 2's tail.
    """
    B, K = sys.shape
    body = jnp.stack([sys, par1, par2], axis=2).reshape(B, 3 * K)
    return jnp.concatenate([body, tail1, tail2], axis=1)


def umts_demux_jax(wire: jax.Array):
    """Batched UMTS wire order (B, 3K+12) -> canonical LLR parts."""
    B = wire.shape[0]
    K = (wire.shape[1] - 12) // 3
    body = wire[:, :3 * K].reshape(B, K, 3)
    return (body[:, :, 0], body[:, :, 1], body[:, :, 2],
            wire[:, 3 * K:3 * K + 6], wire[:, 3 * K + 6:])


def lte_demux_jax(d_flat: jax.Array):
    """Batched flat d-streams (B, 3*(K+4)) -> canonical LLR parts."""
    D = d_flat.shape[1] // 3
    K = D - 4
    d0, d1, d2 = d_flat[:, :D], d_flat[:, D:2 * D], d_flat[:, 2 * D:]
    ls, lp1, lp2 = d0[:, :K], d1[:, :K], d2[:, :K]
    tail1 = jnp.stack([d0[:, K], d1[:, K], d2[:, K],
                       d0[:, K + 1], d1[:, K + 1], d2[:, K + 1]], axis=1)
    tail2 = jnp.stack([d0[:, K + 2], d1[:, K + 2], d2[:, K + 2],
                       d0[:, K + 3], d1[:, K + 3], d2[:, K + 3]], axis=1)
    return ls, lp1, lp2, tail1, tail2


@functools.lru_cache(maxsize=None)
def _sel_idx(K: int, E: int, rv: int, n_cb, F: int = 0) -> np.ndarray:
    return select_indices(K, E, rv, n_cb, F)


def rate_match_jax(d_flat: jax.Array, E: int, rv: int = 0,
                   n_cb: int | None = None, F: int = 0) -> jax.Array:
    """(B, 3D) -> (B, E) transmitted soft/hard bits."""
    K = d_flat.shape[1] // 3 - 4
    idx = jnp.asarray(_sel_idx(K, E, rv, n_cb, F))
    return d_flat[:, idx]


def de_rate_match_jax(llr_e: jax.Array, K: int, rv: int = 0,
                      n_cb: int | None = None, F: int = 0) -> jax.Array:
    """(B, E) received LLRs -> (B, 3D) combined stream LLRs.

    Repetition combines by scatter-add; punctured positions (and filler
    positions when F > 0) stay 0.
    """
    E = llr_e.shape[1]
    D = K + 4
    idx = jnp.asarray(_sel_idx(K, E, rv, n_cb, F))
    out = jnp.zeros((llr_e.shape[0], 3 * D), llr_e.dtype)
    return out.at[:, idx].add(llr_e)


def de_rate_match_harq_jax(llr_e_txs, K: int, rvs, n_cb=None,
                           F: int = 0) -> jax.Array:
    """HARQ incremental-redundancy combining: de-rate-match each
    retransmission (B, E_t) at its redundancy version and SUM the LLRs
    (TS 36.212 s5.1.4.1.2 circular buffer, soft combining across rv_idx)."""
    assert len(llr_e_txs) == len(rvs)
    out = None
    for llr_e, rv in zip(llr_e_txs, rvs):
        d = de_rate_match_jax(llr_e, K, rv, n_cb, F)
        out = d if out is None else out + d
    return out

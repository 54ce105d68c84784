"""SISO BCJR via `jax.lax.associative_scan` over the (max*, +) semiring.

Implementation (b) of the forward/backward recursions (BASELINE.json north
star; SURVEY.md section 3 component 13): each trellis step is an 8x8
transition matrix over the tropical semiring (max-log) or the log-semiring
(log-MAP: "sum" = logsumexp), and alpha prefixes / beta suffixes are
all-prefix products computed in O(log K) depth.

Cost trade (SURVEY.md section 8, hard part 1): 8x8x8 work per combine vs
8x2 for the sequential form -- ~32x the FLOPs for log depth.  Wins when the
batch is too small to fill the VPU; loses to the Pallas sequential kernel at
production batch sizes.  Both ship; the benchmark decides per shape.

Per-combine normalization (subtracting the per-matrix max) keeps metrics
bounded over 6k steps; it shifts every entry of a prefix product by a
constant, which cancels in the final LLR difference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.trellis import TRELLIS, N_STATES
from .maxstar import LOGMAP, MAXLOG
from .scan import NEG, llr_stage


def _edge_masks():
    """Constant (8, 8) masks: valid[s2, s1], u[s2, s1], par[s2, s1]."""
    valid = np.zeros((N_STATES, N_STATES), np.float32)
    u_mask = np.zeros((N_STATES, N_STATES), np.float32)
    p_mask = np.zeros((N_STATES, N_STATES), np.float32)
    for s1 in range(N_STATES):
        for u in (0, 1):
            s2 = TRELLIS.next_state[s1, u]
            valid[s2, s1] = 1.0
            u_mask[s2, s1] = float(u)
            p_mask[s2, s1] = float(TRELLIS.parity[s1, u])
    return jnp.asarray(valid), jnp.asarray(u_mask), jnp.asarray(p_mask)


def _combine(mode: str):
    def fn(a, b):
        # Compose b after a: out[i, j] = max*_s b[i, s] + a[s, j].
        s = b[..., :, :, None] + a[..., None, :, :]
        if mode == MAXLOG:
            out = jnp.max(s, axis=-2)
        else:
            out = jax.nn.logsumexp(s, axis=-2)
        return out - jnp.max(out, axis=(-2, -1), keepdims=True)
    return fn


@functools.partial(jax.jit, static_argnames=("mode",))
def siso_decode_ascan(ls: jax.Array, lp: jax.Array, la: jax.Array,
                      mode: str = LOGMAP) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for siso_decode_scan (same shapes/semantics)."""
    B, KT = ls.shape
    K = la.shape[1]
    valid, u_mask, p_mask = _edge_masks()

    laf = jnp.pad(la, ((0, 0), (0, KT - K)))
    A = -(laf + ls)            # (B, KT)
    P = -lp

    # M[k, b, s2, s1] = gamma_k(u, par) on valid edges, NEG elsewhere.
    gam = (A.T[:, :, None, None] * u_mask + P.T[:, :, None, None] * p_mask)
    M = jnp.where(valid.astype(bool), gam, NEG)          # (KT, B, 8, 8)

    # alpha prefixes: P_k = M_k o ... o M_0; alpha AFTER step k = P_k[:, :, 0]
    # (encoder starts in state 0).  Emit alpha BEFORE each step.
    pref = jax.lax.associative_scan(_combine(mode), M, axis=0)
    a0 = jnp.full((1, B, N_STATES), NEG, ls.dtype).at[:, :, 0].set(0.0)
    alphas = jnp.concatenate([a0, pref[:-1, :, :, 0]], axis=0)   # (KT, B, 8)

    # beta suffixes over N_k = M_k^T: R_k = N_k o N_{k+1} o ... o N_{KT-1};
    # beta BEFORE step k ... we need beta AFTER step k: R_{k+1}[:, :, 0]
    # (trellis terminates in state 0).
    N = jnp.swapaxes(M, -1, -2)
    suf = jax.lax.associative_scan(_combine(mode), N, axis=0, reverse=True)
    bT = jnp.full((1, B, N_STATES), NEG, ls.dtype).at[:, :, 0].set(0.0)
    betas = jnp.concatenate([suf[1:, :, :, 0], bT], axis=0)      # (KT, B, 8)

    return llr_stage(alphas, betas, A, P, ls, la, mode)

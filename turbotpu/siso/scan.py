"""Batched SISO BCJR via `jax.lax.scan` (reference XLA implementation).

This is implementation (a) of SURVEY.md section 3 components 13-15: the
forward/backward recursions run as a sequential `lax.scan` over trellis
steps with the codeword batch vectorized across VPU lanes.  It is the
correctness baseline the Pallas fused kernel (pallas_kernel.py) and the
`associative_scan` variant (ascan.py) are tested against bit-for-bit.

Shapes: batch-major.  ls, lp are (B, KT) with KT = K + 3 (info + tail);
la is (B, K); state metrics are (B, 8).

LLR convention: positive favors bit 0 (matches golden/numpy_ref.py).
Branch metric for hypothesis (u, c) in {0,1}^2: gamma = -u*(la+ls) - c*lp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.trellis import TRELLIS, N_STATES
from .maxstar import LOGMAP, MAXLOG, maxstar2, maxstar_reduce

NEG = -1e30


def _tables():
    ns = jnp.asarray(TRELLIS.next_state)       # (8, 2)
    ps = jnp.asarray(TRELLIS.prev_state)       # (8, 2)
    pp = jnp.asarray(TRELLIS.prev_parity)      # (8, 2)
    par = jnp.asarray(TRELLIS.parity)          # (8, 2)
    return ns, ps, pp, par


@functools.partial(jax.jit, static_argnames=("mode",))
def siso_decode_scan(ls: jax.Array, lp: jax.Array, la: jax.Array,
                     mode: str = LOGMAP) -> tuple[jax.Array, jax.Array]:
    """One SISO half-iteration on a terminated trellis.

    Args:
      ls:  (B, K+3) systematic channel LLRs (info + tail).
      lp:  (B, K+3) parity channel LLRs.
      la:  (B, K) a-priori LLRs for info bits.
      mode: "logmap" | "maxlog".
    Returns:
      (L, Le): (B, K) a-posteriori and extrinsic LLRs.
    """
    L, Le, _, _ = siso_scan_boundary(ls, lp, la, None, None, mode)
    return L, Le


@functools.partial(jax.jit, static_argnames=("mode",))
def siso_scan_boundary(ls: jax.Array, lp: jax.Array, la: jax.Array,
                       alpha0: jax.Array | None, betaT: jax.Array | None,
                       mode: str = LOGMAP):
    """SISO over a trellis *segment* with explicit boundary metrics.

    alpha0 / betaT: (B, 8) boundary state metrics at the segment's left /
    right edge, or None for the terminated-codeword boundary e_0.  Used by
    the cross-device windowed BCJR (NII boundary exchange over ppermute,
    SURVEY.md section 3, component 23); la covers the first K of KT steps.

    Returns (L, Le, alpha_out, beta_out): LLRs for the first K steps plus
    the outgoing boundary metrics (alpha after the last step, beta before
    the first step), each (B, 8).
    """
    B, KT = ls.shape
    K = la.shape[1]
    ns, ps, pp, par = _tables()

    laf = jnp.pad(la, ((0, 0), (0, KT - K)))
    # Per-step branch-metric generators: A = -(la + ls), P = -lp, so that
    # gamma(u, c) = u*A + c*P.
    A = -(laf + ls)            # (B, KT)
    P = -lp                    # (B, KT)

    if alpha0 is None:
        a0 = jnp.full((B, N_STATES), NEG, ls.dtype).at[:, 0].set(0.0)
    else:
        a0 = alpha0.astype(ls.dtype)

    def alpha_step(alpha, inp):
        a_k, p_k = inp                               # (B,), (B,)
        # candidate from predecessor with input u: alpha[ps[s,u]] + gamma.
        prev0 = alpha[:, ps[:, 0]] + p_k[:, None] * pp[None, :, 0]
        prev1 = alpha[:, ps[:, 1]] + a_k[:, None] + p_k[:, None] * pp[None, :, 1]
        new = maxstar2(prev0, prev1, mode)
        new = new - jnp.max(new, axis=1, keepdims=True)
        return new, alpha                            # emit alpha BEFORE step k

    with jax.named_scope("siso_alpha"):
        alpha_out, alphas = jax.lax.scan(alpha_step, a0, (A.T, P.T))
    # alphas: (KT, B, 8) = alpha_0 .. alpha_{KT-1}

    if betaT is None:
        bT = jnp.full((B, N_STATES), NEG, ls.dtype).at[:, 0].set(0.0)
    else:
        bT = betaT.astype(ls.dtype)

    def beta_step(beta, inp):
        a_k, p_k = inp
        # beta_k(s) = max*_u beta_{k+1}(ns[s,u]) + gamma_k(u, par[s,u])
        nxt0 = beta[:, ns[:, 0]] + p_k[:, None] * par[None, :, 0]
        nxt1 = beta[:, ns[:, 1]] + a_k[:, None] + p_k[:, None] * par[None, :, 1]
        new = maxstar2(nxt0, nxt1, mode)
        new = new - jnp.max(new, axis=1, keepdims=True)
        return new, beta                             # emit beta AFTER step k
    with jax.named_scope("siso_beta"):
        beta_out, betas = jax.lax.scan(beta_step, bT, (A.T, P.T),
                                       reverse=True)
    # betas: (KT, B, 8) = beta_1 .. beta_KT

    with jax.named_scope("siso_llr"):
        L, Le = llr_stage(alphas, betas, A, P, ls, la, mode)
    return L, Le, alpha_out, beta_out


def llr_stage(alphas: jax.Array, betas: jax.Array, A: jax.Array, P: jax.Array,
              ls: jax.Array, la: jax.Array, mode: str) -> tuple[jax.Array, jax.Array]:
    """Final BCJR stage shared by all SISO impls.

    alphas: (KT, B, 8) alpha BEFORE each step; betas: (KT, B, 8) beta AFTER
    each step; A = -(la+ls), P = -lp of shape (B, KT).
    """
    ns, _, _, par = _tables()
    K = la.shape[1]
    ak = alphas[:K]                                  # (K, B, 8) alpha_k
    bk1 = betas[:K]                                  # (K, B, 8) beta_{k+1}
    Ak = A.T[:K][:, :, None]                         # (K, B, 1)
    Pk = P.T[:K][:, :, None]
    # bk1[:, :, ns[:, u]] gathers beta at the successor state of each branch.
    m0 = ak + Pk * par[None, None, :, 0] + bk1[:, :, ns[:, 0]]
    m1 = ak + Ak + Pk * par[None, None, :, 1] + bk1[:, :, ns[:, 1]]
    L = (maxstar_reduce(m0, 2, mode) - maxstar_reduce(m1, 2, mode)).T  # (B, K)
    Le = L - la - ls[:, :K]
    return L, Le

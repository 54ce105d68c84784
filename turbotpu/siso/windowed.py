"""Sliding-window SISO with acquisition warm-up (overlap-save analog).

SURVEY.md section 3, component 18.  The trellis is cut into n_win windows of
W steps; every window is decoded independently with Q extra warm-up steps of
*real* neighboring data on each side (overlap-save): alpha warms up from a
uniform prior Q steps left of the window, beta from Q steps right.  Windows
then become extra batch: the sequential span drops from K+3 to W+2Q while
the VPU stays full -- the TPU-native answer to the CUDA
thread-block-per-window layout.

Exactness: approximate, converging to exact BCJR as Q grows; Q = 32 (about
10 constraint lengths) is the literature's near-lossless setting and is
validated against the 0.05 dB bar by the BER suite.  Block edges keep the
exact terminated boundaries (alpha_0 = beta_end = e_0) via known-zero-bit
padding, which only takes u=0 edges -- state 0 is a fixed point, so the
padded recursion is exact at real positions (same argument as the Pallas
kernel's tail handling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.trellis import N_STATES
from .maxstar import LOGMAP
from .scan import NEG, siso_scan_boundary

BIG = 1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_windowed_siso(W: int = 256, Q: int = 32):
    """Returns siso(ls, lp, la, mode) with the standard SISO signature."""

    @functools.partial(jax.jit, static_argnames=("mode",))
    def siso_decode_windowed(ls: jax.Array, lp: jax.Array, la: jax.Array,
                             mode: str = LOGMAP):
        B, KT = ls.shape
        K = la.shape[1]
        if KT <= W + 2 * Q:
            # Too short to be worth windowing: exact full-block scan.
            L, Le, _, _ = siso_scan_boundary(ls, lp, la, None, None, mode)
            return L, Le

        KTp = _round_up(KT, W)
        n_win = KTp // W
        # Pad: right to KTp with known-0 steps, plus Q on both sides.
        ls_e = jnp.pad(ls, ((0, 0), (Q, KTp - KT + Q)), constant_values=BIG)
        lp_e = jnp.pad(lp, ((0, 0), (Q, KTp - KT + Q)))
        la_e = jnp.pad(la, ((0, 0), (Q, KTp - K + Q)))

        # Extended windows: window w covers [w*W - Q, w*W + W + Q) in
        # unpadded coordinates = [w*W, w*W + W + 2Q) in padded ones.
        WE = W + 2 * Q
        idx = (np.arange(n_win)[:, None] * W + np.arange(WE)[None, :])
        win = lambda x: x[:, idx].reshape(B * n_win, WE)
        ls_w, lp_w, la_w = win(ls_e), win(lp_e), win(la_e)

        # Boundary metrics: uniform at warm-up edges, exact e_0 at the
        # outermost block edges (window 0 left, window n-1 right -- both in
        # the known-0 pad region, where e_0 propagates exactly).
        uni = jnp.zeros((B, n_win, N_STATES), ls.dtype)
        e0 = jnp.full((N_STATES,), NEG, ls.dtype).at[0].set(0.0)
        alpha0 = uni.at[:, 0].set(e0).reshape(B * n_win, N_STATES)
        betaT = uni.at[:, n_win - 1].set(e0).reshape(B * n_win, N_STATES)

        _, Le_w, _, _ = siso_scan_boundary(ls_w, lp_w, la_w, alpha0, betaT,
                                           mode)
        Le = Le_w.reshape(B, n_win, WE)[:, :, Q:Q + W].reshape(B, KTp)[:, :K]
        L = Le + la + ls[:, :K]
        return L, Le

    return siso_decode_windowed

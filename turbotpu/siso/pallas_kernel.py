"""Fused Pallas TPU SISO kernel: gamma/alpha/beta/LLR in one kernel.

This is the performance path (SURVEY.md section 3, components 12-18; the
TPU-native equivalent of the reference's fused CUDA SISO kernel).  Design
points, chosen for the TPU execution model rather than translated from any
GPU layout:

* **States are SSA values, not data.**  The 8 trellis state metrics live as
  8 separate (8, 128) fp32 tiles; the trellis "gather" (prev/next-state
  permutation) is pure register renaming in the unrolled step -- zero data
  movement, where a CUDA kernel burns shared-memory traffic on it.
* **Batch fills the VPU.**  Each grid cell decodes 1024 codewords: 8
  sublanes x 128 lanes per state tile.  All step arithmetic is full-tile
  VPU work.
* **Exact two-phase checkpoint/recompute.**  Phase 1 scans alpha forward,
  storing only per-window boundary metrics (the TPU analog of the CUDA
  shared-memory sliding window, but bit-exact rather than approximate).
  Phase 2 walks windows backward: recomputes alpha within the window from
  its checkpoint, runs beta through it, and emits extrinsic LLRs.  VMEM
  holds one window of alphas (W x 8 tiles), not the whole block.
* **Double-buffered DMA.**  Branch-metric inputs stream HBM -> VMEM one
  window ahead of compute in both phases; Le streams back per window.
* **Tail via known-bit padding.**  Inputs are padded to a multiple of the
  window with A = -BIG (systematic LLR "certainly 0") and P = 0.  Those
  pad steps only take u=0 edges, and state 0 is a fixed point of the u=0
  transition, so beta at the true trellis end is exactly e_0 -- the padded
  kernel is bit-identical to the unpadded recursion on real positions.

Numerics: fp32 metrics, max-subtract renormalization every UNROLL steps
(SURVEY.md section 8, hard part 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.trellis import TRELLIS
from .maxstar import LOGMAP, MAXLOG

BIG = 1e9
CELL = 1024          # codewords per grid cell: 8 sublanes x 128 lanes
UNROLL = 8           # trellis steps per fori body; also renorm cadence

# Python-int trellis tables for compile-time unrolling.
_PS = TRELLIS.prev_state.tolist()    # ps[s2][u]
_PP = TRELLIS.prev_parity.tolist()   # parity on edge ps[s2][u] -> s2
_NS = TRELLIS.next_state.tolist()    # ns[s][u]
_PAR = TRELLIS.parity.tolist()       # parity on edge s -(u)-> ns


def _mstar(a, b, mode):
    m = jnp.maximum(a, b)
    if mode == MAXLOG:
        return m
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _mstar_tree(vals, mode):
    """max* reduction of a list of tiles, balanced tree."""
    while len(vals) > 1:
        vals = [_mstar(vals[i], vals[i + 1], mode) for i in range(0, len(vals) - 1, 2)] \
            + ([vals[-1]] if len(vals) % 2 else [])
    return vals[0]


def _gammas(a_row, p_row):
    """The four branch metrics gamma(u, c) = u*A + c*P as tiles (or None
    for the zero metric)."""
    return {(0, 0): None, (0, 1): p_row, (1, 0): a_row, (1, 1): a_row + p_row}


def _add(x, g):
    return x if g is None else x + g


def _alpha_step(alpha, a_row, p_row, mode):
    g = _gammas(a_row, p_row)
    return tuple(
        _mstar(_add(alpha[_PS[s2][0]], g[(0, _PP[s2][0])]),
               _add(alpha[_PS[s2][1]], g[(1, _PP[s2][1])]), mode)
        for s2 in range(8))


def _beta_step(beta, a_row, p_row, mode):
    g = _gammas(a_row, p_row)
    return tuple(
        _mstar(_add(beta[_NS[s][0]], g[(0, _PAR[s][0])]),
               _add(beta[_NS[s][1]], g[(1, _PAR[s][1])]), mode)
        for s in range(8))


def _renorm(vals):
    m = vals[0]
    for v in vals[1:]:
        m = jnp.maximum(m, v)
    return tuple(v - m for v in vals)


def _extrinsic(alpha, beta, p_row, mode):
    """Le row: max*_s(alpha + c0*P + beta[ns0]) - max*_s(alpha + c1*P + beta[ns1]).

    The u=1 systematic+apriori term A cancels against (L - la - ls), so the
    extrinsic needs only parity metrics (see module docstring derivation in
    turbotpu/golden/numpy_ref.py conventions).
    """
    g = {0: None, 1: p_row}
    m0 = _mstar_tree(
        [_add(alpha[s] + beta[_NS[s][0]], g[_PAR[s][0]]) for s in range(8)], mode)
    m1 = _mstar_tree(
        [_add(alpha[s] + beta[_NS[s][1]], g[_PAR[s][1]]) for s in range(8)], mode)
    return m0 - m1


def _init_e0():
    z = jnp.zeros((8, 128), jnp.float32)
    neg = jnp.full((8, 128), -BIG, jnp.float32)
    return (z,) + (neg,) * 7


def _make_kernel(n_win: int, W: int, mode: str):
    n_sub = W // UNROLL
    assert W % UNROLL == 0

    def kernel(a_hbm, p_hbm, le_hbm, a_buf, p_buf, ckpt, aw, le_buf,
               a_sem, p_sem, o_sem):
        cell = pl.program_id(0)

        def in_dma(slot, w):
            a = pltpu.make_async_copy(
                a_hbm.at[cell, pl.ds(w * W, W)], a_buf.at[slot], a_sem.at[slot])
            p = pltpu.make_async_copy(
                p_hbm.at[cell, pl.ds(w * W, W)], p_buf.at[slot], p_sem.at[slot])
            return a, p

        def start_in(slot, w):
            for d in in_dma(slot, w):
                d.start()

        def wait_in(slot, w):
            for d in in_dma(slot, w):
                d.wait()

        def chunk(buf, slot, i):
            """One unroll-block of branch metrics: (UNROLL, 8, 128)."""
            return buf[slot, pl.ds(i * UNROLL, UNROLL)]

        # ---------------- Phase 1: forward alpha, checkpoints only --------
        start_in(0, 0)

        def phase1_body(w, alpha):
            slot = jax.lax.rem(w, 2)

            @pl.when(w + 1 < n_win)
            def _():
                start_in(jax.lax.rem(w + 1, 2), w + 1)

            wait_in(slot, w)
            for s in range(8):
                ckpt[w, s] = alpha[s]

            def fwd_body(i, alpha):
                ca = chunk(a_buf, slot, i)
                cp = chunk(p_buf, slot, i)
                for j in range(UNROLL):
                    alpha = _alpha_step(alpha, ca[j], cp[j], mode)
                return _renorm(alpha)

            return jax.lax.fori_loop(0, n_sub, fwd_body, alpha)

        jax.lax.fori_loop(0, n_win, phase1_body, _init_e0())

        # ---------------- Phase 2: backward, recompute alpha, emit Le -----
        start_in((n_win - 1) % 2, n_win - 1)

        def phase2_body(wi, beta):
            w = n_win - 1 - wi
            slot = jax.lax.rem(w, 2)

            @pl.when(w - 1 >= 0)
            def _():
                start_in(jax.lax.rem(w + 1, 2), w - 1)

            wait_in(slot, w)
            alpha = tuple(ckpt[w, s] for s in range(8))

            def rec_body(i, alpha):
                ca = chunk(a_buf, slot, i)
                cp = chunk(p_buf, slot, i)
                for j in range(UNROLL):
                    t = i * UNROLL + j
                    for s in range(8):
                        aw[t, s] = alpha[s]
                    alpha = _alpha_step(alpha, ca[j], cp[j], mode)
                return _renorm(alpha)

            jax.lax.fori_loop(0, n_sub, rec_body, alpha)

            def bwd_body(i, beta):
                i0 = W - (i + 1) * UNROLL
                ca = chunk(a_buf, slot, i0 // UNROLL)
                cp = chunk(p_buf, slot, i0 // UNROLL)
                for j in range(UNROLL - 1, -1, -1):
                    t = i0 + j
                    alpha_t = tuple(aw[t, s] for s in range(8))
                    le_buf[t] = _extrinsic(alpha_t, beta, cp[j], mode)
                    beta = _beta_step(beta, ca[j], cp[j], mode)
                return _renorm(beta)

            beta = jax.lax.fori_loop(0, n_sub, bwd_body, beta)

            # Synchronous Le write-back: le_buf is reused next window.  The
            # copy is ~0.5 MB against ~an order of magnitude more window
            # compute, so overlap buys little here.
            out = pltpu.make_async_copy(
                le_buf, le_hbm.at[cell, pl.ds(w * W, W)], o_sem)
            out.start()
            out.wait()
            return beta

        jax.lax.fori_loop(0, n_win, phase2_body, _init_e0())

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(n_cells: int, KTp: int, W: int, mode: str, interpret: bool):
    n_win = KTp // W
    kernel = _make_kernel(n_win, W, mode)
    return pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_cells, KTp, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W, 8, 128), jnp.float32),      # A window buffers
            pltpu.VMEM((2, W, 8, 128), jnp.float32),      # P window buffers
            pltpu.VMEM((n_win, 8, 8, 128), jnp.float32),  # alpha checkpoints
            pltpu.VMEM((W, 8, 8, 128), jnp.float32),      # alpha within window
            pltpu.VMEM((W, 8, 128), jnp.float32),         # Le window buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def window_len(KT: int) -> int:
    return 128 if KT >= 256 else _round_up(KT, UNROLL)


def to_cells(x: jax.Array) -> jax.Array:
    """(Bp, T) -> (cells, T, 8, 128), batch b = cell*1024 + sub*128 + lane.
    Bp must be a multiple of CELL."""
    Bp, T = x.shape
    return x.reshape(Bp // CELL, 8, 128, T).transpose(0, 3, 1, 2)


def from_cells(x: jax.Array) -> jax.Array:
    """(cells, T, 8, 128) -> (cells*1024, T)."""
    n, T, _, _ = x.shape
    return x.transpose(0, 2, 3, 1).reshape(n * CELL, T)


def siso_cells(A_cells: jax.Array, P_cells: jax.Array, mode: str,
               interpret: bool | None = None) -> jax.Array:
    """Cell-layout kernel entry: branch metrics in, extrinsics out.

    A = -(la + ls), P = -lp, each (cells, KTp, 8, 128) with KTp a multiple
    of the window and trailing pad steps encoded as A = -BIG, P = 0.
    Returns Le in the same layout (rows beyond the info length are garbage).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_cells, KTp = A_cells.shape[:2]
    W = window_len(KTp)
    return _build_call(n_cells, KTp, W, mode, interpret)(A_cells, P_cells)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def siso_decode_pallas(ls: jax.Array, lp: jax.Array, la: jax.Array,
                       mode: str = LOGMAP, interpret: bool | None = None
                       ) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for siso_decode_scan (same shapes/semantics)."""
    if interpret is None:
        # Mosaic kernels need real TPU hardware; fall back to the Pallas
        # interpreter on CPU so tests exercise the same kernel code.
        interpret = jax.default_backend() != "tpu"
    B, KT = ls.shape
    K = la.shape[1]
    W = 128 if KT >= 256 else _round_up(KT, UNROLL)
    KTp = _round_up(KT, W)

    laf = jnp.pad(la, ((0, 0), (0, KT - K)))
    A = -(laf + ls)
    P = -lp
    # Pad time with known-0 steps (A = -BIG, P = 0); pad batch to CELL.
    A = jnp.pad(A, ((0, 0), (0, KTp - KT)), constant_values=-BIG)
    P = jnp.pad(P, ((0, 0), (0, KTp - KT)))
    Bp = _round_up(B, CELL)
    A = jnp.pad(A, ((0, Bp - B), (0, 0)))
    P = jnp.pad(P, ((0, Bp - B), (0, 0)))
    n_cells = Bp // CELL

    # (Bp, KTp) -> (cells, KTp, 8, 128): batch b = cell*1024 + sub*128 + lane.
    def to_cells(x):
        x = x.reshape(n_cells, 8, 128, KTp)
        return x.transpose(0, 3, 1, 2)

    le_cells = _build_call(n_cells, KTp, W, mode, interpret)(
        to_cells(A.astype(jnp.float32)), to_cells(P.astype(jnp.float32)))
    le = le_cells.transpose(0, 2, 3, 1).reshape(Bp, KTp)[:B, :K]
    L = le + la + ls[:, :K]
    return L, le

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
from .maxstar import LINLOG, LOGMAP, MAXLOG, _LIN_C0, _LIN_C1

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
    if mode == LINLOG:
        return m + jnp.maximum(0.0, _LIN_C0 - _LIN_C1 * jnp.abs(a - b))
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

    In max-log mode the parity add is factored out of the reduction: the
    8 edges per u split 4/4 by parity for this trellis, so P is added
    ONCE to the parity-1 subtree result instead of to each of its 4
    leaves (3 fewer tile-adds per u per step, ~7% of the kernel's
    counted ops).  Bit-exact there: rounding is monotone, so
    max(fl(x+p), fl(y+p)) == fl(max(x, y) + p).  log-MAP would be
    mathematically exact too (log-sum-exp is associative and
    shift-invariant) but reassociates rounding, and linlog's clipped
    correction is genuinely tree-order-dependent -- both keep the
    per-leaf form so they stay aligned with the scan reference.
    """
    if mode == MAXLOG:
        def side(u):
            t0 = [alpha[s] + beta[_NS[s][u]] for s in range(8)
                  if not _PAR[s][u]]
            t1 = [alpha[s] + beta[_NS[s][u]] for s in range(8)
                  if _PAR[s][u]]
            return _mstar(_mstar_tree(t0, mode),
                          _mstar_tree(t1, mode) + p_row, mode)
        return side(0) - side(1)
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


def _quantize_le(le: jax.Array, dt, qscale: float) -> jax.Array:
    """Cast an fp32 extrinsic row to the extrinsic HBM dtype.

    float8_e4m3fn has no inf and XLA's convert overflows to NaN, so the
    value is saturated at the format max first (an LLR of +-448 is
    already absolute certainty -- clipping is semantically free).  int8
    is uniform quantization at step `qscale` saturated to +-127, the
    fixed-point extrinsic representation hardware turbo decoders use
    (6-8 bit extrinsics are standard); the matching dequant is folded
    into the kernel's a-priori scale multiply, so reading int8 costs
    nothing over bf16."""
    if dt == jnp.int8:
        return jnp.clip(jnp.round(le * (1.0 / qscale)),
                        -127.0, 127.0).astype(jnp.int8)
    if dt == jnp.dtype("float8_e4m3fn"):
        return jnp.clip(le, -448.0, 448.0).astype(dt)
    return le.astype(dt)


def _make_kernel(n_win: int, W: int, mode: str, K_real: int, scale: float,
                 boundary: bool, nii: bool = False,
                 with_offset: bool = False, ext_qscale: float = 0.0,
                 fold_gather: bool = False):
    """Fused SISO kernel body.

    Streams raw (ls, lp, la) from HBM and forms branch metrics in VMEM:
        A = -(scale * la * [t < K_real] + ls),   P = -lp
    so the turbo loop never materializes branch-metric tensors in HBM
    (that glue cost rivaled the kernel itself).  The [t < K_real] mask
    zeroes a-priori on tail/pad steps, letting callers pass extrinsic
    buffers with garbage beyond the info region.

    With boundary=True the recursions start from caller-provided edge
    metrics (alpha0/betaT per codeword) and the kernel also returns the
    outgoing edges -- the contract the cross-device windowed BCJR uses.

    With nii=True (next-iteration initialization, the standard windowed
    turbo-decoder technique) phase 1 is dropped entirely: per-window alpha
    start metrics come from the PREVIOUS half-iteration's recomputation
    pass (ain), and this call emits the fresh ones (aout) for the next.
    Window 0 always starts from the exact trellis edge e0, so ain[0] is
    ignored (callers may pass garbage there; cold-start with zeros =
    uniform metrics).  Beta remains EXACT -- it flows continuously
    backward through all windows within the call -- so only alpha is one
    half-iteration stale at window seams, healing one window per
    iteration.  Cuts compute ~20% and stream reads ~50% vs the exact
    two-phase kernel.

    With boundary=True AND nii=True (the seq-parallel chunk contract,
    round-2 VERDICT item 1): NII at BOTH granularities.  Phase 1 is
    dropped; window-start alphas come from ain where slot 0 is the
    CROSS-CHUNK edge the caller received from its neighbor shard (exact
    e0 on the first chunk -- caller's responsibility), and beta starts
    from the caller-provided chunk-end edge bT (exact e0 on the last
    chunk).  Outputs: aout[w] = this half-iteration's alpha at the END of
    window w (so aout[:-1] are the next call's ain[1:], and aout[-1] is
    the chunk edge to ship to the neighbor), plus bout = beta at the
    chunk start (ships to the other neighbor).  With one window per
    chunk this is bit-identical to the exact boundary mode -- the same
    stale-edge approximation at chunk granularity -- and with multiple
    windows it runs at NII speed instead of two-phase speed.

    with_offset (boundary contracts only): the operand list gains a
    trailing (1,) int32 SMEM scalar ROW OFFSET and the a-priori mask
    becomes [offset + t < K_real] -- i.e. K_real is the GLOBAL info
    length and the caller tells the kernel where its chunk starts.  The
    seq-parallel decoder uses this so garbage extrinsics beyond the
    global row K are zeroed as a-priori IN-KERNEL, replacing a fused
    -nowhere full-tensor select after every exchange gather (round 3:
    that select was most of the seq path's 19% gap vs the flagship).
    """
    n_sub = W // UNROLL
    assert W % UNROLL == 0
    assert not (with_offset and not boundary)
    # fold_gather (the in-kernel extrinsic interleave): supported on the
    # NII non-boundary contract -- the flagship's hot path.  The exact
    # two-phase kernel keeps the materialized XLA gather.
    assert not fold_gather or (nii and not boundary)
    # int8 extrinsic dequant rides the existing a-priori scale multiply.
    eff_scale = scale * (ext_qscale if ext_qscale else 1.0)

    def kernel(*refs):
        if fold_gather:
            # Scalar-prefetched (KTp,) int32 gather table: la row t of this
            # SISO's trellis order lives at la_hbm[:, idx[t]].
            idx_ref = refs[0]
            refs = refs[1:]
        if with_offset:
            # Offset rides as the 4th input (after the three streams).
            off_ref = refs[3]
            refs = refs[:3] + refs[4:]
        if boundary and nii:
            (ls_hbm, lp_hbm, la_hbm, ain_ref, ein_ref, bT_ref,
             le_hbm, aout_ref, eout_ref, bout_ref,
             ls_buf, lp_buf, la_buf, aw, le_buf,
             ls_sem, lp_sem, la_sem, o_sem) = refs
        elif boundary:
            (ls_hbm, lp_hbm, la_hbm, a0_ref, bT_ref,
             le_hbm, aout_ref, bout_ref,
             ls_buf, lp_buf, la_buf, ckpt, aw, le_buf,
             ls_sem, lp_sem, la_sem, o_sem) = refs
        elif nii:
            (ls_hbm, lp_hbm, la_hbm, ain_ref,
             le_hbm, aout_ref,
             ls_buf, lp_buf, la_buf, aw, le_buf,
             ls_sem, lp_sem, la_sem, o_sem) = refs
        else:
            (ls_hbm, lp_hbm, la_hbm,
             le_hbm,
             ls_buf, lp_buf, la_buf, ckpt, aw, le_buf,
             ls_sem, lp_sem, la_sem, o_sem) = refs
        cell = pl.program_id(0)

        def in_dma(slot, w):
            copies = [
                pltpu.make_async_copy(ls_hbm.at[cell, pl.ds(w * W, W)],
                                      ls_buf.at[slot], ls_sem.at[slot]),
                pltpu.make_async_copy(lp_hbm.at[cell, pl.ds(w * W, W)],
                                      lp_buf.at[slot], lp_sem.at[slot]),
            ]
            if not fold_gather:
                copies.append(
                    pltpu.make_async_copy(la_hbm.at[cell, pl.ds(w * W, W)],
                                          la_buf.at[slot], la_sem.at[slot]))
            return copies

        def start_in(slot, w):
            for d in in_dma(slot, w):
                d.start()

        def wait_in(slot, w):
            for d in in_dma(slot, w):
                d.wait()

        if fold_gather:
            # The interleave gather folded into the la stream: one DMA per
            # trellis row (rows are contiguous (8, 128) batch tiles; QPP
            # contention-freeness guarantees conflict-free, NOT contiguous,
            # access -- see experiments/gather_inkernel.py).  Issue cost
            # (~19 ns/row standalone) is hidden by interleaving 4 starts
            # per unroll block with the window's VPU compute; waits ride
            # the alpha-recompute pass, the row's first consumer.
            def la_row(slot, i, w):
                # One semaphore per UNROLL block of rows (a flat per-row
                # array tripped a Mosaic semaphore-count limit at W=256):
                # all 8 row copies of a block signal the same semaphore;
                # the consumer waits 8 times on it, which is order-
                # -independent because DMA semaphores are counters.
                return pltpu.make_async_copy(
                    la_hbm.at[cell, idx_ref[w * W + i]],
                    la_buf.at[slot, i], la_sem.at[slot, i // UNROLL])

            def start_la_window(slot, w):
                # Serial warm-up for the first processed window only.
                def b(i, _):
                    la_row(slot, i, w).start()
                    return 0
                jax.lax.fori_loop(0, W, b, 0)

        def rows(slot, i, w):
            """Branch metrics for one unroll block, formed in registers:
            a = -(scale * la * [t < K_real] + ls), p = -lp.  (A whole-window
            precompute into VMEM scratch lowered ~80x slower in Mosaic --
            keep this per-block.)  LLR streams may be bf16 (halves HBM
            traffic on the bandwidth-bound kernel); metrics are always
            computed in fp32."""
            f32 = jnp.float32
            cls = ls_buf[slot, pl.ds(i * UNROLL, UNROLL)].astype(f32)
            clp = lp_buf[slot, pl.ds(i * UNROLL, UNROLL)].astype(f32)
            cla = la_buf[slot, pl.ds(i * UNROLL, UNROLL)].astype(f32)
            base = w * W + i * UNROLL
            out = []
            for j in range(UNROLL):
                if with_offset:
                    # Global-row mask: off is this chunk's start row, so
                    # K_real is the global info length.  sm becomes a
                    # traced scalar; the multiply already existed, so
                    # this costs nothing over the compile-time constant.
                    sm = jnp.where(off_ref[0] + (base + j) < K_real,
                                   jnp.float32(eff_scale), 0.0)
                else:
                    sm = jnp.where(base + j < K_real,
                                   jnp.float32(eff_scale), 0.0)
                out.append((-(cla[j] * sm + cls[j]), -clp[j]))
            return out

        if boundary:
            beta_init = tuple(bT_ref[0, s] for s in range(8))
            alpha_init = (None if nii
                          else tuple(a0_ref[0, s] for s in range(8)))
        else:
            alpha_init = _init_e0()
            beta_init = _init_e0()

        if not nii:
            # ------------- Phase 1: forward alpha, checkpoints only -------
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
                    for ca, cp in rows(slot, i, w):
                        alpha = _alpha_step(alpha, ca, cp, mode)
                    return _renorm(alpha)

                return jax.lax.fori_loop(0, n_sub, fwd_body, alpha)

            alpha_fin = jax.lax.fori_loop(0, n_win, phase1_body, alpha_init)
            if boundary:
                for s in range(8):
                    aout_ref[0, s] = alpha_fin[s]

        # ---------------- Phase 2: backward, recompute alpha, emit Le -----
        if nii:
            # NII skips phase 1, so the first processed window must be
            # fetched here.
            start_in((n_win - 1) % 2, n_win - 1)
            if fold_gather:
                start_la_window((n_win - 1) % 2, n_win - 1)

        def phase2_body(wi, beta):
            w = n_win - 1 - wi
            slot = jax.lax.rem(w, 2)

            if nii:
                @pl.when(w - 1 >= 0)
                def _():
                    start_in(jax.lax.rem(w + 1, 2), w - 1)

                wait_in(slot, w)
            else:
                # Exact mode: windows n_win-1 and n_win-2 are still
                # RESIDENT in their double-buffer slots from the end of
                # phase 1 (fetched, waited, never overwritten since) --
                # refetching them wasted ~2/n_win of the per-call input
                # stream reads (round-4 review).  Prefetch only windows
                # <= n_win-3 and wait only for copies actually started.
                @pl.when((w - 1 >= 0) & (w < n_win - 1))
                def _():
                    start_in(jax.lax.rem(w + 1, 2), w - 1)

                @pl.when(w < n_win - 2)
                def _():
                    wait_in(slot, w)
            if nii and boundary:
                # Seq-parallel chunk: window 0 starts from the separate
                # cross-chunk edge operand; windows w>0 from ain[w],
                # which THIS kernel wrote there last half-iteration (the
                # shifted-slot write below) -- the caller carries ain
                # through the loop untouched, no roll, no slot rewrite.
                alpha = tuple(
                    jnp.where(w == 0, ein_ref[0, s], ain_ref[0, w, s])
                    for s in range(8))
            elif nii:
                # Stale-by-one-half-iteration window start (exact e0 at the
                # true trellis head); emit this window's end metric as the
                # next half-iteration's start for window w+1.
                e0 = _init_e0()
                alpha = tuple(
                    jnp.where(w == 0, e0[s], ain_ref[0, w, s])
                    for s in range(8))
            else:
                alpha = tuple(ckpt[w, s] for s in range(8))

            def rec_body(i, alpha):
                if fold_gather:
                    # This block's la rows were issued one window ago;
                    # retire them, then issue the FIRST half of the next
                    # window's rows (4 per block), interleaved with the
                    # block's vector compute so the scalar-core issue cost
                    # co-schedules instead of serializing.
                    for j in range(UNROLL):
                        la_row(slot, i * UNROLL + j, w).wait()

                    @pl.when(w >= 1)
                    def _():
                        nslot = jax.lax.rem(w + 1, 2)
                        for r in range(UNROLL // 2):
                            la_row(nslot, i * (UNROLL // 2) + r,
                                   w - 1).start()
                for j, (ca, cp) in enumerate(rows(slot, i, w)):
                    t = i * UNROLL + j
                    for s in range(8):
                        aw[t, s] = alpha[s]
                    alpha = _alpha_step(alpha, ca, cp, mode)
                return _renorm(alpha)

            alpha_end = jax.lax.fori_loop(0, n_sub, rec_body, alpha)
            if nii and boundary:
                # Shifted-slot write: window w's end is window w+1's next
                # -half-iteration start; the last window's end is the
                # outgoing chunk edge (separate output).
                @pl.when(w + 1 < n_win)
                def _():
                    for s in range(8):
                        aout_ref[0, w + 1, s] = alpha_end[s]

                @pl.when(w == n_win - 1)
                def _():
                    for s in range(8):
                        eout_ref[0, s] = alpha_end[s]
            elif nii:
                @pl.when(w + 1 < n_win)
                def _():
                    for s in range(8):
                        aout_ref[0, w + 1, s] = alpha_end[s]

            def bwd_body(i, beta):
                if fold_gather:
                    # Second half of the next window's la rows (4/block).
                    @pl.when(w >= 1)
                    def _():
                        nslot = jax.lax.rem(w + 1, 2)
                        for r in range(UNROLL // 2):
                            la_row(nslot, W // 2 + i * (UNROLL // 2) + r,
                                   w - 1).start()
                i0 = W - (i + 1) * UNROLL
                blk = rows(slot, i0 // UNROLL, w)
                for j in range(UNROLL - 1, -1, -1):
                    t = i0 + j
                    ca, cp = blk[j]
                    alpha_t = tuple(aw[t, s] for s in range(8))
                    le_buf[t] = _quantize_le(
                        _extrinsic(alpha_t, beta, cp, mode),
                        le_buf.dtype, ext_qscale)
                    beta = _beta_step(beta, ca, cp, mode)
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

        beta_fin = jax.lax.fori_loop(0, n_win, phase2_body, beta_init)
        if boundary:
            for s in range(8):
                bout_ref[0, s] = beta_fin[s]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(n_cells: int, KTp: int, W: int, mode: str, K_real: int,
                scale: float, boundary: bool, interpret: bool,
                io_dtype: str = "float32", nii: bool = False,
                with_offset: bool = False, ext_dtype: str = "",
                ext_qscale: float = 0.0, fold_gather: bool = False):
    n_win = KTp // W
    dt = jnp.dtype(io_dtype)            # channel streams (ls, lp)
    dte = jnp.dtype(ext_dtype or io_dtype)  # extrinsic streams (la, le)
    kernel = _make_kernel(n_win, W, mode, K_real, scale, boundary, nii,
                          with_offset, ext_qscale, fold_gather)
    stream = pl.BlockSpec(memory_space=pltpu.ANY)
    edge_in = pl.BlockSpec((1, 8, 8, 128), lambda c: (c, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    # Index maps get the scalar-prefetch ref as an extra arg under
    # PrefetchScalarGridSpec (the fold_gather call form).
    ckpt_map = ((lambda c, idx: (c, 0, 0, 0, 0)) if fold_gather
                else (lambda c: (c, 0, 0, 0, 0)))
    ckpt_spec = pl.BlockSpec((1, n_win, 8, 8, 128), ckpt_map,
                             memory_space=pltpu.VMEM)
    edge_shape = jax.ShapeDtypeStruct((n_cells, 8, 8, 128), jnp.float32)
    ckpt_shape = jax.ShapeDtypeStruct((n_cells, n_win, 8, 8, 128),
                                      jnp.float32)
    in_specs = [stream] * 3
    if with_offset:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_cells, KTp, 8, 128), dte)]
    out_specs = [stream]
    if boundary and nii:
        in_specs += [ckpt_spec, edge_in, edge_in]  # ain, edge_in, bT
        out_shape += [ckpt_shape, edge_shape, edge_shape]  # aout,eout,bout
        out_specs += [ckpt_spec, edge_in, edge_in]
    elif boundary:
        in_specs += [edge_in] * 2
        out_shape += [edge_shape] * 2
        out_specs += [edge_in] * 2
    elif nii:
        in_specs += [ckpt_spec]
        out_shape += [ckpt_shape]
        out_specs += [ckpt_spec]
    scratch = [
        pltpu.VMEM((2, W, 8, 128), dt),               # ls window buffers
        pltpu.VMEM((2, W, 8, 128), dt),               # lp window buffers
        pltpu.VMEM((2, W, 8, 128), dte),              # la window buffers
        pltpu.VMEM((n_win, 8, 8, 128), jnp.float32),  # alpha checkpoints
        pltpu.VMEM((W, 8, 8, 128), jnp.float32),      # alpha within window
        pltpu.VMEM((W, 8, 128), dte),                 # Le window buffer
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        # la: per-unroll-block DMA semaphores when the gather is folded
        # in-kernel (shared by the block's 8 row copies).
        pltpu.SemaphoreType.DMA((2, W // UNROLL) if fold_gather else (2,)),
        pltpu.SemaphoreType.DMA,
    ]
    if nii:
        del scratch[3]  # no phase-1 checkpoint buffer
    if fold_gather:
        # The gather table rides as a scalar-prefetch operand so row
        # indices are readable when constructing DMA descriptors.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_cells,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shape),
            interpret=interpret,
        )
    return pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
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


def siso_cells(ls_cells: jax.Array, lp_cells: jax.Array, la_cells: jax.Array,
               K_real: int, mode: str, scale: float = 1.0,
               boundaries: tuple[jax.Array, jax.Array] | None = None,
               interpret: bool | None = None,
               nii_ckpt: jax.Array | None = None,
               nii_boundaries: tuple[jax.Array, jax.Array] | None = None,
               window: int = 0,
               row_offset: jax.Array | None = None,
               ext_qscale: float = 0.0,
               gather_idx: jax.Array | None = None):
    # nii_boundaries is the 3-tuple (ain, edge_in, bT); see docstring.
    """Cell-layout kernel entry: raw LLR streams in, extrinsics out.

    ls/lp/la: (cells, KTp, 8, 128) with KTp a multiple of the window; pad
    steps beyond the real trellis carry ls = +BIG, lp = 0 (the known-0-bit
    trick).  la rows at t >= K_real are ignored (masked in-kernel), so
    extrinsic buffers may carry garbage there.  The kernel forms
    A = -(scale*la + ls), P = -lp in VMEM -- branch metrics never touch HBM.

    boundaries: optional (alpha0, betaT), each (cells, 8, 8, 128) of edge
    state metrics per codeword; when given, returns (le, alpha_out,
    beta_out), otherwise just le (rows >= K_real are garbage).

    nii_ckpt: optional (cells, n_win, 8, 8, 128) fp32 per-window alpha
    start metrics from the previous half-iteration (NII mode -- skips the
    phase-1 forward pass; see _make_kernel).  Returns (le, new_ckpt);
    entry [_, 0] is ignored/garbage (window 0 starts exactly at e0).
    Cold-start with zeros (uniform metrics).  Mutually exclusive with
    boundaries.

    nii_boundaries: optional (ain, edge_in, bT) -- the seq-parallel
    chunk contract combining both NII granularities.  ain is a
    (cells, n_win, 8, 8, 128) fp32 window-start table written BY THIS
    KERNEL last half-iteration (slot w = end of window w-1; slot 0 is
    never read), edge_in is the (cells, 8, 8, 128) CROSS-CHUNK alpha
    edge received from the neighbor shard (exact e0 on the first
    chunk), bT the chunk-end beta edge.  Returns (le, aout, eout,
    bout): aout feeds the next call's ain UNTOUCHED (the kernel writes
    window ends into the shifted slot directly -- no roll, no slot
    rewrite in the loop), eout is the outgoing chunk edge for the
    neighbor, bout is beta at the chunk start.  Mutually exclusive
    with the other two.

    row_offset: optional (1,) int32 device scalar (boundary contracts
    only): the chunk's global start row.  The a-priori mask becomes
    [row_offset + t < K_real] with K_real the GLOBAL info length, so
    seq-parallel callers get garbage-extrinsic zeroing in-kernel
    instead of via a full-tensor select after the exchange gather.

    The LLR streams may be bfloat16 (le comes back in the same dtype;
    metrics stay fp32 in VMEM) -- the kernel is HBM-bandwidth-bound, so
    halving stream bytes buys real throughput.  Boundary metrics are
    always fp32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_cells, KTp = ls_cells.shape[:2]
    # Channel streams share a dtype; the extrinsic streams (la in, le out)
    # may use a narrower one (float8_e4m3fn / int8) -- they are the only
    # per-iteration tensors that round-trip HBM through the interleave
    # gather, so halving their bytes pays twice (gather + kernel stream).
    assert ls_cells.dtype == lp_cells.dtype
    ext_dt = la_cells.dtype
    assert ext_qscale == 0.0 or ext_dt == jnp.int8, \
        "ext_qscale is int8 fixed-point only"
    assert ext_dt != jnp.int8 or ext_qscale > 0.0, \
        "int8 extrinsics need a quantization step (ext_qscale)"
    assert (boundaries is not None) + (nii_ckpt is not None) \
        + (nii_boundaries is not None) <= 1
    assert row_offset is None or boundaries is not None \
        or nii_boundaries is not None
    # gather_idx (the in-kernel interleave fold): a shared (KTp,) int32
    # table; la row t of this SISO's trellis order is read from
    # la_cells[:, gather_idx[t]] by per-row DMA -- the caller passes the
    # OTHER SISO's raw extrinsic output and no materialized gather runs.
    # NII non-boundary contract only (the flagship hot path).
    assert gather_idx is None or nii_ckpt is not None
    W = window or window_len(KTp)
    assert KTp % W == 0 and W % UNROLL == 0
    call = _build_call(n_cells, KTp, W, mode, K_real, float(scale),
                       boundaries is not None or nii_boundaries is not None,
                       interpret, io_dtype=str(ls_cells.dtype),
                       nii=nii_ckpt is not None or nii_boundaries is not None,
                       with_offset=row_offset is not None,
                       ext_dtype=str(ext_dt), ext_qscale=float(ext_qscale),
                       fold_gather=gather_idx is not None)
    off = (row_offset.astype(jnp.int32),) if row_offset is not None else ()
    if nii_boundaries is not None:
        return call(ls_cells, lp_cells, la_cells, *off, *nii_boundaries)
    if boundaries is not None:
        return call(ls_cells, lp_cells, la_cells, *off, *boundaries)
    if nii_ckpt is not None:
        if gather_idx is not None:
            le, ckpt = call(gather_idx.astype(jnp.int32), ls_cells,
                            lp_cells, la_cells, nii_ckpt)
        else:
            le, ckpt = call(ls_cells, lp_cells, la_cells, nii_ckpt)
        return le, ckpt
    return call(ls_cells, lp_cells, la_cells)[0]


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
    W = window_len(KT)
    KTp = _round_up(KT, W)

    laf = jnp.pad(la, ((0, 0), (0, KTp - K)))
    # Pad time with known-0 steps (ls = +BIG, lp = 0); pad batch to CELL.
    lsp = jnp.pad(ls, ((0, 0), (0, KTp - KT)), constant_values=BIG)
    lpp = jnp.pad(lp, ((0, 0), (0, KTp - KT)))
    Bp = _round_up(B, CELL)
    padb = lambda x: jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, 0)))

    le_cells = siso_cells(to_cells(padb(lsp)), to_cells(padb(lpp)),
                          to_cells(padb(laf)), K, mode,
                          interpret=interpret)
    le = from_cells(le_cells)[:B, :K]
    L = le + la + ls[:, :K]
    return L, le

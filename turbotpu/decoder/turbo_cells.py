"""Turbo decode loop in the Pallas kernel's native cell layout.

Keeps every per-iteration tensor in (cells, T, 8, 128) layout so the hot
loop runs transpose-free, and leans on the fused kernel to form branch
metrics in VMEM: the only per-iteration HBM traffic outside the kernel is
the extrinsic interleave gather and the early-termination bookkeeping
(SURVEY.md section 4.2).  Channel-LLR packing and hard-bit unpacking cross
layouts once each.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..siso.pallas_kernel import (BIG, CELL, from_cells, siso_cells,
                                  to_cells, window_len, _round_up)
from .early_term import _crc_check_matrix_np
from .turbo import DecoderConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def turbo_decode_cells(ls: jax.Array, lp1: jax.Array, lp2: jax.Array,
                       tail1: jax.Array, tail2: jax.Array,
                       cfg: DecoderConfig,
                       perm_b: jax.Array | None = None,
                       inv_b: jax.Array | None = None,
                       group_tables=None):
    """Same contract as decoder.turbo.turbo_decode, Pallas-cell hot loop.

    perm_b / inv_b: optional per-codeword (B, K) embedded interleaver
    tables (bucketing.embedded_perm_tables) for TRUE mixed-K batches; the
    extrinsic exchange then runs as a take_along_axis gather with a
    cell-layout index tensor instead of a shared time-axis gather.
    This elementwise gather is the GENERAL path and is very slow on TPU
    (~345x the shared gather, experiments/k_sweep.json) -- prefer:

    group_tables: (perm_g (G, K), inv_g (G, K), gid (B,)) from
    bucketing.grouped_perm_tables.  Mixed batches from segmentation have
    few DISTINCT sizes, so the exchange runs as G fast whole-slice row
    gathers + a branchless per-codeword select -- the TPU-native form.
    Mutually exclusive with perm_b/inv_b.
    """
    B, K = ls.shape
    assert K == cfg.K
    KT = K + 3
    # cfg.window overrides the kernel window (must divide into UNROLL
    # blocks); larger windows cut NII seam count at the cost of VMEM.
    W = cfg.window if cfg.window else window_len(KT)
    KTp = _round_up(KT, W)
    scale = cfg.resolved_ext_scale()
    dt = jnp.dtype(cfg.io_dtype)  # channel LLR HBM dtype (metrics fp32)
    ext_dt, qs = cfg.ext_io()
    dte = jnp.dtype(ext_dt)       # extrinsic HBM dtype (may be f8/int8)
    Bp = _round_up(B, CELL)
    padb = lambda x: jnp.pad(x.astype(dt), ((0, Bp - B), (0, 0)))

    # Extended permutations cover the pad region (gathered rows >= K are
    # masked to zero a-priori inside the kernel, so identity is fine there).
    ext = np.arange(K, KTp, dtype=np.int32)
    if perm_b is None and group_tables is None:
        perm = np.asarray(cfg.perm())
        inv = np.asarray(cfg.inv())
        perm_e = jnp.asarray(np.concatenate([perm.astype(np.int32), ext]))
        inv_e = jnp.asarray(np.concatenate([inv.astype(np.int32), ext]))
        g_perm = lambda x: x[:, perm_e]
        g_inv = lambda x: x[:, inv_e]
        g_sys = lambda x: x[:, perm]
    elif group_tables is not None:
        assert perm_b is None and inv_b is None
        perm_g, inv_g, gid = group_tables
        nG = perm_g.shape[0]
        ext_j = jnp.asarray(ext)
        ext_rows = jnp.broadcast_to(ext_j, (nG, KTp - K))
        perm_eg = jnp.concatenate([perm_g.astype(jnp.int32), ext_rows], 1)
        inv_eg = jnp.concatenate([inv_g.astype(jnp.int32), ext_rows], 1)
        gid_c = to_cells(jnp.pad(gid.astype(jnp.int32), (0, Bp - B))[:, None]
                         )[:, :1]                    # (cells, 1, 8, 128)

        def sel_gather(tabs):
            # G whole-slice row gathers + branchless select: each
            # x[:, tabs[g]] gathers full (8, 128) lanes-major slices (the
            # same fast XLA gather as the homogeneous path); the where
            # chain picks each codeword's own group.  G is tiny (distinct
            # block sizes), so this is ~G x the homogeneous gather cost
            # instead of the elementwise take_along_axis's ~345x.
            def f(x):
                out = x[:, tabs[0]]
                for g in range(1, nG):
                    out = jnp.where(gid_c == g, x[:, tabs[g]], out)
                return out
            return f
        g_perm = sel_gather(perm_eg)
        g_inv = sel_gather(inv_eg)

        def g_sys(x):                                # (B, K) row layout
            out = jnp.take(x, perm_g[0], axis=1)
            for g in range(1, nG):
                out = jnp.where(gid[:, None] == g,
                                jnp.take(x, perm_g[g], axis=1), out)
            return out
    else:
        def cells_index(tab):
            t = jnp.concatenate(
                [tab.astype(jnp.int32),
                 jnp.broadcast_to(jnp.asarray(ext), (B, KTp - K))], axis=1)
            t = jnp.concatenate(
                [t, jnp.broadcast_to(jnp.arange(KTp, dtype=jnp.int32),
                                     (Bp - B, KTp))], axis=0)
            return to_cells(t)
        perm_c = cells_index(perm_b)     # (cells, KTp, 8, 128) int32
        inv_c = cells_index(inv_b)
        g_perm = lambda x: jnp.take_along_axis(x, perm_c, axis=1)
        g_inv = lambda x: jnp.take_along_axis(x, inv_c, axis=1)
        g_sys = lambda x: jnp.take_along_axis(x, perm_b, axis=1)

    def stream(body, tail, pad_val):
        full = jnp.concatenate([body, tail], axis=1)
        full = jnp.pad(full, ((0, 0), (0, KTp - KT)), constant_values=pad_val)
        return to_cells(padb(full))

    ls1_c = stream(ls, tail1[:, 0::2], BIG)
    lp1_c = stream(lp1, tail1[:, 1::2], 0.0)
    ls2_c = stream(g_sys(ls), tail2[:, 0::2], BIG)
    lp2_c = stream(lp2, tail2[:, 1::2], 0.0)
    n_cells = ls1_c.shape[0]

    f32 = jnp.float32
    zT = jnp.zeros((n_cells, KTp, 8, 128), dte)
    n_win = KTp // W
    # NII state: per-window alpha start metrics per SISO, carried across
    # half-iterations (zeros = uniform cold start; [_, 0] ignored in-kernel).
    zC = jnp.zeros((n_cells, n_win, 8, 8, 128), f32) if cfg.nii else None

    # fold_gather: both SISOs read the other's RAW extrinsic tensor
    # through their own in-kernel per-row-DMA gather tables -- no
    # materialized interleave in the loop at all (round-3 VERDICT item 1).
    # Shared-table NII batches only; per-codeword (mixed-K) tables keep
    # the take_along_axis path.
    fold = (cfg.fold_gather and cfg.nii and perm_b is None
            and group_tables is None)

    def half_iters_fold(le2, le1, ck1, ck2):
        with jax.named_scope("siso1_fold"):
            le1, ck1 = siso_cells(ls1_c, lp1_c, le2, K, cfg.mode, scale,
                                  nii_ckpt=ck1, window=W, ext_qscale=qs,
                                  gather_idx=inv_e)
        with jax.named_scope("siso2_fold"):
            le2, ck2 = siso_cells(ls2_c, lp2_c, le1, K, cfg.mode, scale,
                                  nii_ckpt=ck2, window=W, ext_qscale=qs,
                                  gather_idx=perm_e)
        return le2, le1, ck1, ck2

    def half_iters(le21, le1, ck1, ck2):
        """The two SISO half-iterations + extrinsic interleave gathers --
        the only per-iteration work that is algorithmically required."""
        # SISO1 (natural order); le21 rows >= K are garbage, masked in-kernel.
        # SISO2 (interleaved order): a-priori is scale*le1 gathered by perm;
        # the kernel applies the scaling, so the gather is a pure gather.
        if cfg.nii:
            with jax.named_scope("siso1"):
                le1, ck1 = siso_cells(ls1_c, lp1_c, le21, K, cfg.mode, scale,
                                      nii_ckpt=ck1, window=W, ext_qscale=qs)
            with jax.named_scope("siso2"):
                le2, ck2 = siso_cells(ls2_c, lp2_c, g_perm(le1), K, cfg.mode,
                                      scale, nii_ckpt=ck2, window=W,
                                      ext_qscale=qs)
        else:
            with jax.named_scope("siso1"):
                le1 = siso_cells(ls1_c, lp1_c, le21, K, cfg.mode, scale,
                                 window=W, ext_qscale=qs)
            with jax.named_scope("siso2"):
                le2 = siso_cells(ls2_c, lp2_c, g_perm(le1), K, cfg.mode,
                                 scale, window=W, ext_qscale=qs)
        with jax.named_scope("deinterleave"):
            return g_inv(le2), le1, ck1, ck2

    # int8 extrinsics are stored as integer codes; dequantize (x qs) when
    # assembling the full LLR.  (Inside the kernel the dequant is folded
    # into the a-priori scale multiply.)
    deq = scale * (qs if qs else 1.0)

    def full_llr(le21, le1):
        return (ls1_c[:, :K].astype(f32)
                + deq * (le1[:, :K].astype(f32) + le21[:, :K].astype(f32)))

    if cfg.early_term == "none":
        # Lean loop: no L/hard/freeze bookkeeping inside -- those tensors
        # are pure HBM traffic that rivals the kernels themselves (measured
        # in experiments/pk_cost8.py).  Compute outputs once after the loop.
        # With fold_gather the carry holds RAW le2 (interleaved order) and
        # the single deinterleave for L runs once, after the loop.
        def body(carry):
            it, le21, le1, ck1, ck2 = carry
            step = half_iters_fold if fold else half_iters
            le21, le1, ck1, ck2 = step(le21, le1, ck1, ck2)
            return it + 1, le21, le1, ck1, ck2

        _, le21, le1, _, _ = jax.lax.while_loop(
            lambda c: c[0] < cfg.n_iters, body,
            (jnp.int32(0), zT, zT, zC, zC))
        if fold:
            le21 = g_inv(le21)       # carry was raw le2
        L = full_llr(le21, le1)
        hard = (L < 0).astype(jnp.int8)
        hard_b = from_cells(hard)[:B]
        L_b = from_cells(L)[:B]
        iters_b = jnp.full((B,), cfg.n_iters, jnp.int32)
        return hard_b, iters_b, L_b

    if cfg.early_term == "crc":
        # int8 x int8 -> int32 MXU syndrome: GF(2) counts are exact in
        # int32 (<= K), and the narrow operand skips the fp32 cast of
        # the whole hard tensor (A/B'd on-chip: int8 <= f32 at B=4096).
        G = jnp.asarray(_crc_check_matrix_np(K, cfg.crc_poly), jnp.int8)
    # Sign-agreement mode needs last iteration's hard bits in the carry;
    # CRC mode does not (the syndrome is memoryless), and dropping the
    # tensor keeps the loop state minimal.
    need_hard_prev = cfg.early_term == "sign"

    # Early-termination freezing works on the EXTRINSICS, not on stored
    # L/hard copies (round-5): L = ls + deq*(le1 + le21) is a pure
    # function of the extrinsic streams, so pinning a converged frame's
    # le1/le21 (a where on two ext_dt tensors -- bf16/int8) yields the
    # bit-identical at-convergence L and hard bits when computed once
    # after the loop, while the old scheme hauled a frozen fp32 L copy +
    # int8 hard copy through HBM every iteration.  Measured on-chip:
    # CRC-mode decode at B=4096 went from 1611 to the committed round-5
    # number (see RESULTS.md) purely from this traffic cut; outputs are
    # asserted bit-identical in tests/unit/test_turbo_decode.py.
    def cond(carry):
        return (carry[0] < cfg.n_iters) & ~jnp.all(carry[-2])

    def body(carry):
        if need_hard_prev:
            it, le21, le1, ck1, ck2, hard_prev, done, iters = carry
        else:
            it, le21, le1, ck1, ck2, done, iters = carry
        step = half_iters_fold if fold else half_iters
        le21_new, le1_new, ck1, ck2 = step(le21, le1, ck1, ck2)
        # Under fold the carry holds raw le2; the convergence check needs
        # natural order, so ONE gather per iteration remains (vs two).
        le21_nat = g_inv(le21_new) if fold else le21_new
        # Fused sign decision -- no fp32 L tensor materialized in-loop.
        hard_new = (full_llr(le21_nat, le1_new) < 0).astype(jnp.int8)

        if cfg.early_term == "crc":
            synd = jax.lax.dot_general(
                hard_new, G,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            newly_done = jnp.all((synd & 1) == 0, axis=-1)  # (cells, 8, 128)
        else:  # sign agreement
            newly_done = jnp.all(hard_new == hard_prev, axis=1)

        # Freeze converged codewords' extrinsics branchlessly; their SISO
        # outputs keep being computed (the batch runs anyway) and are
        # discarded here, so L/hard derived after the loop are pinned at
        # the convergence iteration.
        keep = done[:, None]
        le21 = jnp.where(keep, le21, le21_new)
        le1 = jnp.where(keep, le1, le1_new)
        iters = iters + (~done).astype(jnp.int32)
        done = done | newly_done
        if need_hard_prev:
            hard_prev = jnp.where(keep, hard_prev, hard_new)
            return it + 1, le21, le1, ck1, ck2, hard_prev, done, iters
        return it + 1, le21, le1, ck1, ck2, done, iters

    zH = (jnp.zeros((n_cells, K, 8, 128), jnp.int8),) if need_hard_prev \
        else ()
    init = (jnp.int32(0), zT, zT, zC, zC, *zH,
            jnp.zeros((n_cells, 8, 128), bool),
            jnp.zeros((n_cells, 8, 128), jnp.int32))
    # while_loop (not fori): XLA would fully unroll a 6-trip fori,
    # instantiating the Mosaic kernel 12x (multi-minute compiles); the
    # dynamic condition also exits as soon as every codeword's CRC passes.
    out = jax.lax.while_loop(cond, body, init)
    le21, le1, iters = out[1], out[2], out[-1]

    if fold:
        le21 = g_inv(le21)           # carry holds raw le2 under fold
    L = full_llr(le21, le1)
    hard = (L < 0).astype(jnp.int8)
    hard_b = from_cells(hard)[:B]
    L_b = from_cells(L)[:B]
    iters_b = iters.reshape(n_cells * CELL)[:B]
    return hard_b, iters_b, L_b

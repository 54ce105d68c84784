"""Cross-device sliding-window BCJR: trellis sharded over the 'seq' axis.

SURVEY.md section 3, component 23 -- the sequence/context-parallel analog.
Each 'seq' shard runs the SISO recursions over its local chunk of the
trellis; window-boundary alpha/beta metrics (8 floats per codeword per
edge) ride `lax.ppermute` to the neighbor shard each half-iteration --
next-iteration initialization (NII), the overlap-save analog named in the
north star.  Iteration 0 starts from uniform boundaries, exactly like
single-chip NII windowing.

Sharding layout: the codeword batch shards over 'data'; branch-metric
streams are replicated over 'seq' and each seq shard computes only its
chunk (the QPP interleaver's gather crosses chunk edges, so extrinsics are
all-gathered over 'seq' between half-iterations; QPP contention-freeness
permits a fully partitioned exchange -- noted as a future optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..decoder.turbo import DecoderConfig
from ..decoder.early_term import crc_ok_batch, make_crc_matrix
from ..siso.scan import NEG, siso_scan_boundary
from ..siso.windowed import BIG
from ..spec.trellis import N_STATES


def _round_up(x, m):
    return -(-x // m) * m


def decode_seq_sharded(mesh: jax.sharding.Mesh, cfg: DecoderConfig):
    """Build the jitted sharded decoder for canonical-format inputs.

    Returns fn(ls, lp1, lp2, tail1, tail2) -> (hard, iters, L), with the
    batch axis sharded over 'data' and the SISO recursions split over 'seq'.
    `cfg.siso == "pallas"` selects the fused-kernel chunk path (the
    performance path on TPU); anything else uses the lax.scan chunk SISO.
    """
    if cfg.siso == "pallas":
        return _decode_seq_sharded_cells(mesh, cfg)
    return _decode_seq_sharded_scan(mesh, cfg)


def _decode_seq_sharded_scan(mesh: jax.sharding.Mesh, cfg: DecoderConfig):
    n_seq = mesh.shape["seq"]
    K = cfg.K
    KT = K + 3
    C = _round_up(KT, n_seq) // n_seq          # trellis chunk per shard
    KTp = C * n_seq
    perm = jnp.asarray(cfg.perm())
    inv = jnp.asarray(cfg.inv())
    scale = cfg.resolved_ext_scale()
    G = make_crc_matrix(K, cfg.crc_poly) if cfg.early_term == "crc" else None

    fwd = [(i, (i + 1) % n_seq) for i in range(n_seq)]
    bwd = [((i + 1) % n_seq, i) for i in range(n_seq)]

    def siso_chunk(ls_f, lp_f, la_full, a_in, b_in, j):
        """One shard's SISO over steps [j*C, j*C + C) of the padded trellis.

        ls_f/lp_f: (B, KTp) replicated full streams; la_full: (B, K).
        a_in/b_in: (B, 8) NII boundaries from neighbors.  Returns
        (le_chunk (B, C), alpha_out, beta_out).
        """
        start = j * C
        ls_c = jax.lax.dynamic_slice_in_dim(ls_f, start, C, 1)
        lp_c = jax.lax.dynamic_slice_in_dim(lp_f, start, C, 1)
        la_f = jnp.pad(la_full, ((0, 0), (0, KTp - K)))
        la_c = jax.lax.dynamic_slice_in_dim(la_f, start, C, 1)
        e0 = jnp.full((N_STATES,), NEG, ls_c.dtype).at[0].set(0.0)
        is_first = j == 0
        is_last = j == n_seq - 1
        a0 = jnp.where(is_first, e0[None, :], a_in)
        bT = jnp.where(is_last, e0[None, :], b_in)
        _, le, a_out, b_out = siso_scan_boundary(ls_c, lp_c, la_c, a0, bT,
                                                 cfg.mode)
        return le, a_out, b_out

    def pad_stream(x, value=0.0):
        return jnp.pad(x, ((0, 0), (0, KTp - KT)), constant_values=value)

    spec_b = P(("data",), None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec_b,) * 5,
        out_specs=(spec_b, P(("data",)), spec_b), check_vma=False)
    def decode(ls, lp1, lp2, t1, t2):
        B = ls.shape[0]
        j = jax.lax.axis_index("seq")

        # Known-0 padding beyond the real trellis (state-0 fixed point).
        ls1 = pad_stream(jnp.concatenate([ls, t1[:, 0::2]], 1), BIG)
        lp1f = pad_stream(jnp.concatenate([lp1, t1[:, 1::2]], 1))
        ls2 = pad_stream(jnp.concatenate([ls[:, perm], t2[:, 0::2]], 1), BIG)
        lp2f = pad_stream(jnp.concatenate([lp2, t2[:, 1::2]], 1))

        uni = jnp.zeros((B, N_STATES), ls.dtype)

        def gather_le(le_chunk):
            le_all = jax.lax.all_gather(le_chunk, "seq", axis=1, tiled=True)
            return le_all[:, :K]

        def exchange(a_out, b_out):
            a_in = jax.lax.ppermute(a_out, "seq", fwd)
            b_in = jax.lax.ppermute(b_out, "seq", bwd)
            return a_in, b_in

        def cond(carry):
            (it, le21, a1, b1, a2, b2, L_prev, hard_prev, done, iters,
             undone_g) = carry
            return (it < cfg.n_iters) & (undone_g > 0)

        def body(carry):
            (it, le21, a1, b1, a2, b2, L_prev, hard_prev, done, iters,
             _) = carry
            le1_c, a1o, b1o = siso_chunk(ls1, lp1f, le21, a1, b1, j)
            le1 = gather_le(le1_c) * scale
            le2_c, a2o, b2o = siso_chunk(ls2, lp2f, le1[:, perm], a2, b2, j)
            le2 = gather_le(le2_c) * scale
            le21_new = le2[:, inv]
            L_new = ls + le1 + le21_new
            hard_new = (L_new < 0).astype(jnp.int8)
            a1n, b1n = exchange(a1o, b1o)
            a2n, b2n = exchange(a2o, b2o)

            if cfg.early_term == "crc":
                newly_done = crc_ok_batch(hard_new, G)
            elif cfg.early_term == "sign":
                newly_done = jnp.all(hard_new == hard_prev, axis=1)
            else:
                newly_done = jnp.zeros((B,), bool)
            keep = done[:, None]
            le21 = jnp.where(keep, le21, le21_new)
            L = jnp.where(keep, L_prev, L_new)
            hard = jnp.where(keep, hard_prev, hard_new)
            iters = iters + (~done).astype(jnp.int32)
            done = done | newly_done
            # Early exit must be GLOBAL: 'seq' shards agree by construction
            # (they compute identical full-batch decisions), but 'data'
            # shards hold different codewords, and a shard that exits the
            # while_loop early stops feeding its row's collectives -- the
            # XLA:CPU in-process communicator then deadlocks (and trip
            # counts must match on any backend for safety).  One scalar
            # psum per iteration buys lockstep exit.
            undone_g = jax.lax.psum(
                jnp.sum((~done).astype(jnp.int32)), "data")
            return (it + 1, le21, a1n, b1n, a2n, b2n, L, hard, done, iters,
                    undone_g)

        init = (jnp.int32(0), jnp.zeros((B, K), ls.dtype), uni, uni, uni, uni,
                jnp.zeros((B, K), ls.dtype), jnp.zeros((B, K), jnp.int8),
                jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
                jnp.int32(1))
        out = jax.lax.while_loop(cond, body, init)
        (_, _, _, _, _, _, L, hard, done, iters, _) = out
        return hard, iters, L

    return decode


def _decode_seq_sharded_cells(mesh: jax.sharding.Mesh, cfg: DecoderConfig):
    """Seq-parallel decode with the fused Pallas SISO kernel per chunk.

    Each 'seq' shard runs the fused gamma/alpha/beta/LLR window kernel
    (siso/pallas_kernel.py, boundary mode) over its trellis chunk, keeping
    every per-iteration tensor in the kernel's native (cells, T, 8, 128)
    layout; NII boundary alpha/beta metrics ride `lax.ppermute` to the
    neighbor shard each half-iteration exactly as in the scan path.  The
    chunk recursion runs at kernel speed instead of lax.scan speed:
    1.56 Gbit/s/chip at a 1x1 mesh (RESULTS.md C5), parity with the
    monolithic kernel path.
    """
    from ..siso.pallas_kernel import (BIG as PBIG, CELL, from_cells,
                                      siso_cells, to_cells)

    n_seq = mesh.shape["seq"]
    K = cfg.K
    KT = K + 3
    # Chunk length: a multiple of the kernel's window (128 for big chunks,
    # UNROLL=8 for single-window small chunks).  Pad steps carry the
    # known-0-bit metrics, so padded chunks are bit-exact at real positions.
    c0 = -(-KT // n_seq)
    C = _round_up(c0, 8) if c0 <= 248 else _round_up(c0, 128)
    KTp = C * n_seq
    perm = np.asarray(cfg.perm())
    ext = np.arange(K, KTp, dtype=np.int32)
    perm_e = jnp.asarray(np.concatenate([perm.astype(np.int32), ext]))
    inv_e = jnp.asarray(
        np.concatenate([np.asarray(cfg.inv()).astype(np.int32), ext]))
    scale = cfg.resolved_ext_scale()
    if cfg.early_term == "crc":
        from ..decoder.early_term import _crc_check_matrix_np
        G_np = _crc_check_matrix_np(K, cfg.crc_poly)
    else:
        G_np = None

    fwd = [(i, (i + 1) % n_seq) for i in range(n_seq)]
    bwd = [((i + 1) % n_seq, i) for i in range(n_seq)]
    spec_b = P(("data",), None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec_b,) * 5,
        out_specs=(spec_b, P(("data",)), spec_b), check_vma=False)
    def decode(ls, lp1, lp2, t1, t2):
        B = ls.shape[0]
        j = jax.lax.axis_index("seq")
        Bp = _round_up(B, CELL)
        dt = jnp.dtype(cfg.io_dtype)  # LLR/extrinsic HBM dtype
        padb = lambda x: jnp.pad(x.astype(dt), ((0, Bp - B), (0, 0)))

        def stream(body_, tail, pad_val):
            full = jnp.concatenate([body_, tail], axis=1)
            full = jnp.pad(full, ((0, 0), (0, KTp - KT)),
                           constant_values=pad_val)
            return to_cells(padb(full))

        ls1_c = stream(ls, t1[:, 0::2], PBIG)
        lp1_c = stream(lp1, t1[:, 1::2], 0.0)
        ls2_c = stream(ls[:, perm], t2[:, 0::2], PBIG)
        lp2_c = stream(lp2, t2[:, 1::2], 0.0)
        n_cells = ls1_c.shape[0]

        e0 = jnp.concatenate(
            [jnp.zeros((n_cells, 1, 8, 128), jnp.float32),
             jnp.full((n_cells, 7, 8, 128), -PBIG, jnp.float32)], axis=1)
        uni = jnp.zeros((n_cells, 8, 8, 128), jnp.float32)
        G = jnp.asarray(G_np) if G_np is not None else None

        def chunk(x):
            return jax.lax.dynamic_slice_in_dim(x, j * C, C, 1)

        def siso_chunk(ls_c, lp_c, la_full, a_in, b_in):
            a0 = jnp.where(j == 0, e0, a_in)
            bT = jnp.where(j == n_seq - 1, e0, b_in)
            le_c, a_out, b_out = siso_cells(
                chunk(ls_c), chunk(lp_c), chunk(la_full), C, cfg.mode, scale,
                boundaries=(a0, bT))
            le_full = jax.lax.all_gather(le_c, "seq", axis=1, tiled=True)
            # A-priori rows beyond K must be zero before the next SISO: the
            # chunk kernel cannot mask by global position (K_real is
            # per-chunk), and pad-step extrinsics are +-BIG garbage.  Zero
            # just the KTp-K tail rows rather than a full-tensor multiply.
            le_full = jax.lax.dynamic_update_slice_in_dim(
                le_full, jnp.zeros((n_cells, KTp - K, 8, 128), dt), K, 1)
            return le_full, a_out, b_out

        def exchange(a_out, b_out):
            return (jax.lax.ppermute(a_out, "seq", fwd),
                    jax.lax.ppermute(b_out, "seq", bwd))

        def cond(carry):
            (it, le21, a1, b1, a2, b2, L_prev, hard_prev, done, iters,
             undone_g) = carry
            return (it < cfg.n_iters) & (undone_g > 0)

        def body(carry):
            (it, le21, a1, b1, a2, b2, L_prev, hard_prev, done, iters,
             _) = carry
            # Extrinsics stay unscaled; the kernel applies `scale` to its
            # a-priori input, exactly as in decoder/turbo_cells.py.
            le1, a1o, b1o = siso_chunk(ls1_c, lp1_c, le21, a1, b1)
            le2, a2o, b2o = siso_chunk(ls2_c, lp2_c, le1[:, perm_e], a2, b2)
            le21_new = le2[:, inv_e]
            f32 = jnp.float32
            L_new = (ls1_c[:, :K].astype(f32)
                     + scale * (le1[:, :K].astype(f32)
                                + le21_new[:, :K].astype(f32)))
            hard_new = (L_new < 0).astype(jnp.int8)
            a1n, b1n = exchange(a1o, b1o)
            a2n, b2n = exchange(a2o, b2o)

            if cfg.early_term == "crc":
                synd = jax.lax.dot_general(
                    hard_new.astype(jnp.float32), G,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                newly_done = jnp.all(synd % 2.0 == 0.0, axis=-1)
            elif cfg.early_term == "sign":
                newly_done = jnp.all(hard_new == hard_prev, axis=1)
            else:
                newly_done = jnp.zeros((n_cells, 8, 128), bool)
            keep = done[:, None]
            le21 = jnp.where(keep, le21, le21_new)
            L = jnp.where(keep, L_prev, L_new)
            hard = jnp.where(keep, hard_prev, hard_new)
            iters = iters + (~done).astype(jnp.int32)
            done = done | newly_done
            # Global early-exit flag: see _decode_seq_sharded_scan -- 'data'
            # shards must take identical trip counts or their rows'
            # collectives desync (XLA:CPU deadlocks outright).
            undone_g = jax.lax.psum(
                jnp.sum((~done).astype(jnp.int32)), "data")
            return (it + 1, le21, a1n, b1n, a2n, b2n, L, hard, done, iters,
                    undone_g)

        init = (jnp.int32(0),
                jnp.zeros((n_cells, KTp, 8, 128), dt),
                uni, uni, uni, uni,
                jnp.zeros((n_cells, K, 8, 128), jnp.float32),
                jnp.zeros((n_cells, K, 8, 128), jnp.int8),
                jnp.zeros((n_cells, 8, 128), bool),
                jnp.zeros((n_cells, 8, 128), jnp.int32),
                jnp.int32(1))
        out = jax.lax.while_loop(cond, body, init)
        (_, _, _, _, _, _, L, hard, done, iters, _) = out
        hard_b = from_cells(hard)[:B]
        L_b = from_cells(L)[:B]
        iters_b = iters.reshape(n_cells * CELL)[:B]
        return hard_b, iters_b, L_b

    return decode

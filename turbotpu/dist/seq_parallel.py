"""Cross-device sliding-window BCJR: trellis sharded over the 'seq' axis.

SURVEY.md section 3, component 23 -- the sequence/context-parallel analog.
Each 'seq' shard runs the SISO recursions over its local chunk of the
trellis; window-boundary alpha/beta metrics (8 floats per codeword per
edge) ride `lax.ppermute` to the neighbor shard each half-iteration --
next-iteration initialization (NII), the overlap-save analog named in the
north star.  Iteration 0 starts from uniform boundaries, exactly like
single-chip NII windowing.

Sharding layout: the codeword batch shards over 'data'; channel streams are
chunked once at setup and every per-iteration tensor stays CHUNK-LOCAL
(C = ceil(KT/n_seq) trellis steps per shard).  The extrinsic interleave /
deinterleave between half-iterations is a PARTITIONED exchange (round-1
VERDICT item 5): the permutation is static, so each shard's needs are
routed by precomputed tables -- same-shard rows (including the identity
pad tail) are a local gather, cross-shard rows ride ONE tiled
`lax.all_to_all` of ~C/n_seq rows per peer.  Per-shard receive volume is
C rows instead of the K rows an all_gather would move; QPP
contention-freeness [P:9] is what keeps the per-peer buckets balanced.
CRC early termination psums shard-local partial syndromes (GF(2)
linearity) instead of gathering hard bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..decoder.turbo import DecoderConfig
from ..siso.scan import NEG, siso_scan_boundary
from ..spec.trellis import N_STATES


def _round_up(x, m):
    return -(-x // m) * m


def chunk_sizing(KT: int, n_seq: int, window: int = 0
                 ) -> tuple[int, int, int, int]:
    """THE chunk/window geometry of the cells seq path: (C, W, n_win, KTp).

    Single source of truth -- experiments/seq_glue.py and
    experiments/comm_model.py measure/model the same geometry the
    decoder runs (round-4 review: each had its own re-derivation, and
    seq_glue's had drifted to a different default window)."""
    c0 = -(-KT // n_seq)
    W = window or (128 if c0 > 248 else 0)
    if W and c0 > W:
        C = _round_up(c0, W)
    else:
        C = _round_up(c0, 8)
        W = C
    return C, W, C // W, C * n_seq


def effective_seq_groups(cfg: DecoderConfig, B_shard: int) -> int:
    """The seq_groups the cells seq path will ACTUALLY run for a
    per-data-shard batch of B_shard: pipelining needs >1 whole 1024-row
    cells per group and is incompatible with the dma boundary exchange
    (the barrier-semaphore protocol assumes one boundary round per half
    -iteration).  Mirrors the guard in _decode_seq_sharded_cells; callers
    (harness/c5, CLI) surface it so a silently-coerced nG=1 is visible
    (round-4 ADVICE 3)."""
    n_cells = -(-B_shard // 1024)
    if (cfg.seq_groups > 1 and n_cells % cfg.seq_groups == 0
            and cfg.boundary_xch != "dma"):
        return cfg.seq_groups
    return 1


# ---------------------------------------------------------------------------
# Partitioned extrinsic exchange
# ---------------------------------------------------------------------------

def exchange_tables(perm_e: np.ndarray, C: int, n_seq: int,
                    real_len: int | None = None):
    """Static routing tables for la_local[t] = le[perm_e[j*C + t]] with le
    chunk-sharded over 'seq' (C rows per shard).

    real_len: if given, any entry whose SOURCE global index is >= real_len
    routes to the pad (zero) slot instead -- folding the "garbage
    extrinsics beyond row K read as a-priori 0" mask into the gather
    itself, so callers need no separate full-tensor masking pass.

    Returns (local_tbl, send_tbl, slot_tbl, M):
      local_tbl (n_seq, C):    shard j's same-shard source offsets (C = pad,
                               reads a zero row) -- handles the identity
                               tail and every perm entry that stays local.
      send_tbl (n_seq, n_seq, M): send_tbl[s, j, m] = local offset ON SHARD
                               s of the m-th value s ships to shard j
                               (C = pad).
      slot_tbl (n_seq, n_seq*M): slot_tbl[j, s*M+m] = destination offset on
                               shard j of that value (C = pad, dropped).
      M: max per-(src,dst) bucket size over s != j; 0 means no cross-shard
                               traffic at all (n_seq == 1).
    """
    KTp = C * n_seq
    assert len(perm_e) == KTp
    src = perm_e // C
    off = perm_e % C
    local_tbl = np.full((n_seq, C), C, np.int32)
    buckets: dict[tuple[int, int], list[tuple[int, int]]] = {}
    M = 0
    for j in range(n_seq):
        for t in range(C):
            if real_len is not None and perm_e[j * C + t] >= real_len:
                continue                        # reads the zero row
            s = int(src[j * C + t])
            o = int(off[j * C + t])
            if s == j:
                local_tbl[j, t] = o
            else:
                b = buckets.setdefault((s, j), [])
                b.append((t, o))
                M = max(M, len(b))
    send_tbl = np.full((n_seq, n_seq, M), C, np.int32)
    slot_tbl = np.full((n_seq, n_seq * M), C, np.int32)
    for (s, j), pairs in buckets.items():
        for m, (t, o) in enumerate(pairs):
            send_tbl[s, j, m] = o
            slot_tbl[j, s * M + m] = t
    return local_tbl, send_tbl, slot_tbl, M


def make_exchange(perm_e: np.ndarray, C: int, n_seq: int,
                  axis_name: str = "seq", real_len: int | None = None):
    """Build fn(le_local, j) -> la_local applying the static permutation
    across chunk-sharded rows (axis 1) with one all_to_all.

    Round-4 formulation (driven by experiments/seq_glue.py: the previous
    receive-SCATTER dominated the seq path's per-iteration glue, costing
    1.9-2.3x the chunk kernel itself at n_seq in {2,4}): the received
    buckets are CONCATENATED onto the local tensor and the destination is
    assembled by ONE merged gather -- merged_tbl[j, t] indexes into
    [local rows 0..C) ++ [receive buffer rows C..C+n_seq*M), sentinel =
    the zero row.  Gathers run at HBM bandwidth on TPU; row scatters do
    not (XLA lowers them to a full-tensor copy + serialized updates).
    """
    local_np, send_np, slot_np, M = exchange_tables(perm_e, C, n_seq,
                                                    real_len)
    local_tbl = jnp.asarray(local_np)
    send_tbl = jnp.asarray(send_np.reshape(n_seq, -1))

    # merged_tbl: local offsets stay; cross-shard destinations point past
    # C into the received buffer; sentinel S masks to the zero row.
    S = C + n_seq * M
    merged_np = np.where(local_np == C, S, local_np).astype(np.int32)
    for j in range(n_seq):
        for r in range(n_seq * M):
            t = slot_np[j, r]
            if t != C:
                merged_np[j, t] = C + r
    merged_tbl = jnp.asarray(merged_np)

    # Pad entries (value C, the "zero row") are handled with clamp+mask
    # selects that XLA fuses into the gather consumers, NOT by
    # concatenating a zero row onto le -- that concat materialized a full
    # copy of the extrinsic tensor per gather and cost the seq-parallel
    # path ~12% of the flagship throughput even at n_seq=1, where no pad
    # entry exists at all (measured round 3; RESULTS.md C5).
    no_pad_rows = not (local_np == C).any()

    def _masked_take(le_local, tbl_row, n_src):
        mask = tbl_row < n_src
        out = jnp.take(le_local, jnp.where(mask, tbl_row, 0), axis=1)
        # Broadcast the mask along axis 1 whatever the operand rank (the
        # scan path passes (B, C); the cells path (cells, C, 8, 128)).
        bshape = (1, mask.shape[0]) + (1,) * (le_local.ndim - 2)
        return jnp.where(mask.reshape(bshape), out,
                         jnp.zeros((), le_local.dtype))

    def gather_send(le_local: jax.Array, j: jax.Array) -> jax.Array:
        """The per-peer send buckets (the all_to_all payload)."""
        return _masked_take(le_local, jnp.take(send_tbl, j, axis=0), C)

    def combine(le_local: jax.Array, rb: jax.Array, j: jax.Array
                ) -> jax.Array:
        """Assemble la from local rows + received buckets: one gather."""
        src = jnp.concatenate([le_local, rb], axis=1)
        return _masked_take(src, jnp.take(merged_tbl, j, axis=0), S)

    def apply(le_local: jax.Array, j: jax.Array) -> jax.Array:
        if M == 0 and no_pad_rows:
            # n_seq == 1: a pure local permutation, identical in cost to
            # the monolithic decoder's extrinsic gather.
            return jnp.take(le_local, jnp.take(local_tbl, j, axis=0),
                            axis=1)
        if M == 0:
            return _masked_take(le_local, jnp.take(local_tbl, j, axis=0),
                                C)
        sb = gather_send(le_local, j)
        rb = jax.lax.all_to_all(sb, axis_name, split_axis=1, concat_axis=1,
                                tiled=True)
        return combine(le_local, rb, j)

    # Exposed for the glue benchmark (experiments/seq_glue.py), which
    # measures the shard-local parts with a fabricated receive buffer.
    apply.gather_send = gather_send
    apply.combine = combine
    apply.M = M
    return apply


def _chunked_crc_matrix(K: int, crc_poly: int, C: int, n_seq: int):
    """(n_seq, C, 24) per-shard slices of the CRC check matrix, zero-padded
    beyond K so garbage pad-row hard bits contribute nothing."""
    from ..decoder.early_term import _crc_check_matrix_np
    G = _crc_check_matrix_np(K, crc_poly)
    Gp = np.zeros((C * n_seq, G.shape[1]), G.dtype)
    Gp[:K] = G
    return Gp.reshape(n_seq, C, G.shape[1])


def decode_seq_sharded(mesh: jax.sharding.Mesh, cfg: DecoderConfig):
    """Build the jitted sharded decoder for canonical-format inputs.

    Returns fn(ls, lp1, lp2, tail1, tail2) -> (hard, iters, L), with the
    batch axis sharded over 'data' and the SISO recursions split over 'seq'.
    `cfg.siso == "pallas"` selects the fused-kernel chunk path (the
    performance path on TPU); anything else uses the lax.scan chunk SISO.
    Homogeneous-K batches only: TRUE mixed-K decoding (per-codeword
    embedded interleaver tables) shards over the DATA axis -- per-codeword
    gathers cannot ride the shared seq routing tables, and mixed batches
    are a throughput workload, which is the data axis's job (see
    experiments/comm_model.json).
    """
    if cfg.siso == "pallas":
        return _decode_seq_sharded_cells(mesh, cfg)
    return _decode_seq_sharded_scan(mesh, cfg)


def _decode_seq_sharded_scan(mesh: jax.sharding.Mesh, cfg: DecoderConfig):
    n_seq = mesh.shape["seq"]
    K = cfg.K
    KT = K + 3
    # Same chunk geometry as the cells path (chunk_sizing is the single
    # source of truth; this path previously had its own derivation --
    # round-4 review).  The scan SISO has no window constraint, so pass
    # an explicit window=8: C rounds only to the 8-row layout quantum,
    # not to the cells path's default 128-step window (which would add
    # up to ~8% pure pad steps here -- round-4 ADVICE 1).
    C, _, _, KTp = chunk_sizing(KT, n_seq, window=8)
    perm = np.asarray(cfg.perm())
    ext = np.arange(K, KTp, dtype=np.int64)
    perm_e = np.concatenate([perm.astype(np.int64), ext])
    inv_e = np.concatenate([np.asarray(cfg.inv()).astype(np.int64), ext])
    # real_len folds the "extrinsics beyond row K are garbage" mask into
    # the routing tables themselves (sources >= K read the zero row), so
    # the loop below needs no masking pass on the exchanged tensors.  The
    # cells path instead masks IN-KERNEL via its row-offset operand; this
    # scan path is the production user of real_len (round-3 ADVICE 3).
    xch_perm = make_exchange(perm_e, C, n_seq, real_len=K)
    xch_inv = make_exchange(inv_e, C, n_seq, real_len=K)
    scale = cfg.resolved_ext_scale()
    G_chunks = (jnp.asarray(_chunked_crc_matrix(K, cfg.crc_poly, C, n_seq))
                if cfg.early_term == "crc" else None)

    fwd = [(i, (i + 1) % n_seq) for i in range(n_seq)]
    bwd = [((i + 1) % n_seq, i) for i in range(n_seq)]

    def siso_chunk(ls_c, lp_c, la_c, a_in, b_in, j):
        """One shard's SISO over its C steps with NII boundary metrics.

        ls_c/lp_c/la_c: (B, C) chunk-local streams.  Returns
        (le_chunk (B, C), alpha_out, beta_out)."""
        B = ls_c.shape[0]
        e0 = jnp.full((N_STATES,), NEG, ls_c.dtype).at[0].set(0.0)
        a0 = jnp.where(j == 0, e0[None, :], a_in)
        bT = jnp.where(j == n_seq - 1, e0[None, :], b_in)
        _, le, a_out, b_out = siso_scan_boundary(ls_c, lp_c, la_c, a0, bT,
                                                 cfg.mode)
        return le, a_out, b_out

    spec_b = P(("data",), None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec_b,) * 5,
        out_specs=(spec_b, P(("data",)), spec_b), check_vma=False)
    def decode(ls, lp1, lp2, t1, t2):
        from ..siso.windowed import BIG
        B = ls.shape[0]
        j = jax.lax.axis_index("seq")

        def pad_stream(x, value=0.0):
            return jnp.pad(x, ((0, 0), (0, KTp - KT)), constant_values=value)

        def chunk(x):
            return jax.lax.dynamic_slice_in_dim(x, j * C, C, 1)

        # Known-0 padding beyond the real trellis (state-0 fixed point);
        # streams are chunked ONCE -- per-iteration tensors are chunk-local.
        ls1 = chunk(pad_stream(jnp.concatenate([ls, t1[:, 0::2]], 1), BIG))
        lp1f = chunk(pad_stream(jnp.concatenate([lp1, t1[:, 1::2]], 1)))
        ls2 = chunk(pad_stream(jnp.concatenate([ls[:, perm], t2[:, 0::2]], 1),
                               BIG))
        lp2f = chunk(pad_stream(jnp.concatenate([lp2, t2[:, 1::2]], 1)))
        # Raw systematic for L: ls is K wide (no tail), so it pads by
        # KTp-K, NOT the KTp-KT that pad_stream applies to KT-wide
        # streams.  (Round-4 review: the old pad_stream(ls) left the
        # array 3 rows short, the last shard's dynamic_slice clamped,
        # and every row of its chunk read ls[t-3] -- wrong soft outputs
        # for the whole last chunk.)
        ls_c = chunk(jnp.pad(ls, ((0, 0), (0, KTp - K))))

        uni = jnp.zeros((B, N_STATES), ls.dtype)
        # Extrinsics beyond row K are meaningless; the exchange tables'
        # real_len routing zeroes them at the gather, so the loop only
        # needs real_mask for the sign-agreement check below.
        real_mask = ((j * C + jnp.arange(C)) < K)[None, :]

        def exchange(a_out, b_out):
            a_in = jax.lax.ppermute(a_out, "seq", fwd)
            b_in = jax.lax.ppermute(b_out, "seq", bwd)
            return a_in, b_in

        def cond(carry):
            it = carry[0]
            undone_g = carry[-1]
            return (it < cfg.n_iters) & (undone_g > 0)

        def body(carry):
            (it, le21, a1, b1, a2, b2, L_prev, hard_prev, done, iters,
             _) = carry
            le1_c, a1o, b1o = siso_chunk(ls1, lp1f, le21, a1, b1, j)
            le1 = le1_c * scale
            le2_c, a2o, b2o = siso_chunk(ls2, lp2f, xch_perm(le1, j),
                                         a2, b2, j)
            le2 = le2_c * scale
            le21_new = xch_inv(le2, j)
            L_new = ls_c + le1 + le21_new          # rows >= K are junk
            hard_new = (L_new < 0).astype(jnp.int8)
            a1n, b1n = exchange(a1o, b1o)
            a2n, b2n = exchange(a2o, b2o)

            if cfg.early_term == "crc":
                # Partial syndrome on local rows; GF(2) linearity makes the
                # psum over 'seq' the full-block syndrome (24 floats/cw).
                G_loc = jnp.take(G_chunks, j, axis=0)        # (C, 24)
                synd = jax.lax.psum(
                    jnp.dot(hard_new.astype(jnp.float32), G_loc,
                            preferred_element_type=jnp.float32), "seq")
                newly_done = jnp.all(synd % 2.0 == 0.0, axis=-1)
            elif cfg.early_term == "sign":
                agree = jnp.all((hard_new == hard_prev) | ~real_mask, axis=1)
                newly_done = jax.lax.psum(
                    agree.astype(jnp.int32), "seq") == n_seq
            else:
                newly_done = jnp.zeros((B,), bool)

            # Freeze converged codewords branchlessly.
            keep = done[:, None]
            le21 = jnp.where(keep, le21, le21_new)
            L = jnp.where(keep, L_prev, L_new)
            hard = jnp.where(keep, hard_prev, hard_new)
            iters = iters + (~done).astype(jnp.int32)
            done = done | newly_done
            # Early exit must be GLOBAL: 'data' shards hold different
            # codewords, and a shard that exits the while_loop early stops
            # feeding its row's collectives -- the XLA:CPU in-process
            # communicator then deadlocks (and trip counts must match on
            # any backend for safety).  One scalar psum buys lockstep exit.
            undone_g = jax.lax.psum(
                jnp.sum((~done).astype(jnp.int32)), "data")
            return (it + 1, le21, a1n, b1n, a2n, b2n, L, hard, done, iters,
                    undone_g)

        zC = jnp.zeros((B, C), ls.dtype)
        init = (jnp.int32(0), zC, uni, uni, uni, uni,
                zC, jnp.zeros((B, C), jnp.int8),
                jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
                jnp.int32(1))
        out = jax.lax.while_loop(cond, body, init)
        (_, _, _, _, _, _, L_c, hard_c, done, iters, _) = out
        # One assembly gather at the very end (not per half-iteration).
        hard = jax.lax.all_gather(hard_c, "seq", axis=1, tiled=True)[:, :K]
        L = jax.lax.all_gather(L_c, "seq", axis=1, tiled=True)[:, :K]
        return hard, iters, L

    return decode


def _decode_seq_sharded_cells(mesh: jax.sharding.Mesh, cfg: DecoderConfig):
    """Seq-parallel decode with the fused Pallas SISO kernel per chunk.

    Each 'seq' shard runs the fused gamma/alpha/beta/LLR window kernel
    (siso/pallas_kernel.py, boundary mode) over its trellis chunk, keeping
    every per-iteration tensor CHUNK-LOCAL in the kernel's native
    (cells, C, 8, 128) layout; NII boundary alpha/beta metrics ride
    `lax.ppermute` to the neighbor shard and extrinsics move through the
    partitioned all_to_all exchange each half-iteration.  The chunk
    recursion runs at kernel speed instead of lax.scan speed.

    With cfg.nii the chunk kernel ALSO runs in NII mode internally
    (round-2 VERDICT item 1): window-start alphas inside the chunk are
    inherited from the previous half-iteration (nii_boundaries kernel
    contract) -- the same stale-edge approximation the cross-chunk
    ppermute already makes, applied at window granularity -- so the
    sharded path runs at the monolithic NII flagship's per-chip speed
    instead of two-phase speed.  With one window per chunk the NII and
    exact chunk paths are identical by construction.
    """
    from ..siso.pallas_kernel import (BIG as PBIG, CELL, from_cells,
                                      siso_cells, to_cells)

    n_seq = mesh.shape["seq"]
    K = cfg.K
    KT = K + 3
    # Chunk length: a multiple of the kernel's window (cfg.window or 128
    # for big chunks, UNROLL=8 for single-window small chunks).  Pad steps
    # carry the known-0-bit metrics, so padded chunks are bit-exact at
    # real positions.
    C, W, n_win, KTp = chunk_sizing(KT, n_seq, cfg.window)
    perm = np.asarray(cfg.perm())
    ext = np.arange(K, KTp, dtype=np.int64)
    perm_e = np.concatenate([perm.astype(np.int64), ext])
    inv_e = np.concatenate([np.asarray(cfg.inv()).astype(np.int64), ext])
    # Garbage extrinsics beyond global row K are zeroed as a-priori
    # IN-KERNEL: the chunk kernel takes K_real=K (global) plus a row
    # -offset scalar (j*C), so tail destinations (perm_e identity there)
    # mask themselves and the exchange stays a pure gather -- no
    # real_len pad entries, no full-tensor select after the gather
    # (XLA does not fuse that select; it cost ~15% at 1x1, round 3).
    xch_perm = make_exchange(perm_e, C, n_seq)
    xch_inv = make_exchange(inv_e, C, n_seq)
    scale = cfg.resolved_ext_scale()
    G_chunks_np = (_chunked_crc_matrix(K, cfg.crc_poly, C, n_seq)
                   if cfg.early_term == "crc" else None)

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
        dt = jnp.dtype(cfg.io_dtype)   # channel LLR HBM dtype
        # Extrinsics may ride a narrower dtype (f8/int8): they are ALSO the
        # all_to_all payload, so the only comm volume that grows with K
        # halves along with the gather bytes (round-3 VERDICT item 2a).
        ext_dt, qs = cfg.ext_io()
        dte = jnp.dtype(ext_dt)
        padb = lambda x: jnp.pad(x.astype(dt), ((0, Bp - B), (0, 0)))

        def chunk(x):
            return jax.lax.dynamic_slice_in_dim(x, j * C, C, 1)

        def stream(body_, tail, pad_val):
            full = jnp.concatenate([body_, tail], axis=1)
            full = jnp.pad(full, ((0, 0), (0, KTp - KT)),
                           constant_values=pad_val)
            return chunk(to_cells(padb(full)))

        # Chunk-local channel streams, built once.
        ls1_c = stream(ls, t1[:, 0::2], PBIG)
        lp1_c = stream(lp1, t1[:, 1::2], 0.0)
        ls2_c = stream(ls[:, perm], t2[:, 0::2], PBIG)
        lp2_c = stream(lp2, t2[:, 1::2], 0.0)
        n_cells = ls1_c.shape[0]

        # Software pipelining (round-3 VERDICT item 2b): split the local
        # batch into nG INDEPENDENT cell groups.  Groups share no data
        # until the final assembly, so XLA's async-collective scheduler
        # is free to overlap group g's extrinsic all_to_all / boundary
        # ppermute with group g+1's chunk kernel -- the exchange leaves
        # the critical path up to the pipeline-fill tail (modeled in
        # experiments/comm_model.py overlap mode).  Every shard iterates
        # groups in the same order, so the collective sequence stays
        # identical across the mesh (no deadlock risk).
        nG = effective_seq_groups(cfg, n_cells * 1024)
        n_g = n_cells // nG

        def split(x):
            return [x[g * n_g:(g + 1) * n_g] for g in range(nG)]

        ls1_g, lp1_g = split(ls1_c), split(lp1_c)
        ls2_g, lp2_g = split(ls2_c), split(lp2_c)

        e0 = jnp.concatenate(
            [jnp.zeros((n_g, 1, 8, 128), jnp.float32),
             jnp.full((n_g, 7, 8, 128), -PBIG, jnp.float32)], axis=1)
        uni = jnp.zeros((n_g, 8, 8, 128), jnp.float32)
        G_chunks = (jnp.asarray(G_chunks_np) if G_chunks_np is not None
                    else None)
        # Rows with global index >= K carry +-BIG pad-step garbage
        # extrinsics.  The kernel's global-row mask (K_real=K + the j*C
        # row offset) reads a-priori 0 there, G_chunks is zero beyond K,
        # sign-agreement masks below, and final outputs are sliced to :K
        # -- no full-tensor masking pass anywhere in the loop.
        row_off = (j * C).astype(jnp.int32)[None]
        real_mask = ((j * C + jnp.arange(C)) < K)[None, :, None, None]

        def siso_chunk(ls_c, lp_c, la_c, a_in, b_in):
            """a_in: exact mode -> chunk-start alpha edge; NII mode ->
            (window-start table, received chunk edge).  NII composes at
            both granularities: window seams inherit last half
            -iteration's alphas (the kernel writes the table's shifted
            slots itself -- the carry flows through the loop untouched),
            chunk seams ride ppermute."""
            bT = jnp.where(j == n_seq - 1, e0, b_in)
            if cfg.nii:
                ain, edge_in = a_in
                le_c, a_out, e_out, b_out = siso_cells(
                    ls_c, lp_c, la_c, K, cfg.mode, scale,
                    nii_boundaries=(ain, edge_in, bT), window=W,
                    row_offset=row_off, ext_qscale=qs)
                return le_c, (a_out, e_out), b_out
            a0 = jnp.where(j == 0, e0, a_in)
            le_c, a_out, b_out = siso_cells(
                ls_c, lp_c, la_c, K, cfg.mode, scale,
                boundaries=(a0, bT), window=W, row_offset=row_off,
                ext_qscale=qs)
            return le_c, a_out, b_out

        def exchange(a_out, b_out):
            if cfg.nii:
                a_tbl, e_out = a_out
                edge_rx = jax.lax.ppermute(e_out, "seq", fwd)
                # Shard 0 pins the exact trellis edge e0 instead.
                a_in = (a_tbl, jnp.where(j == 0, e0, edge_rx))
            else:
                a_in = jax.lax.ppermute(a_out, "seq", fwd)
            return a_in, jax.lax.ppermute(b_out, "seq", bwd)

        def xch_edges(a1o, b1o, a2o, b2o):
            if cfg.boundary_xch == "dma" and n_seq > 1:
                # One Pallas kernel ships the whole iteration's boundary
                # traffic: both SISOs' alpha metrics ride one forward
                # remote DMA, both betas one backward DMA, in flight
                # simultaneously (dist/dma.py).
                from .dma import boundary_exchange_dma
                fa1, fa2 = (a1o[1], a2o[1]) if cfg.nii else (a1o, a2o)
                fwd_rx, bwd_rx = boundary_exchange_dma(
                    jnp.stack([fa1, fa2]), jnp.stack([b1o, b2o]), "seq",
                    data_axis="data")
                a1n, a2n = fwd_rx[0], fwd_rx[1]
                b1n, b2n = bwd_rx[0], bwd_rx[1]
                if cfg.nii:
                    a1n = (a1o[0], jnp.where(j == 0, e0, a1n))
                    a2n = (a2o[0], jnp.where(j == 0, e0, a2n))
            else:
                a1n, b1n = exchange(a1o, b1o)
                a2n, b2n = exchange(a2o, b2o)
            return a1n, b1n, a2n, b2n

        deq = scale * (qs if qs else 1.0)  # int8 extrinsic dequant

        def full_llr(ls1_loc, le1, le21):
            f32 = jnp.float32
            return (ls1_loc.astype(f32)
                    + deq * (le1.astype(f32) + le21.astype(f32)))

        # NII carries (per-window alpha-start table, chunk edge); exact
        # mode carries chunk-edge metrics only.  Zeros = uniform cold
        # start; shard 0's chunk edge is the exact trellis edge e0.
        def make_a_init():
            if cfg.nii:
                return (jnp.zeros((n_g, n_win, 8, 8, 128), jnp.float32),
                        jnp.where(j == 0, e0, jnp.zeros_like(e0)))
            return uni

        if cfg.early_term == "none":
            # Lean loop (decoder/turbo_cells.py convention): no per-
            # iteration L/hard/freeze HBM tensors -- outputs once after.
            # The group loop is unrolled at trace time; each group's ops
            # depend only on its own carry, exposing the exchange/kernel
            # overlap across groups to the scheduler.
            def body_lean(carry):
                it, groups = carry
                out = []
                for g in range(nG):
                    le21, le1p, a1, b1, a2, b2 = groups[g]
                    le1, a1o, b1o = siso_chunk(ls1_g[g], lp1_g[g], le21,
                                               a1, b1)
                    le2, a2o, b2o = siso_chunk(ls2_g[g], lp2_g[g],
                                               xch_perm(le1, j), a2, b2)
                    le21n = xch_inv(le2, j)
                    a1n, b1n, a2n, b2n = xch_edges(a1o, b1o, a2o, b2o)
                    out.append((le21n, le1, a1n, b1n, a2n, b2n))
                return it + 1, tuple(out)

            zT = jnp.zeros((n_g, C, 8, 128), dte)
            init_g = tuple((zT, zT, make_a_init(), uni, make_a_init(), uni)
                           for _ in range(nG))
            _, groups = jax.lax.while_loop(
                lambda c: c[0] < cfg.n_iters, body_lean,
                (jnp.int32(0), init_g))
            L_c = jnp.concatenate(
                [full_llr(ls1_g[g], groups[g][1], groups[g][0])
                 for g in range(nG)])
            hard_c = (L_c < 0).astype(jnp.int8)
            hard = jax.lax.all_gather(hard_c, "seq", axis=1, tiled=True)
            L = jax.lax.all_gather(L_c, "seq", axis=1, tiled=True)
            iters_b = jnp.full((B,), cfg.n_iters, jnp.int32)
            return from_cells(hard)[:B, :K], iters_b, from_cells(L)[:B, :K]

        def cond(carry):
            it = carry[0]
            undone_g = carry[-1]
            return (it < cfg.n_iters) & (undone_g > 0)

        # Sign mode needs last iteration's hard bits; CRC does not.
        need_hard_prev = cfg.early_term == "sign"

        def body(carry):
            it, groups, _ = carry
            out, undone_local = [], jnp.int32(0)
            for g in range(nG):
                if need_hard_prev:
                    (le21, le1f, a1, b1, a2, b2, hard_prev, done,
                     iters) = groups[g]
                else:
                    le21, le1f, a1, b1, a2, b2, done, iters = groups[g]
                # Extrinsics stay unscaled; the kernel applies `scale` to
                # its a-priori input, as in decoder/turbo_cells.py.
                le1, a1o, b1o = siso_chunk(ls1_g[g], lp1_g[g], le21, a1, b1)
                le2, a2o, b2o = siso_chunk(ls2_g[g], lp2_g[g],
                                           xch_perm(le1, j), a2, b2)
                le21_new = xch_inv(le2, j)
                # Fused sign decision -- no fp32 L materialized in-loop;
                # L is recomputed once after the loop from the FROZEN
                # extrinsics (pure function => bit-identical to the
                # at-convergence value; decoder/turbo_cells.py round-5
                # convention).
                hard_new = (full_llr(ls1_g[g], le1, le21_new)
                            < 0).astype(jnp.int8)
                a1n, b1n, a2n, b2n = xch_edges(a1o, b1o, a2o, b2o)

                if cfg.early_term == "crc":
                    # Shard-local partial syndrome, psum'd over 'seq'
                    # (GF(2) linearity): (cells, 24, 8, 128) replaces a
                    # K-row gather.
                    G_loc = jnp.take(G_chunks, j, axis=0)     # (C, 24)
                    synd = jax.lax.psum(jnp.einsum(
                        "nchw,ck->nkhw", hard_new.astype(jnp.float32),
                        G_loc, preferred_element_type=jnp.float32), "seq")
                    newly_done = jnp.all(synd % 2.0 == 0.0, axis=1)
                elif cfg.early_term == "sign":
                    agree = jnp.all((hard_new == hard_prev)
                                    | ~real_mask, axis=1)
                    newly_done = jax.lax.psum(
                        agree.astype(jnp.int32), "seq") == n_seq
                else:
                    newly_done = jnp.zeros((n_g, 8, 128), bool)
                keep = done[:, None]
                le21 = jnp.where(keep, le21, le21_new)
                le1f = jnp.where(keep, le1f, le1)
                iters = iters + (~done).astype(jnp.int32)
                done = done | newly_done
                undone_local += jnp.sum((~done).astype(jnp.int32))
                if need_hard_prev:
                    hard_prev = jnp.where(keep, hard_prev, hard_new)
                    out.append((le21, le1f, a1n, b1n, a2n, b2n, hard_prev,
                                done, iters))
                else:
                    out.append((le21, le1f, a1n, b1n, a2n, b2n, done,
                                iters))
            # Global early-exit flag: see _decode_seq_sharded_scan -- 'data'
            # shards must take identical trip counts or their rows'
            # collectives desync (XLA:CPU deadlocks outright).
            undone_g = jax.lax.psum(undone_local, "data")
            return it + 1, tuple(out), undone_g

        def init_group():
            zE = jnp.zeros((n_g, C, 8, 128), dte)
            zH = ((jnp.zeros((n_g, C, 8, 128), jnp.int8),)
                  if need_hard_prev else ())
            return (zE, zE, make_a_init(), uni, make_a_init(), uni, *zH,
                    jnp.zeros((n_g, 8, 128), bool),
                    jnp.zeros((n_g, 8, 128), jnp.int32))

        init = (jnp.int32(0), tuple(init_group() for _ in range(nG)),
                jnp.int32(1))
        _, groups, _ = jax.lax.while_loop(cond, body, init)
        L_c = jnp.concatenate(
            [full_llr(ls1_g[g], groups[g][1], groups[g][0])
             for g in range(nG)])
        hard_c = (L_c < 0).astype(jnp.int8)
        iters = jnp.concatenate([groups[g][-1] for g in range(nG)])
        # Single assembly gather after the loop.
        hard = jax.lax.all_gather(hard_c, "seq", axis=1, tiled=True)
        L = jax.lax.all_gather(L_c, "seq", axis=1, tiled=True)
        hard_b = from_cells(hard)[:B, :K]
        L_b = from_cells(L)[:B, :K]
        iters_b = iters.reshape(n_cells * CELL)[:B]
        return hard_b, iters_b, L_b

    return decode

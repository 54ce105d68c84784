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
    """
    n_seq = mesh.shape["seq"]
    K = cfg.K
    KT = K + 3
    C = _round_up(KT, n_seq) // n_seq          # trellis chunk per shard
    KTp = C * n_seq
    perm = jnp.asarray(cfg.perm())
    inv = jnp.asarray(cfg.inv())
    scale = cfg.ext_scale if cfg.ext_scale else (0.75 if cfg.mode == "maxlog" else 1.0)
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
            (it, le21, a1, b1, a2, b2, L_prev, hard_prev, done, iters) = carry
            return (it < cfg.n_iters) & ~jnp.all(done)

        def body(carry):
            (it, le21, a1, b1, a2, b2, L_prev, hard_prev, done, iters) = carry
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
            return (it + 1, le21, a1n, b1n, a2n, b2n, L, hard, done, iters)

        init = (jnp.int32(0), jnp.zeros((B, K), ls.dtype), uni, uni, uni, uni,
                jnp.zeros((B, K), ls.dtype), jnp.zeros((B, K), jnp.int8),
                jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32))
        # while_loop: no unrolling, plus whole-batch early exit; the CRC
        # early-term decision is replicated across 'seq' shards, so every
        # shard takes the same trip count and ppermutes stay matched.
        out = jax.lax.while_loop(cond, body, init)
        (_, _, _, _, _, _, L, hard, done, iters) = out
        return hard, iters, L

    return decode

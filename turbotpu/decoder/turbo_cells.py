"""Turbo decode loop in the Pallas kernel's native cell layout.

Keeps every per-iteration tensor in (cells, T, 8, 128) layout so the hot
loop runs transpose-free: interleaving is a gather on the time axis, the
CRC check contracts the time axis directly with dot_general, and per
-codeword freeze masks live as (cells, 8, 128) tiles.  Only the initial
channel-LLR packing and the final hard-bit unpacking cross layouts
(SURVEY.md section 4.2; the transposes otherwise cost ~as much HBM traffic
as the SISO kernel itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..siso.pallas_kernel import (BIG, CELL, from_cells, siso_cells,
                                  to_cells, window_len, _round_up)
from ..spec.crc import crc_matrix
from .early_term import _crc_check_matrix_np
from .turbo import DecoderConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def turbo_decode_cells(ls: jax.Array, lp1: jax.Array, lp2: jax.Array,
                       tail1: jax.Array, tail2: jax.Array,
                       cfg: DecoderConfig):
    """Same contract as decoder.turbo.turbo_decode, Pallas-cell hot loop."""
    B, K = ls.shape
    assert K == cfg.K
    KT = K + 3
    W = window_len(KT)
    KTp = _round_up(KT, W)
    perm = jnp.asarray(cfg.perm())
    inv = jnp.asarray(cfg.inv())
    scale = cfg.ext_scale if cfg.ext_scale else (0.75 if cfg.mode == "maxlog" else 1.0)
    Bp = _round_up(B, CELL)
    padb = lambda x: jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, 0)))

    # Build padded natural/interleaved streams once, then cell-ify.
    def stream(body, tail, pad_val):
        full = jnp.concatenate([body, tail], axis=1)
        full = jnp.pad(full, ((0, 0), (0, KTp - KT)), constant_values=pad_val)
        return to_cells(padb(full))

    ls1_c = stream(ls, tail1[:, 0::2], BIG)
    lp1_c = stream(lp1, tail1[:, 1::2], 0.0)
    ls2_c = stream(ls[:, perm], tail2[:, 0::2], BIG)
    lp2_c = stream(lp2, tail2[:, 1::2], 0.0)
    P1 = -lp1_c
    P2 = -lp2_c
    n_cells = ls1_c.shape[0]

    if cfg.early_term == "crc":
        G = jnp.asarray(_crc_check_matrix_np(K, cfg.crc_poly))
    else:
        G = None

    zpad = jnp.zeros((n_cells, KTp - K, 8, 128), jnp.float32)

    def pad_time(x):
        return jnp.concatenate([x, zpad], axis=1)

    def body(_, carry):
        le21, L_prev, hard_prev, done, iters = carry
        # SISO1 (natural order): A = -(la + ls).
        A1 = -(pad_time(le21) + ls1_c)
        le1 = siso_cells(A1, P1, cfg.mode)[:, :K] * scale
        # SISO2 (interleaved order).
        A2 = -(pad_time(le1[:, perm]) + ls2_c)
        le2 = siso_cells(A2, P2, cfg.mode)[:, :K] * scale
        le21_new = le2[:, inv]
        L_new = ls1_c[:, :K] + le1 + le21_new
        hard_new = (L_new < 0).astype(jnp.int8)

        if cfg.early_term == "crc":
            synd = jax.lax.dot_general(
                hard_new.astype(jnp.float32), G,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            newly_done = jnp.all(synd % 2.0 == 0.0, axis=-1)  # (cells, 8, 128)
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
        return le21, L, hard, done, iters

    z = jnp.zeros((n_cells, K, 8, 128), jnp.float32)
    init = (z, z, jnp.zeros(z.shape, jnp.int8),
            jnp.zeros((n_cells, 8, 128), bool),
            jnp.zeros((n_cells, 8, 128), jnp.int32))
    le21, L, hard, done, iters = jax.lax.fori_loop(0, cfg.n_iters, body, init)

    hard_b = from_cells(hard)[:B]
    L_b = from_cells(L)[:B]
    iters_b = iters.reshape(n_cells * CELL)[:B]
    return hard_b, iters_b, L_b

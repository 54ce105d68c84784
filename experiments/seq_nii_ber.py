"""BER validation of the NII x seq-parallel composition at the K=6144
waterfall (round-2 VERDICT item 1 done-criterion), on ONE chip.

Only one TPU chip is available, so the n_seq-sharded decode cannot run
distributed here -- but its MATH can, exactly: the partitioned
all_to_all extrinsic exchange is a static permutation of values (equal
to the monolithic gather), and the cross-chunk ppermute edge exchange is
a roll over a leading chunk axis with e0 pinned at the open ends.  This
script emulates `dist.seq_parallel._decode_seq_sharded_cells` with
cfg.nii=True on a single device -- same kernel (`nii_boundaries`
contract), same chunk sizes, same per-chunk masks, same edge staleness
-- at full kernel speed, and compares FER against the monolithic NII
decoder on the same seeds.

Equivalence of the emulation to the sharded program is separately
anchored by tests/dist/test_seq_parallel.py (fake-mesh sharded decode vs
monolithic agreement, single-window nii == exact bitwise); what this
adds is STATISTICS at K=6144, which the CPU interpreter cannot reach.

Run ON TPU:
  python experiments/seq_nii_ber.py [--n-seq 8] [--ebn0 0.6 0.7 0.8]
Writes experiments/seq_nii_ber.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def build_emulated(K: int, n_seq: int, B: int, n_iters: int = 6,
                   window: int = 256, io_dtype: str = "bfloat16"):
    """Single-device emulation of the nii seq-sharded cells decode."""
    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.dist.seq_parallel import _round_up
    from turbotpu.siso.pallas_kernel import (BIG, CELL, from_cells,
                                             siso_cells, to_cells)

    cfg = DecoderConfig(K=K, n_iters=n_iters, mode="maxlog", ext_scale=0.75,
                        siso="pallas", io_dtype=io_dtype, nii=True,
                        window=window)
    KT = K + 3
    c0 = -(-KT // n_seq)
    W = window if c0 > window else _round_up(c0, 8)
    C = _round_up(c0, W)
    n_win = C // W
    KTp = C * n_seq
    scale = cfg.resolved_ext_scale()
    dt = jnp.dtype(io_dtype)
    perm = np.asarray(cfg.perm())
    ext = np.arange(K, KTp, dtype=np.int32)
    perm_e = jnp.asarray(np.concatenate([perm.astype(np.int32), ext]))
    inv_e = jnp.asarray(np.concatenate(
        [np.asarray(cfg.inv(), np.int32), ext]))
    Bp = _round_up(B, CELL)
    n_cells = Bp // CELL

    def to_chunks(full):                       # (Bp, KTp) -> (n_seq, cells, C, 8, 128)
        return jnp.stack([to_cells(full[:, j * C:(j + 1) * C])
                          for j in range(n_seq)])

    def to_flat(ch):                           # inverse (values only)
        return jnp.concatenate([from_cells(ch[j]) for j in range(n_seq)],
                               axis=1)

    def kern(ls, lp, la, ain, ein, bT):
        # One kernel call per emulated shard (a vmap over pallas_call
        # produced 5-D ANY-space operands the Mosaic lowering rejects);
        # this matches the real sharded program exactly: each shard runs
        # its own kernel instance over its chunk.
        outs = [siso_cells(ls[j], lp[j], la[j], C, cfg.mode, scale,
                           nii_boundaries=(ain[j], ein[j], bT[j]),
                           window=W)
                for j in range(n_seq)]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]),
                jnp.stack([o[2] for o in outs]),
                jnp.stack([o[3] for o in outs]))

    e0c = jnp.concatenate(
        [jnp.zeros((n_cells, 1, 8, 128), jnp.float32),
         jnp.full((n_cells, 7, 8, 128), -BIG, jnp.float32)], axis=1)
    uni = jnp.zeros((n_cells, 8, 8, 128), jnp.float32)
    # Per-chunk mask of real (t < K) rows, cell layout.
    rm = []
    for j in range(n_seq):
        m = ((j * C + np.arange(C)) < K)
        rm.append(m[None, :, None, None])
    real_mask = jnp.asarray(np.stack(rm))      # (n_seq, 1, C, 1, 1)

    def exchange_e(eout):
        # Cross-chunk alpha edge to the next chunk; e0 at the open end.
        return jnp.concatenate([e0c[None], eout[:-1]], axis=0)

    def exchange_b(bout):
        return jnp.concatenate([bout[1:], e0c[None]], axis=0)

    def xch(le_ch, table):
        """The extrinsic exchange: mathematically the partitioned
        all_to_all == one global static gather on a single device."""
        flat = to_flat(le_ch)
        return to_chunks(flat[:, table])

    @jax.jit
    def decode(ls, lp1, lp2, t1, t2):
        padb = lambda x: jnp.pad(x.astype(dt), ((0, Bp - B), (0, 0)))

        def stream(body, tail, pad_val):
            full = jnp.concatenate([body, tail], axis=1)
            full = jnp.pad(full, ((0, 0), (0, KTp - KT)),
                           constant_values=pad_val)
            return to_chunks(padb(full))

        ls1 = stream(ls, t1[:, 0::2], BIG)
        lp1c = stream(lp1, t1[:, 1::2], 0.0)
        ls2 = stream(ls[:, perm], t2[:, 0::2], BIG)
        lp2c = stream(lp2, t2[:, 1::2], 0.0)

        zc = jnp.zeros((n_seq, n_cells, C, 8, 128), dt)
        za = jnp.zeros((n_seq, n_cells, n_win, 8, 8, 128), jnp.float32)

        # The carry keeps le1 so the final LLR is computed once after the
        # loop (the lean-loop convention of decoder/turbo_cells.py).
        def body2(i, c):
            (le21, a1, e1, b1, a2, e2, b2, _) = c
            le1, a1o, e1o, b1o = kern(ls1, lp1c, le21, a1, exchange_e(e1),
                                      exchange_b(b1))
            le1 = jnp.where(real_mask, le1, jnp.zeros((), dt))
            le2, a2o, e2o, b2o = kern(ls2, lp2c, xch(le1, perm_e),
                                      a2, exchange_e(e2), exchange_b(b2))
            le2 = jnp.where(real_mask, le2, jnp.zeros((), dt))
            return (xch(le2, inv_e), a1o, e1o, b1o, a2o, e2o, b2o, le1)

        ze = jnp.stack([uni] * n_seq)
        carry = (zc, za, ze, jnp.stack([uni] * n_seq), za, ze,
                 jnp.stack([uni] * n_seq), zc)
        le21, _, _, _, _, _, _, le1 = jax.lax.fori_loop(
            0, n_iters, body2, carry)
        f32 = jnp.float32
        L = (to_flat(ls1).astype(f32)
             + scale * (to_flat(le1).astype(f32)
                        + to_flat(le21).astype(f32)))
        return (L[:B, :K] < 0).astype(jnp.int8)

    return decode


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=6144)
    ap.add_argument("--n-seq", type=int, default=8)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--ebn0", type=float, nargs="+", default=[0.6, 0.7, 0.8])
    ap.add_argument("--min-frame-errors", type=int, default=100)
    ap.add_argument("--max-frames", type=int, default=65_536)
    ap.add_argument("--out", default="experiments/seq_nii_ber.json")
    args = ap.parse_args(argv)

    from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
    from turbotpu.harness.c5 import make_batch

    dec_s = build_emulated(args.k, args.n_seq, args.b, args.iters,
                           args.window)
    cfg_m = DecoderConfig(K=args.k, n_iters=args.iters, mode="maxlog",
                          ext_scale=0.75, siso="pallas",
                          io_dtype="bfloat16", nii=True, window=args.window)
    rows = []
    for ebn0 in args.ebn0:
        stats = {"sharded": [0, 0], "monolithic": [0, 0]}
        frames = 0
        seed = 0
        while (min(stats["sharded"][0], stats["monolithic"][0])
               < args.min_frame_errors and frames < args.max_frames):
            bits, noisy = make_batch(args.k, args.b, ebn0,
                                     seed + int(ebn0 * 1000),
                                     n_unique=64)
            noisy = jax.device_put(noisy)
            h_s = np.asarray(dec_s(*noisy))
            h_m = np.asarray(turbo_decode(*noisy, cfg_m)[0])
            for name, h in (("sharded", h_s), ("monolithic", h_m)):
                err = h != bits
                stats[name][0] += int(err.any(axis=1).sum())
                stats[name][1] += int(err.sum())
            frames += args.b
            seed += 1
        fer_s = stats["sharded"][0] / frames
        fer_m = stats["monolithic"][0] / frames
        # dB delta from the measured waterfall slope (~1 decade / 0.1 dB
        # at K=6144 -- RESULTS.md NII table convention).
        import math
        delta_db = (0.1 * math.log10(fer_s / fer_m)
                    if fer_s > 0 and fer_m > 0 else 0.0)
        row = {"ebn0_db": ebn0, "frames": frames,
               "fer_sharded": fer_s, "fer_monolithic": fer_m,
               "ber_sharded": stats["sharded"][1] / (frames * args.k),
               "ber_monolithic": stats["monolithic"][1] / (frames * args.k),
               "delta_db_slope": delta_db}
        rows.append(row)
        print(row, flush=True)
    rec = {"K": args.k, "n_seq": args.n_seq, "B": args.b,
           "iters": args.iters, "window": args.window, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"written {args.out}")


if __name__ == "__main__":
    main()

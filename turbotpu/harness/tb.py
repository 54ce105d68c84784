"""Device-side transport-block Monte-Carlo (round-2 VERDICT item 3).

The host-side `turbotpu.transport` pipeline proves segmentation
correctness block by block; this module runs the FULL TS 36.212 section
5.1 transport-block chain as one fused jitted step so segmented TBs
(> 6144 info bits) get real BER/TBLER curves at device speed:

    payload -> CRC-24A -> segmentation (CRC-24B per block, filler bits in
    block 0) -> per-block turbo encode -> per-block rate matching to its
    E_r share of G (fillers never transmitted) -> BPSK/AWGN -> per-block
    de-rate-matching -> ONE batched mixed-K decode of all C blocks of all
    n_tb transport blocks via embedded permutation tables (K- and K+
    blocks in the same call, CRC-24B early termination) -> reassembly ->
    CRC-24A check -> error counters.

Segment boundaries, filler counts and E_r splits are static per config,
so the whole chain traces into one XLA program; the host only checks the
stopping rule between batches (SURVEY.md section 1 item 6, section 3
component 5).

Leading-zero CRC property used by the embedded decode: a CRC register
initialized to zero stays at zero over leading zero bits, so
CRC24B(0^F ++ blk) == CRC24B(blk) -- the bucket-wide CRC-24B check
matrix is exact for embedded codewords whose fillers decode to 0 (they
do: filler systematic LLRs are pinned to +BIG).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.bucketing import grouped_perm_tables
from ..decoder.turbo import DecoderConfig, turbo_decode
from ..spec.crc import CRC24A_POLY, CRC24B_POLY, CRC_LEN
from ..spec.segmentation import segment_params
from ..transport import per_block_e
from ..tx import chain
from ..tx.rate_match_jax import (de_rate_match_jax, lte_demux_jax,
                                 lte_mux_jax, rate_match_jax)
from .ber import BIG_LLR


@dataclasses.dataclass(frozen=True)
class TBConfig:
    """Static transport-block simulation configuration."""
    name: str = "tb"
    A: int = 12000                  # info bits per transport block
    n_tb: int = 8                   # transport blocks per device batch
    ebn0_db_grid: tuple[float, ...] = (0.5, 1.0)
    G: int = 0                      # rate-matched channel bits per TB per
                                    # transmission (0 = mother rate 1/3;
                                    # each block then gets its TS 36.212
                                    # s5.1.4.1.2 share E_r)
    rv_sequence: tuple[int, ...] = (0,)   # HARQ IR transmissions
    n_iters: int = 6
    mode: str = "maxlog"
    ext_scale: float | None = None
    siso: str = "pallas"
    io_dtype: str = "float32"
    nii: bool = False
    window: int = 0
    min_tb_errors: int = 20
    max_tbs: int = 20_000
    seed: int = 0
    steps_per_check: int = 1

    def seg(self):
        return segment_params(self.A + CRC_LEN)

    @property
    def rate(self) -> float:
        """Info bits per transmitted channel bit (BPSK)."""
        seg = self.seg()
        if self.G:
            n_chan = self.G * len(self.rv_sequence)
        else:
            n_chan = sum(3 * K + 12 for K in seg.sizes)
        return self.A / n_chan


def chunk_layout(seg) -> tuple[list[int], list[int]]:
    """Static data-chunk (offset, length) per code block within the
    CRC-attached TB -- mirrors spec.segmentation.segment (golden
    cross-checked in tests/unit/test_tb.py)."""
    offs, takes = [], []
    s = 0
    for r, K in enumerate(seg.sizes):
        payload = K - (CRC_LEN if seg.C > 1 else 0)
        take = payload - (seg.F if r == 0 else 0)
        offs.append(s)
        takes.append(take)
        s += take
    assert s == seg.B
    return offs, takes


def tb_encode_blocks(tb: jax.Array, seg) -> list[tuple[jax.Array, jax.Array]]:
    """Device-side segmentation + per-block encode of a batch of
    CRC-attached transport blocks (n, seg.B).

    Returns, per code block r, (blk_bits (n, K_r), d_flat (n, 3*K_r+12))
    with filler zeros prepended to block 0 and CRC-24B attached when
    C > 1 (TS 36.212 section 5.1.2-5.1.3)."""
    from ..spec.qpp import qpp_perm
    offs, takes = chunk_layout(seg)
    out = []
    for r, K in enumerate(seg.sizes):
        F = seg.F if r == 0 else 0
        blk = tb[:, offs[r]:offs[r] + takes[r]]
        if F:
            blk = jnp.pad(blk, ((0, 0), (F, 0)))           # filler zeros
        if seg.C > 1:
            blk = chain.crc_attach_batch(blk, CRC24B_POLY)
        d_flat = lte_mux_jax(*chain.turbo_encode(
            blk, qpp_perm(K))).astype(jnp.float32)
        out.append((blk, d_flat))
    return out


def make_tb_step(cfg: TBConfig):
    """Build the fused per-batch TB simulation step:
    (key, esn0_db) -> (bit_errs, tb_errs, crc24a_fails, iters_sum)."""
    seg = cfg.seg()
    C = seg.C
    bucket = max(seg.sizes)
    B_len = seg.B
    Es = per_block_e(cfg.G, C) if cfg.G else (0,) * C
    rvs = cfg.rv_sequence
    offs, takes = chunk_layout(seg)

    # One embedded mixed-K decode for all C blocks x n_tb TBs: row order is
    # block-major (row = r * n_tb + t).
    # Grouped tables (G = distinct block sizes, usually 2): the fast TPU
    # mixed-K form -- see bucketing.grouped_perm_tables.
    pg, ig, gid = grouped_perm_tables(
        [K for K in seg.sizes for _ in range(cfg.n_tb)], bucket)
    group_tables = (jnp.asarray(pg), jnp.asarray(ig), jnp.asarray(gid))
    dcfg = DecoderConfig(
        K=bucket, n_iters=cfg.n_iters, mode=cfg.mode,
        ext_scale=cfg.ext_scale, siso=cfg.siso, io_dtype=cfg.io_dtype,
        nii=cfg.nii, window=cfg.window, early_term="crc",
        crc_poly=CRC24B_POLY if C > 1 else CRC24A_POLY)

    def _one_batch(key: jax.Array, esn0_db: jax.Array):
        kp, kn = jax.random.split(key)
        payload = chain.gen_payload(kp, cfg.n_tb, cfg.A)
        tb = chain.crc_attach_batch(payload, CRC24A_POLY)   # (n_tb, B_len)

        ls_l, lp1_l, lp2_l, t1_l, t2_l = [], [], [], [], []
        for r, ((blk, d_flat), K) in enumerate(
                zip(tb_encode_blocks(tb, seg), seg.sizes)):
            F = seg.F if r == 0 else 0
            kr = jax.random.fold_in(kn, r)
            if cfg.G:
                llr_d = jnp.zeros_like(d_flat)
                for kv, v in zip(jax.random.split(kr, len(rvs)), rvs):
                    tx_bits = rate_match_jax(d_flat, Es[r], v, F=F)
                    x = chain.modulate_bpsk(tx_bits.astype(jnp.int8))
                    y = chain.awgn(kv, x, esn0_db)
                    llr = chain.demap_bpsk(y, esn0_db)
                    llr_d = llr_d + de_rate_match_jax(llr, K, v, F=F)
            else:
                x = chain.modulate_bpsk(d_flat.astype(jnp.int8))
                y = chain.awgn(kr, x, esn0_db)
                llr_d = chain.demap_bpsk(y, esn0_db)
            ls, lp1, lp2, t1, t2 = lte_demux_jax(llr_d)
            if F:
                # Spec fillers are known zeros at the receiver.
                ls = ls.at[:, :F].set(BIG_LLR)
            Fe = bucket - K                       # bucket embedding filler
            ls_l.append(jnp.pad(ls, ((0, 0), (Fe, 0)),
                                constant_values=BIG_LLR))
            lp1_l.append(jnp.pad(lp1, ((0, 0), (Fe, 0))))
            lp2_l.append(jnp.pad(lp2, ((0, 0), (Fe, 0))))
            t1_l.append(t1)
            t2_l.append(t2)

        cat = lambda xs: jnp.concatenate(xs, axis=0)
        hard, iters, _ = turbo_decode(
            cat(ls_l), cat(lp1_l), cat(lp2_l), cat(t1_l), cat(t2_l),
            dcfg, group_tables=group_tables)

        # Reassemble each TB from its blocks' data chunks (static slices).
        parts = []
        for r, K in enumerate(seg.sizes):
            Fe = bucket - K
            lo = Fe + (seg.F if r == 0 else 0)
            rows = hard[r * cfg.n_tb:(r + 1) * cfg.n_tb]
            parts.append(rows[:, lo:lo + takes[r]])
        tb_hat = jnp.concatenate(parts, axis=1)             # (n_tb, B_len)

        err = tb_hat != tb
        bit_errs = jnp.sum(err[:, :cfg.A], dtype=jnp.int32)
        tb_err_mask = jnp.any(err, axis=1)
        # CRC-24A verdict on the reassembled TB (receiver's own oracle).
        from ..decoder.early_term import make_crc_matrix
        G24a = make_crc_matrix(B_len, CRC24A_POLY)
        synd = jnp.dot(tb_hat.astype(jnp.float32), G24a,
                       preferred_element_type=jnp.float32) % 2.0
        crc_fail = jnp.sum(jnp.any(synd != 0.0, axis=1), dtype=jnp.int32)
        return (bit_errs, jnp.sum(tb_err_mask, dtype=jnp.int32), crc_fail,
                jnp.sum(iters, dtype=jnp.int32))

    @jax.jit
    def step(key: jax.Array, esn0_db: jax.Array):
        def body(i, carry):
            key, be, te, cf, it = carry
            key, sub = jax.random.split(key)
            b, t, c, n = _one_batch(sub, esn0_db)
            return key, be + b, te + t, cf + c, it + n

        z = jnp.int32(0)
        _, be, te, cf, it = jax.lax.fori_loop(
            0, cfg.steps_per_check, body, (key, z, z, z, z))
        return be, te, cf, it

    return step


def simulate_tb_point(cfg: TBConfig, ebn0_db: float, step=None) -> dict:
    """Run one Eb/N0 point to the TB-error stopping rule."""
    if step is None:
        step = make_tb_step(cfg)
    esn0 = jnp.float32(ebn0_db + 10 * np.log10(cfg.rate))
    key = jax.random.key(cfg.seed ^ int(round(ebn0_db * 1000)) & 0x7FFFFFFF)
    bit_errs = tb_errs = crc_fails = tbs = iters_sum = 0
    t0 = time.perf_counter()
    while tb_errs < cfg.min_tb_errors and tbs < cfg.max_tbs:
        key, sub = jax.random.split(key)
        be, te, cf, it = step(sub, esn0)
        bit_errs += int(be)
        tb_errs += int(te)
        crc_fails += int(cf)
        iters_sum += int(it)
        tbs += cfg.n_tb * cfg.steps_per_check
    wall = time.perf_counter() - t0
    seg = cfg.seg()
    info_bits = tbs * cfg.A
    n_blocks = tbs * seg.C
    return {
        "config": cfg.name, "A": cfg.A, "C": seg.C,
        "K_plus": seg.K_plus, "K_minus": seg.K_minus, "F": seg.F,
        "G": cfg.G, "rvs": list(cfg.rv_sequence), "mode": cfg.mode,
        "iters_max": cfg.n_iters, "ebn0_db": float(ebn0_db),
        "tbs": tbs, "bits": info_bits,
        "bit_errs": bit_errs, "tb_errs": tb_errs, "crc24a_fails": crc_fails,
        "ber": bit_errs / info_bits if info_bits else 0.0,
        "tbler": tb_errs / tbs if tbs else 0.0,
        "avg_iters": iters_sum / n_blocks if n_blocks else 0.0,
        "wall_s": wall,
        "mbit_per_s": info_bits / wall / 1e6 if wall > 0 else 0.0,
    }


def simulate_tbler(cfg: TBConfig,
                   results_path: str | pathlib.Path | None = None,
                   resume: bool = True, verbose: bool = True) -> list[dict]:
    """Sweep the Eb/N0 grid; resumable via the JSONL results file
    (same torn-record handling as harness.ber.simulate_ber)."""
    done: dict[float, dict] = {}
    path = pathlib.Path(results_path) if results_path else None
    if path and path.exists() and resume:
        text = path.read_text()
        if text and not text.endswith("\n"):
            with path.open("a") as f:
                f.write("\n")
        for line in text.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("config") == cfg.name:
                done[rec["ebn0_db"]] = rec
    step = make_tb_step(cfg)
    out = []
    for ebn0 in cfg.ebn0_db_grid:
        if float(ebn0) in done:
            out.append(done[float(ebn0)])
            if verbose:
                print(f"[{cfg.name}] Eb/N0={ebn0:5.2f} dB  (resumed)")
            continue
        rec = simulate_tb_point(cfg, float(ebn0), step)
        out.append(rec)
        if path:
            with path.open("a") as f:
                f.write(json.dumps(rec) + "\n")
        if verbose:
            print(f"[{cfg.name}] Eb/N0={ebn0:5.2f} dB  BER={rec['ber']:.3e} "
                  f"TBLER={rec['tbler']:.3e} avg_iters={rec['avg_iters']:.2f}"
                  f" {rec['mbit_per_s']:.2f} Mbit/s")
    return out

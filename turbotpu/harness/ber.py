"""Monte-Carlo BER/FER-vs-Eb/N0 simulation harness (SURVEY.md section 4.1).

One fused jitted step per configuration runs the entire
payload -> CRC -> encode -> rate match -> BPSK/QPSK -> AWGN -> demap ->
de-rate-match -> turbo decode -> error count chain on device; the host only
checks stopping conditions between batches (the reference's main.cpp
Monte-Carlo loop, minus the H2D/D2H churn).

Supports checkpoint/resume: completed (config, Eb/N0) points are written to
a JSONL results file and skipped on restart (SURVEY.md section 6).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.turbo import DecoderConfig, turbo_decode
from ..spec.crc import CRC24A_POLY
from ..tx import chain, qam
from ..tx.rate_match_jax import (de_rate_match_jax, lte_demux_jax,
                                 lte_mux_jax, rate_match_jax)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation configuration."""
    name: str = "sim"
    K: int = 40
    B: int = 64                       # codewords per Monte-Carlo batch
    ebn0_db_grid: tuple[float, ...] = (0.0, 0.5, 1.0)
    decoder: DecoderConfig = dataclasses.field(
        default_factory=lambda: DecoderConfig(K=40))
    modulation: str = "bpsk"          # "bpsk" | "qpsk" | "qam16" | "qam64"
    channel: str = "awgn"             # "awgn" | "rayleigh" (flat per-symbol
                                      # Rayleigh fading, perfect CSI at the
                                      # receiver; E[|h|^2]=1 keeps the Eb/N0
                                      # label an AVERAGE-energy statement)
    use_crc: bool = True              # attach CRC-24A inside the payload
    K_mix: tuple[int, ...] = ()       # TRUE mixed block sizes (SURVEY.md
                                      # section 8 hard part 3): each codeword
                                      # i carries K_mix[i % len] info bits,
                                      # is encoded with ITS OWN interleaver
                                      # at its own 3K+12 mother-rate length
                                      # and per-K Eb/N0->Es/N0 conversion,
                                      # then EMBEDDED into the K bucket with
                                      # leading known-zero fillers and
                                      # decoded in ONE jitted call via
                                      # per-codeword permutation tables
                                      # (bucketing.embedded_perm_tables).
                                      # () = homogeneous batch at K.
    E: int = 0                        # rate-matched length (0 = mother rate)
    E_mix: tuple[int, ...] = ()       # per-K_mix rate-matched lengths
                                      # (parallel to K_mix); empty with
                                      # K_mix + E set derives each group's
                                      # E_g proportionally (E * K_g / K),
                                      # preserving the aggregate code rate
                                      # -- the shape of TS 36.212 s5.1.4.3's
                                      # per-code-block E_r split
    rv: int = 0
    rv_sequence: tuple[int, ...] = ()  # HARQ IR: redundancy versions of the
                                       # retransmissions soft-combined at the
                                       # receiver; () = single transmission
                                       # at `rv`.  Requires E > 0.
    min_frame_errors: int = 50
    max_frames: int = 200_000
    seed: int = 0
    steps_per_check: int = 1   # device batches per host stopping-rule check
                               # (amortizes the ~38 ms axon fetch round-trip)

    @property
    def rvs(self) -> tuple[int, ...]:
        return self.rv_sequence if self.rv_sequence else (self.rv,)

    def filler_lengths(self) -> np.ndarray | None:
        """Per-codeword filler counts (B,) for a K_mix batch, else None."""
        if not self.K_mix:
            return None
        if max(self.K_mix) > self.K:
            raise ValueError(f"K_mix {self.K_mix} exceeds bucket K={self.K}")
        ks = np.array([self.K_mix[i % len(self.K_mix)] for i in range(self.B)])
        return (self.K - ks).astype(np.int32)

    @property
    def mean_true_k(self) -> float:
        """Mean non-filler block length (== K when homogeneous)."""
        f = self.filler_lengths()
        return float(self.K - f.mean()) if f is not None else float(self.K)

    @property
    def rate(self) -> float:
        """Information rate in info bits per channel bit, counting EVERY
        transmitted channel bit: HARQ retransmissions and the zero-pad to
        whole modulation symbols (the pad carries symbol energy, so folding
        it in keeps the Eb/N0 label honest for QAM with E % m != 0)."""
        per_tx = self.E if self.E else 3 * self.K + 12
        m = qam.BITS_PER_SYMBOL[self.modulation]
        per_tx = -(-per_tx // m) * m
        return self.K / (per_tx * len(self.rvs))

    def e_mix_resolved(self) -> tuple[int, ...]:
        """Per-K_mix rate-matched lengths; zeros = mother rate."""
        if not self.K_mix:
            return ()
        if self.E_mix:
            if len(self.E_mix) != len(self.K_mix):
                raise ValueError(
                    f"E_mix has {len(self.E_mix)} entries for "
                    f"{len(self.K_mix)} K_mix entries")
            return self.E_mix
        if self.E:
            return tuple(int(round(self.E * k / self.K)) for k in self.K_mix)
        return (0,) * len(self.K_mix)

    def mixed_groups(self) -> list[tuple[tuple[int, int], int]]:
        """Grouped ((K, E), count) for a K_mix batch, ascending.  Codewords
        are generated group-contiguous (the batch is i.i.d., so ordering
        is statistically irrelevant; grouping keeps the tx chain to one
        static shape per distinct (K, E))."""
        from collections import Counter
        es = self.e_mix_resolved()
        c = Counter((self.K_mix[i % len(self.K_mix)],
                     es[i % len(self.K_mix)]) for i in range(self.B))
        return sorted(c.items())


def _ebn0_to_esn0_db(cfg: SimConfig, ebn0_db: float) -> float:
    """Es/N0 = Eb/N0 * rate * bits-per-symbol (unit-energy symbols).

    For a K_mix batch each block size has its own mother-rate K/(3K+12):
    the per-group rate factor is applied inside the step, so this returns
    Eb/N0 adjusted only by bits-per-symbol."""
    bps = qam.BITS_PER_SYMBOL[cfg.modulation]
    if cfg.K_mix:
        return ebn0_db + 10 * np.log10(bps)
    return ebn0_db + 10 * np.log10(cfg.rate * bps)


BIG_LLR = 1e9  # known-zero filler certainty


def make_step(cfg: SimConfig):
    """Build the fused per-batch simulation step: key, esn0_db -> counters."""
    n_payload = cfg.K - 24 if cfg.use_crc else cfg.K
    perm = cfg.decoder.perm()

    if cfg.K_mix:
        import dataclasses as _dc
        from ..decoder.bucketing import grouped_perm_tables
        groups = cfg.mixed_groups()                  # [((K_g, E_g), count)]
        if cfg.rv_sequence and any(e == 0 for (_, e), _ in groups):
            raise ValueError("rv_sequence (HARQ) needs rate matching: every "
                             "K_mix group must resolve a nonzero E")
        Ks_g = np.concatenate(
            [[k] * n for (k, _), n in groups]).astype(np.int32)
        F_arr = (cfg.K - Ks_g).astype(np.int32)        # grouped row order
        # Grouped tables: G shared row-gather permutations + per-codeword
        # group ids -- the fast TPU mixed-K form (the per-codeword
        # take_along_axis path measured ~345x slower on-chip,
        # experiments/k_sweep.json round 5).
        pg, ig, gid = grouped_perm_tables(list(Ks_g), cfg.K,
                                          cfg.decoder.interleaver)
        group_tables = (jnp.asarray(pg), jnp.asarray(ig), jnp.asarray(gid))
        group_perms = {k: _dc.replace(cfg.decoder, K=k).perm()
                       for (k, _), _ in groups}

    @jax.jit
    def step(key: jax.Array, esn0_db: jax.Array):
        one = _one_batch_mixed if cfg.K_mix else _one_batch

        def body(i, carry):
            key, be, fe, it, mx = carry
            key, sub = jax.random.split(key)
            b, f, t, m = one(sub, esn0_db)
            return key, be + b, fe + f, it + t, mx + m

        z = jnp.int32(0)
        _, be, fe, it, mx = jax.lax.fori_loop(
            0, cfg.steps_per_check, body, (key, z, z, z, z))
        return be, fe, it, mx

    fading = cfg.channel == "rayleigh"
    if cfg.channel not in ("awgn", "rayleigh"):
        raise ValueError(f"unknown channel {cfg.channel!r}")

    # Wire order: UMTS codewords ride the TS 25.212 section 4.2.3.1 per-bit
    # interlace, LTE the TS 36.212 d-streams.  (Over a memoryless channel
    # any fixed bit permutation is statistically equivalent; this makes
    # the transmitted order WIRE-EXACT per spec rather than equivalent.)
    umts_wire = cfg.decoder.interleaver == "umts"
    if umts_wire and (cfg.E or cfg.E_mix):
        raise ValueError("rate matching (TS 36.212) is defined on LTE "
                         "d-streams; UMTS wire order is mother-rate only")
    from ..tx.rate_match_jax import umts_demux_jax, umts_mux_jax
    mux = umts_mux_jax if umts_wire else lte_mux_jax
    demux = umts_demux_jax if umts_wire else lte_demux_jax

    def _channel(kn: jax.Array, tx_bits: jax.Array, esn0_db: jax.Array):
        """modulate -> channel -> demap; pads to whole symbols for m > 1."""
        if cfg.modulation == "qpsk":
            nb = tx_bits.shape[1]
            pad = (-nb) % 2
            xb = jnp.pad(tx_bits.astype(jnp.int8), ((0, 0), (0, pad)))
            x = chain.modulate_qpsk(xb)
            if fading:
                z, a = chain.rayleigh_fading(kn, x, esn0_db)
                return chain.demap_qpsk_csi(z, a, esn0_db)[:, :nb]
            y = chain.awgn_complex(kn, x, esn0_db)
            return chain.demap_qpsk(y, esn0_db)[:, :nb]
        if cfg.modulation in ("qam16", "qam64"):
            m = qam.BITS_PER_SYMBOL[cfg.modulation]
            nb = tx_bits.shape[1]
            pad = (-nb) % m  # zero-pad to a whole symbol; drop after demap
            xb = jnp.pad(tx_bits.astype(jnp.int8), ((0, 0), (0, pad)))
            x = qam.modulate_qam(xb, m)
            if fading:
                z, a = chain.rayleigh_fading(kn, x, esn0_db)
                return qam.demap_qam(z, esn0_db, m, amp=a)[:, :nb]
            y = chain.awgn_complex(kn, x, esn0_db)
            return qam.demap_qam(y, esn0_db, m)[:, :nb]
        x = chain.modulate_bpsk(tx_bits.astype(jnp.int8))
        if fading:
            z, a = chain.rayleigh_fading(kn, x, esn0_db)
            return chain.demap_bpsk_csi(z, a, esn0_db)
        y = chain.awgn(kn, x, esn0_db)
        return chain.demap_bpsk(y, esn0_db)

    def _gen_batch(key: jax.Array, esn0_db: jax.Array):
        """Generation half of the fused step: payload -> ... -> demuxed
        decoder LLR streams.  Split out so the compaction sweep mode can
        re-batch CRC failures host-side between super-batches while
        seeing EXACTLY the frames the fused step would see (SURVEY
        section 8 hard part 6; round-4 VERDICT missing 3)."""
        kp, kn = jax.random.split(key)
        payload = chain.gen_payload(kp, cfg.B, n_payload)
        bits = (chain.crc_attach_batch(payload, cfg.decoder.crc_poly)
                if cfg.use_crc else payload)
        enc = chain.turbo_encode(bits, perm)
        d_flat = mux(*enc).astype(jnp.float32)
        if cfg.E:
            # One or more (HARQ IR) transmissions of the circular buffer;
            # each rv window sees fresh noise, the receiver scatter-adds
            # all de-rate-matched LLRs (soft combining).
            llr_d = jnp.zeros_like(d_flat)
            for kv, v in zip(jax.random.split(kn, len(cfg.rvs)), cfg.rvs):
                tx_bits = rate_match_jax(d_flat, cfg.E, v)
                llr = _channel(kv, tx_bits, esn0_db)
                llr_d = llr_d + de_rate_match_jax(llr, cfg.K, v)
        else:
            llr_d = _channel(kn, d_flat, esn0_db)
        return demux(llr_d), bits

    def _one_batch(key: jax.Array, esn0_db: jax.Array):
        streams, bits = _gen_batch(key, esn0_db)
        hard, iters, _ = turbo_decode(*streams, cfg.decoder)
        err = hard != bits
        bit_errs = jnp.sum(err, dtype=jnp.int32)
        frame_err_mask = jnp.any(err, axis=1)
        frame_errs = jnp.sum(frame_err_mask, dtype=jnp.int32)
        return (bit_errs, frame_errs, jnp.sum(iters, dtype=jnp.int32),
                jnp.max(iters).astype(jnp.int32))

    def _one_batch_mixed(key: jax.Array, esn0_db: jax.Array):
        """TRUE mixed-K batch: each group is encoded with its own
        interleaver, rate-matched to its own E_g (or transmitted at its
        3K+12 mother rate), sent at its per-group rate-adjusted Es/N0,
        then embedded into the K bucket with leading known-filler LLRs
        (+BIG systematic / 0 parity) and decoded in ONE call through
        per-codeword permutation tables."""
        m_bps = qam.BITS_PER_SYMBOL[cfg.modulation]
        ls_l, lp1_l, lp2_l, t1_l, t2_l, bits_l = [], [], [], [], [], []
        for (K_g, E_g), n_g in groups:
            kp, kn = jax.random.split(
                jax.random.fold_in(key, K_g * 8 + E_g % 8))
            np_g = K_g - 24 if cfg.use_crc else K_g
            payload = chain.gen_payload(kp, n_g, np_g)
            bits = (chain.crc_attach_batch(payload, cfg.decoder.crc_poly)
                    if cfg.use_crc else payload)
            d_flat = mux(*chain.turbo_encode(
                bits, group_perms[K_g])).astype(jnp.float32)
            # Per-group rate K_g / channel bits, counting the zero-pad to
            # whole modulation symbols and HARQ retransmissions -- the
            # honest per-block Eb/N0 -> Es/N0 conversion, mirroring
            # SimConfig.rate (esn0_db here carries only the
            # bits-per-symbol factor, see _ebn0_to_esn0_db).
            per_tx = E_g if E_g else 3 * K_g + 12
            per_tx = -(-per_tx // m_bps) * m_bps
            esn0_g = esn0_db + 10 * np.log10(
                K_g / (per_tx * (len(cfg.rvs) if E_g else 1)))
            if E_g:
                llr_d = jnp.zeros_like(d_flat)
                for kv, v in zip(jax.random.split(kn, len(cfg.rvs)),
                                 cfg.rvs):
                    tx_bits = rate_match_jax(d_flat, E_g, v)
                    llr = _channel(kv, tx_bits, esn0_g)
                    llr_d = llr_d + de_rate_match_jax(llr, K_g, v)
            else:
                llr_d = _channel(kn, d_flat, esn0_g)
            ls, lp1, lp2, t1, t2 = demux(llr_d)
            Fg = cfg.K - K_g
            ls_l.append(jnp.pad(ls, ((0, 0), (Fg, 0)),
                                constant_values=BIG_LLR))
            lp1_l.append(jnp.pad(lp1, ((0, 0), (Fg, 0))))
            lp2_l.append(jnp.pad(lp2, ((0, 0), (Fg, 0))))
            t1_l.append(t1)
            t2_l.append(t2)
            bits_l.append(jnp.pad(bits, ((0, 0), (Fg, 0))))
        cat = lambda xs: jnp.concatenate(xs, axis=0)
        hard, iters, _ = turbo_decode(
            cat(ls_l), cat(lp1_l), cat(lp2_l), cat(t1_l), cat(t2_l),
            cfg.decoder, group_tables=group_tables)
        err = (hard != cat(bits_l)) & (
            jnp.arange(cfg.K) >= jnp.asarray(F_arr)[:, None])
        bit_errs = jnp.sum(err, dtype=jnp.int32)
        frame_errs = jnp.sum(jnp.any(err, axis=1), dtype=jnp.int32)
        return (bit_errs, frame_errs, jnp.sum(iters, dtype=jnp.int32),
                jnp.max(iters).astype(jnp.int32))

    if not cfg.K_mix:
        # The compaction sweep mode decodes host-gathered re-batches, so
        # it needs the raw streams; mixed-K batches ride per-codeword
        # embedded tables that decode_compacted's plain turbo_decode call
        # does not thread, so compaction stays homogeneous-only.
        step.gen = jax.jit(_gen_batch)
    return step


def _point_key(cfg: SimConfig, ebn0_db: float) -> jax.Array:
    return jax.random.key(cfg.seed ^ int(round(ebn0_db * 1000)) & 0x7FFFFFFF)


def _point_record(cfg: SimConfig, ebn0_db: float, frames: int, bit_errs: int,
                  frame_errs: int, iters_sum: int, wall: float) -> dict:
    # Fillers of a mixed-K batch are known bits, not information.
    info_bits = int(round(frames * cfg.mean_true_k))
    return {
        "config": cfg.name, "K": cfg.K, "mode": cfg.decoder.mode,
        **({"k_mix": list(cfg.K_mix)} if cfg.K_mix else {}),
        "iters_max": cfg.decoder.n_iters, "ebn0_db": float(ebn0_db),
        "frames": frames, "bits": info_bits,
        "bit_errs": bit_errs, "frame_errs": frame_errs,
        "ber": bit_errs / info_bits if info_bits else 0.0,
        "fer": frame_errs / frames if frames else 0.0,
        "avg_iters": iters_sum / frames if frames else 0.0,
        "wall_s": wall,
        "mbit_per_s": info_bits / wall / 1e6 if wall > 0 else 0.0,
    }


def simulate_point(cfg: SimConfig, ebn0_db: float, step=None,
                   compact_stage1: int = 0,
                   compact_flush: int = 0) -> dict:
    """Run one Eb/N0 grid point to the stopping rule; returns a record.

    compact_stage1 > 0 switches to two-stage convergence compaction
    (host-side re-batching of CRC failures between super-batches) with
    the given stage-1 iteration cap -- same frames, same counts (the
    compaction contract is bit-identical hard decisions), plus device
    -work fields.  compact_flush > 0 additionally accumulates failures
    ACROSS check groups up to that many retained super-batches before
    flushing (denser stage-2 fill; see _simulate_point_compacted)."""
    if compact_stage1:
        return _simulate_point_compacted(cfg, ebn0_db, step, compact_stage1,
                                         compact_flush)
    if step is None:
        step = make_step(cfg)
    esn0 = jnp.float32(_ebn0_to_esn0_db(cfg, ebn0_db))
    key = _point_key(cfg, ebn0_db)
    bit_errs = frame_errs = frames = iters_sum = iter_batches = 0
    t0 = time.perf_counter()
    while frame_errs < cfg.min_frame_errors and frames < cfg.max_frames:
        key, sub = jax.random.split(key)
        be, fe, it, mx = step(sub, esn0)
        bit_errs += int(be)
        frame_errs += int(fe)
        iters_sum += int(it)
        iter_batches += int(mx)
        frames += cfg.B * cfg.steps_per_check
    wall = time.perf_counter() - t0
    rec = _point_record(cfg, ebn0_db, frames, bit_errs, frame_errs,
                        iters_sum, wall)
    # Realized device work: the batched while_loop runs until its SLOWEST
    # frame converges, so each batch costs max(iters) batch-iterations.
    # This is the number compaction's iter_batches field compares against.
    rec["iter_batches"] = iter_batches
    return rec


def _simulate_point_compacted(cfg: SimConfig, ebn0_db: float, step,
                              stage1_iters: int,
                              flush_batches: int = 0) -> dict:
    """Compaction sweep mode (SURVEY section 8 hard part 6's named
    integration point): generate the SAME super-batches as the fused
    step (identical key-split tree), stage-1 decode them at a small cap,
    re-batch the CRC failures into dense batches host-side, and finish
    those at the full cap.  Counts are bit-identical to the non-compact
    sweep on the same seeds (the decode_compacted equivalence contract,
    tests/unit/test_compaction.py + test_ber_compact_sweep.py).

    flush_batches = 0 (default): failures re-batch within each check
    group, so the stopping rule sees complete counts at every check --
    exact stopping parity with the non-compact sweep.
    flush_batches = R > 0: failures ACCUMULATE across check groups
    (SURVEY's "across all super-batches") and flush only when a dense
    full-size batch is ready (deferred >= B) or R super-batches are
    retained on device (the memory bound) -- much denser stage-2 fill,
    so more device work is saved at low deferral rates.  Between
    flushes the stopping rule sees stage-1-converged errors only, so a
    stopping-rule run may take extra frames (never fewer); with a
    fixed frame budget (min_frame_errors pinned high) the counts are
    exactly the non-compact sweep's."""
    from .compact import _stage_fns
    if cfg.K_mix:
        raise ValueError("compaction re-batches through plain turbo_decode; "
                         "mixed-K batches (per-codeword embedded tables) are "
                         "not supported -- run without --compact")
    if cfg.decoder.early_term != "crc":
        raise ValueError("convergence compaction needs early_term='crc'")
    if step is None:
        step = make_step(cfg)
    esn0 = jnp.float32(_ebn0_to_esn0_db(cfg, ebn0_db))
    key = _point_key(cfg, ebn0_db)
    B = cfg.B
    bit_errs = frame_errs = frames = iters_sum = 0
    units = n2_total = deferred_total = 0

    cfg1 = dataclasses.replace(cfg.decoder, n_iters=stage1_iters)
    stage1, stage2 = _stage_fns(cfg1, cfg.decoder)
    R = max(flush_batches, 0)
    pending: list[tuple] = []      # (inputs5, bits, deferred row indices)

    def flush():
        """Gather every pending deferred frame into dense full-cap
        batches.  The flat stage-2 operand is padded to a FIXED R*B rows
        (repeating the first pending batch) so stage2 compiles once."""
        nonlocal bit_errs, frame_errs, iters_sum, units, n2_total
        live = [p for p in pending if len(p[2])]
        pending.clear()
        if not live:
            return
        # Fixed flat capacity (R batches, or the check-group size in the
        # default mode) so stage2 sees ONE operand shape across flushes.
        cap = R if R else cfg.steps_per_check
        padded = live + [live[0]] * (cap - len(live))
        flat_inputs = tuple(
            jnp.concatenate([p[0][k] for p in padded]) for k in range(5))
        flat_bits = jnp.concatenate([p[1] for p in padded])
        dev = np.concatenate(
            [np.asarray(p[2], np.int64) + i * B
             for i, p in enumerate(live)]).astype(np.int32)
        n2 = -(-len(dev) // B)
        idx_all = np.concatenate([dev, np.zeros(n2 * B - len(dev),
                                                np.int32)])
        val_all = np.concatenate([np.ones(len(dev), bool),
                                  np.zeros(n2 * B - len(dev), bool)])
        for b in range(n2):
            p2, _ = stage2(flat_inputs,
                           jnp.asarray(idx_all[b * B:(b + 1) * B]),
                           jnp.asarray(val_all[b * B:(b + 1) * B]),
                           flat_bits)
            cnt = np.asarray(p2).view(np.int32)
            bit_errs += int(cnt[0])
            frame_errs += int(cnt[1])
            iters_sum += int(cnt[2])
        units += n2 * cfg.decoder.n_iters
        n2_total += n2

    t0 = time.perf_counter()
    while frame_errs < cfg.min_frame_errors and frames < cfg.max_frames:
        key, sub = jax.random.split(key)
        # Replicate the fused step's fori_loop key chain exactly:
        # carry = sub; each sub-step splits (carry, batch_key) off it.
        carry = sub
        for _ in range(cfg.steps_per_check):
            carry, bk = jax.random.split(carry)
            streams, bits = step.gen(bk, esn0)
            packed, _ = stage1(streams, bits)
            p = np.asarray(packed)             # ONE fetch per super-batch
            cnt = p[:3].view(np.int32)
            bit_errs += int(cnt[0])
            frame_errs += int(cnt[1])
            iters_sum += int(cnt[2])
            rows = np.nonzero(p[3:] > 0.5)[0]
            deferred_total += len(rows)
            if len(rows):
                pending.append((streams, bits, rows))
            units += stage1_iters
            if (sum(len(p[2]) for p in pending) >= B
                    or (R and len(pending) >= R)):
                flush()
        if not R:
            flush()                # per-check exactness (default)
        frames += cfg.B * cfg.steps_per_check
    flush()
    wall = time.perf_counter() - t0
    rec = _point_record(cfg, ebn0_db, frames, bit_errs, frame_errs,
                        iters_sum, wall)
    rec.update({
        "compact_stage1": stage1_iters,
        **({"compact_flush_batches": R} if R else {}),
        "iter_batches": units,
        "n_stage2_batches": n2_total,
        "deferred_frac": round(deferred_total / frames, 4) if frames else 0.0,
        # avg_iters here sums stage-1 converged iters + stage-2 realized
        # iters -- per-frame device iterations, not the single-stage
        # while_loop's (which the non-compact record reports).
    })
    return rec


def simulate_ber(cfg: SimConfig, results_path: str | pathlib.Path | None = None,
                 resume: bool = True, verbose: bool = True,
                 compact_stage1: int = 0, compact_flush: int = 0
                 ) -> list[dict]:
    """Sweep the Eb/N0 grid; resumable via the JSONL results file."""
    done: dict[float, dict] = {}
    path = pathlib.Path(results_path) if results_path else None
    if path and path.exists() and resume:
        text = path.read_text()
        if text and not text.endswith("\n"):
            # Terminate a record torn by a killed writer so appended
            # records land on their own line.
            with path.open("a") as f:
                f.write("\n")
        for line in text.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn trailing line from a killed writer
            # A compacted point only resumes a compacted record (and vice
            # versa): the counts match, but the device-work fields do not.
            if (rec.get("config") == cfg.name
                    and rec.get("compact_stage1", 0) == compact_stage1):
                done[rec["ebn0_db"]] = rec
    step = make_step(cfg)
    out = []
    for ebn0 in cfg.ebn0_db_grid:
        if float(ebn0) in done:
            out.append(done[float(ebn0)])
            if verbose:
                print(f"[{cfg.name}] Eb/N0={ebn0:5.2f} dB  (resumed)")
            continue
        rec = simulate_point(cfg, float(ebn0), step,
                             compact_stage1=compact_stage1,
                             compact_flush=compact_flush)
        out.append(rec)
        if path:
            with path.open("a") as f:
                f.write(json.dumps(rec) + "\n")
        if verbose:
            print(f"[{cfg.name}] Eb/N0={ebn0:5.2f} dB  BER={rec['ber']:.3e} "
                  f"FER={rec['fer']:.3e} avg_iters={rec['avg_iters']:.2f} "
                  f"{rec['mbit_per_s']:.2f} Mbit/s")
    return out

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
    use_crc: bool = True              # attach CRC-24A inside the payload
    K_mix: tuple[int, ...] = ()       # mixed true block sizes (pad-to-bucket,
                                      # SURVEY.md section 8 hard part 3): each
                                      # codeword i carries K_mix[i % len] info
                                      # bits; blocks are ENCODED at the bucket
                                      # ceiling K with K - K_mix[i] leading
                                      # known-zero fillers and decoded in ONE
                                      # jitted call with per-codeword masks.
                                      # () = homogeneous batch at K.
    E: int = 0                        # rate-matched length (0 = mother rate)
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


def _ebn0_to_esn0_db(cfg: SimConfig, ebn0_db: float) -> float:
    """Es/N0 = Eb/N0 * rate * bits-per-symbol (unit-energy symbols)."""
    bps = qam.BITS_PER_SYMBOL[cfg.modulation]
    return ebn0_db + 10 * np.log10(cfg.rate * bps)


BIG_LLR = 1e9  # known-zero filler certainty


def make_step(cfg: SimConfig):
    """Build the fused per-batch simulation step: key, esn0_db -> counters."""
    n_payload = cfg.K - 24 if cfg.use_crc else cfg.K
    perm = cfg.decoder.perm()
    F = cfg.filler_lengths()  # (B,) or None; baked in as a device constant

    @jax.jit
    def step(key: jax.Array, esn0_db: jax.Array):
        def one(key):
            be, fe, it = _one_batch(key, esn0_db)
            return be, fe, it

        def body(i, carry):
            key, be, fe, it = carry
            key, sub = jax.random.split(key)
            b, f, t = one(sub)
            return key, be + b, fe + f, it + t

        z = jnp.int32(0)
        _, be, fe, it = jax.lax.fori_loop(
            0, cfg.steps_per_check, body, (key, z, z, z))
        return be, fe, it

    def _channel(kn: jax.Array, tx_bits: jax.Array, esn0_db: jax.Array):
        """modulate -> AWGN -> demap; pads to whole symbols for m > 1."""
        if cfg.modulation == "qpsk":
            nb = tx_bits.shape[1]
            pad = (-nb) % 2
            xb = jnp.pad(tx_bits.astype(jnp.int8), ((0, 0), (0, pad)))
            x = chain.modulate_qpsk(xb)
            y = chain.awgn_complex(kn, x, esn0_db)
            return chain.demap_qpsk(y, esn0_db)[:, :nb]
        if cfg.modulation in ("qam16", "qam64"):
            m = qam.BITS_PER_SYMBOL[cfg.modulation]
            nb = tx_bits.shape[1]
            pad = (-nb) % m  # zero-pad to a whole symbol; drop after demap
            xb = jnp.pad(tx_bits.astype(jnp.int8), ((0, 0), (0, pad)))
            x = qam.modulate_qam(xb, m)
            y = chain.awgn_complex(kn, x, esn0_db)
            return qam.demap_qam(y, esn0_db, m)[:, :nb]
        x = chain.modulate_bpsk(tx_bits.astype(jnp.int8))
        y = chain.awgn(kn, x, esn0_db)
        return chain.demap_bpsk(y, esn0_db)

    def _one_batch(key: jax.Array, esn0_db: jax.Array):
        kp, kn = jax.random.split(key)
        payload = chain.gen_payload(kp, cfg.B, n_payload)
        if F is not None:
            # Pad-to-bucket: codeword i's first F[i] bits are known-zero
            # fillers (inside the CRC like LTE segmentation fillers).
            fill = jnp.asarray(F)[:, None]
            payload = payload * (jnp.arange(n_payload) >= fill).astype(
                payload.dtype)
        bits = (chain.crc_attach_batch(payload, cfg.decoder.crc_poly)
                if cfg.use_crc else payload)
        enc = chain.turbo_encode(bits, perm)
        d_flat = lte_mux_jax(*enc).astype(jnp.float32)
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
        parts = lte_demux_jax(llr_d)
        if F is not None:
            # The receiver knows the fillers are zero: certainty-clamp
            # their systematic LLRs before decoding.
            ls, lp1, lp2, t1, t2 = parts
            fill = jnp.asarray(F)[:, None]
            ls = jnp.where(jnp.arange(cfg.K) < fill, BIG_LLR, ls)
            parts = (ls, lp1, lp2, t1, t2)
        hard, iters, _ = turbo_decode(*parts, cfg.decoder)
        err = hard != bits
        if F is not None:
            err = err & (jnp.arange(cfg.K) >= jnp.asarray(F)[:, None])
        bit_errs = jnp.sum(err, dtype=jnp.int32)
        frame_err_mask = jnp.any(err, axis=1)
        frame_errs = jnp.sum(frame_err_mask, dtype=jnp.int32)
        return bit_errs, frame_errs, jnp.sum(iters, dtype=jnp.int32)

    return step


def simulate_point(cfg: SimConfig, ebn0_db: float, step=None) -> dict:
    """Run one Eb/N0 grid point to the stopping rule; returns a record."""
    if step is None:
        step = make_step(cfg)
    esn0 = jnp.float32(_ebn0_to_esn0_db(cfg, ebn0_db))
    key = jax.random.key(cfg.seed ^ int(round(ebn0_db * 1000)) & 0x7FFFFFFF)
    bit_errs = frame_errs = frames = iters_sum = 0
    t0 = time.perf_counter()
    while frame_errs < cfg.min_frame_errors and frames < cfg.max_frames:
        key, sub = jax.random.split(key)
        be, fe, it = step(sub, esn0)
        bit_errs += int(be)
        frame_errs += int(fe)
        iters_sum += int(it)
        frames += cfg.B * cfg.steps_per_check
    wall = time.perf_counter() - t0
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


def simulate_ber(cfg: SimConfig, results_path: str | pathlib.Path | None = None,
                 resume: bool = True, verbose: bool = True) -> list[dict]:
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
            if rec.get("config") == cfg.name:
                done[rec["ebn0_db"]] = rec
    step = make_step(cfg)
    out = []
    for ebn0 in cfg.ebn0_db_grid:
        if float(ebn0) in done:
            out.append(done[float(ebn0)])
            if verbose:
                print(f"[{cfg.name}] Eb/N0={ebn0:5.2f} dB  (resumed)")
            continue
        rec = simulate_point(cfg, float(ebn0), step)
        out.append(rec)
        if path:
            with path.open("a") as f:
                f.write(json.dumps(rec) + "\n")
        if verbose:
            print(f"[{cfg.name}] Eb/N0={ebn0:5.2f} dB  BER={rec['ber']:.3e} "
                  f"FER={rec['fer']:.3e} avg_iters={rec['avg_iters']:.2f} "
                  f"{rec['mbit_per_s']:.2f} Mbit/s")
    return out

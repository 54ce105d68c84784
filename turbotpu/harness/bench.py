"""Throughput benchmark harness (SURVEY.md section 3, component 30).

Measures decoded information Mbit/s/chip with compile excluded, matching
the BASELINE.json primary metric: decoded Mbit/s/chip at 6 iterations,
K=6144.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.turbo import DecoderConfig, turbo_decode
from ..golden import numpy_ref as npr
from ..spec.qpp import qpp_perm


def make_decode_inputs(K: int, B: int, seed: int = 0, ebn0_db: float = 1.0,
                       with_crc: bool = False, n_unique: int = 64):
    """Host-side: one noisy encoded batch.

    Encoding cost is bounded by tiling n_unique distinct payloads to B,
    but noise is drawn AFTER tiling, so every row is an i.i.d. channel
    realization (round-2 VERDICT weak 1: noise-before-tiling made the
    early-termination benchmark's while_loop exit on the max over only
    n_unique distinct frames, inflating "effective throughput"; the
    convergence tail of B independent frames is what that number means).
    with_crc attaches CRC-24A so CRC early termination has real frames."""
    from ..spec.crc import CRC24A_POLY, crc_attach
    rng = np.random.default_rng(seed)
    n_base = min(B, n_unique)
    parts = [[] for _ in range(5)]
    perm = qpp_perm(K)
    for _ in range(n_base):
        if with_crc:
            bits = crc_attach(rng.integers(0, 2, K - 24).astype(np.int8),
                              CRC24A_POLY)
        else:
            bits = rng.integers(0, 2, K).astype(np.int8)
        for i, x in enumerate(npr.turbo_encode(bits, perm)):
            parts[i].append(x)
    # Mother-rate (1/3) by construction: this helper only ever emits the
    # full 3K+12 streams (never rate-matched batches), so the fixed /3 is
    # exact here; the BER harness derives rate from its SimConfig instead.
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    reps = -(-B // n_base)
    out = []
    for p in parts:
        a = np.tile(np.stack(p).astype(np.float64), (reps, 1))[:B]
        y = (1 - 2 * a) + sigma * rng.normal(size=a.shape)
        out.append(jnp.asarray(2 * y / sigma ** 2, jnp.float32))
    return tuple(out)


def measure_roundtrip() -> float:
    """Host<->device round-trip floor (large under the axon TPU tunnel:
    ~35-40 ms per individually-fetched result).  Timing must subtract it."""
    t = jax.jit(lambda x: x + 1.0)
    float(t(jnp.float32(0)))
    floor = min(_timed(lambda: float(t(jnp.float32(i)))) for i in range(5))
    return floor


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# Rep-scaling discipline (round-4 VERDICT missing item 1): subtracting a
# ~25-70 ms tunnel floor from a fixed-rep wall of comparable size turns
# floor jitter into +-10% cross-session error on the primary metric (the
# round-4 driver captured 3401.6 against a committed 3021-3110 band).
# Fix: grow reps until chained compute >= REP_SCALE_FACTOR x the floor
# before subtracting, exactly as experiments/cost_breakdown._timeit has
# done since round 4.  The fori_loop bound below is DYNAMIC (a traced
# int32), so rescaling reps reuses the one compiled chain.
REP_SCALE_FACTOR = 5.0
REP_SCALE_CAP = 4096


def measure_chained(run, probe_reps: int, floor: float,
                    n_repeat: int = 3) -> tuple[float, int]:
    """Time `run(reps)` (one host fetch of `reps` chained device calls),
    scaling reps until compute >= REP_SCALE_FACTOR x floor, then return
    (seconds per rep over the best of n_repeat passes, reps used)."""
    probe_reps = max(probe_reps, 1)
    wall = min(_timed(lambda: run(probe_reps)) for _ in range(2)) - floor
    target = max(REP_SCALE_FACTOR * floor, 0.2)
    reps = probe_reps
    if wall < target:
        per = max(wall, 1e-4) / probe_reps
        reps = min(int(np.ceil(target / per)), REP_SCALE_CAP)
    wall = min(_timed(lambda: run(reps)) for _ in range(n_repeat)) - floor
    return max(wall, 1e-9) / reps, reps


def bench_decode(cfg: DecoderConfig, B: int, n_timed: int = 16,
                 n_warmup: int = 1, seed: int = 0,
                 ebn0_db: float = 1.0) -> dict:
    """Time turbo_decode on one chip with the round-trip floor amortized
    AND subtracted: chained on-device decodes fetched as one scalar, with
    the chain length scaled until compute dominates the floor 5x
    (measure_chained; n_timed is only the initial probe length).

    The chain feeds a zero-valued function of each decode's output into the
    next decode's input, so no call can be elided or reordered.  With
    cfg.early_term enabled, inputs carry CRC frames at ebn0_db and the
    measurement is EFFECTIVE throughput at that operating point (early
    exit included) rather than fixed-iteration throughput."""
    inputs = make_decode_inputs(cfg.K, B, seed, ebn0_db,
                                with_crc=cfg.early_term == "crc")
    inputs = jax.device_put(inputs)

    @jax.jit
    def run(inputs, reps):
        def body(i, carry):
            (ls, lp1, lp2, t1, t2), acc = carry
            hard, iters, L = turbo_decode(ls, lp1, lp2, t1, t2, cfg)
            s = L[0, 0] + iters[0].astype(L.dtype)
            return (ls + s * 0.0, lp1, lp2, t1, t2), acc + s
        carry, acc = jax.lax.fori_loop(0, reps, body, (inputs, jnp.float32(0)))
        return acc

    floor = measure_roundtrip()
    for _ in range(max(n_warmup, 1)):
        float(run(inputs, jnp.int32(n_timed)))
    wall, reps_used = measure_chained(
        lambda r: float(run(inputs, jnp.int32(r))), n_timed, floor)
    info_bits = B * cfg.K
    return {
        "K": cfg.K, "B": B, "iters": cfg.n_iters, "mode": cfg.mode,
        "siso": cfg.siso, "io_dtype": cfg.io_dtype,
        "early_term": cfg.early_term,
        **({"ebn0_db": ebn0_db} if cfg.early_term != "none" else {}),
        "wall_s_per_batch": wall, "timed_reps": reps_used,
        "mbit_per_s": info_bits / wall / 1e6,
    }

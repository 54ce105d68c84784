"""Throughput benchmark harness (SURVEY.md section 3, component 30).

Measures decoded information Mbit/s/chip with compile excluded, matching
the BASELINE.json primary metric: decoded Mbit/s/chip at 6 iterations,
K=6144.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.turbo import DecoderConfig, turbo_decode
from ..golden import numpy_ref as npr
from ..spec.qpp import qpp_perm


def make_decode_inputs(K: int, B: int, seed: int = 0, ebn0_db: float = 1.0):
    """Host-side: one noisy encoded batch (tiled from a few codewords)."""
    rng = np.random.default_rng(seed)
    n_base = min(B, 4)
    parts = [[] for _ in range(5)]
    perm = qpp_perm(K)
    for _ in range(n_base):
        bits = rng.integers(0, 2, K).astype(np.int8)
        for i, x in enumerate(npr.turbo_encode(bits, perm)):
            parts[i].append(x)
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    out = []
    for p in parts:
        a = np.stack(p).astype(np.float64)
        y = (1 - 2 * a) + sigma * rng.normal(size=a.shape)
        llr = 2 * y / sigma ** 2
        reps = -(-B // n_base)
        out.append(jnp.asarray(np.tile(llr, (reps, 1))[:B], jnp.float32))
    return tuple(out)


def bench_decode(cfg: DecoderConfig, B: int, n_timed: int = 10,
                 n_warmup: int = 2, seed: int = 0) -> dict:
    """Time turbo_decode on one chip. Returns metrics dict."""
    inputs = make_decode_inputs(cfg.K, B, seed)
    inputs = jax.device_put(inputs)

    @jax.jit
    def reduce_out(hard, iters, L):
        # Tiny scalar fingerprint: fetching it forces full execution.  Under
        # the axon TPU bridge, block_until_ready returns before the remote
        # computation finishes, so timing MUST gate on a host fetch.
        return L.sum() + iters.sum().astype(L.dtype)

    for _ in range(n_warmup):
        hard, iters, L = turbo_decode(*inputs, cfg)
    float(reduce_out(hard, iters, L))
    t0 = time.perf_counter()
    acc = None
    for _ in range(n_timed):
        hard, iters, L = turbo_decode(*inputs, cfg)
        x = reduce_out(hard, iters, L)
        acc = x if acc is None else acc + x
    float(acc)
    wall = (time.perf_counter() - t0) / n_timed
    info_bits = B * cfg.K
    return {
        "K": cfg.K, "B": B, "iters": cfg.n_iters, "mode": cfg.mode,
        "siso": cfg.siso, "wall_s_per_batch": wall,
        "mbit_per_s": info_bits / wall / 1e6,
    }

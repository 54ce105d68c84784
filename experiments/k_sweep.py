#!/usr/bin/env python
"""Throughput generality: K sweep + TRUE mixed-K embedded-decode cost
(round-4 VERDICT next-round item 3).

Every committed perf artifact so far is K=6144/B=1024.  The framework
decodes 188 LTE sizes plus arbitrary UMTS sizes, and the C3 production
path (per-codeword embedded take_along_axis gathers,
decoder/turbo_cells.py) has a cost that was never quantified.  Two
artifacts in one JSON:

1. **K sweep**: bench_decode (rep-scaled chained timing) at
   K in {512, 1024, 2048, 4096, 6144}, flagship mode (max-log, 6 iters,
   fused Pallas kernel, bf16 I/O, NII).  Window: 256 where K is a
   multiple of it (the flagship geometry), else auto (window_len) so
   small K does not pay multi-hundred-step pad tails.
2. **Mixed-K embedded cost**: the C3 bucket (UMTS, K=5114) decoded as a
   TRUE mixed batch (K in {320, 1280, 5114} tiled over B, per-codeword
   embedded tables) vs the SAME bucket decoded homogeneous (shared
   table), fixed 6 iterations, B=1024 (whole cells -- C3's own B=128
   pads to one 1024-row cell, so its per-bit cost is the B=1024 number
   x8; recorded too).  The ratio is the per-codeword-gather overhead.

Decode values are random LLRs: with early_term='none' the iteration
count is fixed, so throughput is data-independent (the iteration loop
has no data-dependent control flow under jit).

Run ON TPU:  python experiments/k_sweep.py
Writes experiments/k_sweep.json.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench_embedded(K: int, B: int, k_mix, n_iters: int = 6,
                   interleaver: str = "umts", grouped: bool = False) -> dict:
    """Rep-scaled chained timing of turbo_decode with (or without)
    mixed-K embedded tables on synthetic LLRs.

    grouped=False uses the GENERAL per-codeword take_along_axis tables
    (kept as evidence: measured ~345x slower); grouped=True uses the
    round-5 grouped form (G shared row gathers + select,
    bucketing.grouped_perm_tables) that production harnesses run."""
    from turbotpu.decoder.bucketing import (embedded_perm_tables,
                                            grouped_perm_tables)
    from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
    from turbotpu.harness.bench import measure_chained, measure_roundtrip

    cfg = DecoderConfig(K=K, n_iters=n_iters, mode="maxlog", ext_scale=0.75,
                        siso="pallas", io_dtype="bfloat16",
                        interleaver=interleaver)
    rng = np.random.default_rng(0)
    mk = lambda n: jnp.asarray(rng.normal(size=(B, n)) * 4, jnp.float32)
    inputs = jax.device_put((mk(K), mk(K), mk(K), mk(6), mk(6)))
    perm_b = inv_b = group_tables = None
    if k_mix:
        Ks = [k_mix[i % len(k_mix)] for i in range(B)]
        true_bits = int(np.sum(Ks))
        if grouped:
            pg, ig, gid = grouped_perm_tables(Ks, K, interleaver)
            group_tables = jax.device_put(
                (jnp.asarray(pg), jnp.asarray(ig), jnp.asarray(gid)))
        else:
            pb, ib = embedded_perm_tables(Ks, K, interleaver)
            perm_b, inv_b = jax.device_put(
                (jnp.asarray(pb), jnp.asarray(ib)))
    else:
        true_bits = B * K

    @jax.jit
    def run(inputs, reps):
        def body(i, carry):
            (ls, lp1, lp2, t1, t2), acc = carry
            hard, iters, L = turbo_decode(ls, lp1, lp2, t1, t2, cfg,
                                          perm_b=perm_b, inv_b=inv_b,
                                          group_tables=group_tables)
            s = L[0, 0] + iters[0].astype(L.dtype)
            return (ls + s * 0.0, lp1, lp2, t1, t2), acc + s
        _, acc = jax.lax.fori_loop(0, reps, body, (inputs, jnp.float32(0)))
        return acc

    floor = measure_roundtrip()
    float(run(inputs, jnp.int32(4)))
    wall, reps = measure_chained(lambda r: float(run(inputs, jnp.int32(r))),
                                 4, floor)
    return {"K": K, "B": B, "k_mix": list(k_mix) if k_mix else None,
            "grouped": grouped if k_mix else None,
            "wall_s": wall, "timed_reps": reps,
            "bucket_mbit_per_s": B * K / wall / 1e6,
            "true_mbit_per_s": true_bits / wall / 1e6}


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.harness.bench import bench_decode

    out = {}

    # -- 1. K sweep ------------------------------------------------------
    ks = {}
    for K in (512, 1024, 2048, 4096, 6144):
        W = 256 if K % 256 == 0 and K >= 2048 else 0
        cfg = DecoderConfig(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                            siso="pallas", io_dtype="bfloat16", nii=True,
                            window=W)
        rec = bench_decode(cfg, 1024, n_timed=16)
        ks[str(K)] = {"window": W or "auto", "timed_reps": rec["timed_reps"],
                      "mbit_per_s": round(rec["mbit_per_s"], 1)}
        print("K", K, ks[str(K)], flush=True)
    out["k_sweep"] = ks

    # -- 2. mixed-K embedded vs homogeneous (C3 bucket) ------------------
    mixed = {}
    mixed["homogeneous_5114"] = bench_embedded(5114, 1024, None)
    print("homog", mixed["homogeneous_5114"], flush=True)
    mixed["mixed_grouped"] = bench_embedded(5114, 1024, (320, 1280, 5114),
                                            grouped=True)
    print("grouped", mixed["mixed_grouped"], flush=True)
    mixed["grouped_overhead_pct"] = round(
        100 * (mixed["mixed_grouped"]["wall_s"]
               / mixed["homogeneous_5114"]["wall_s"] - 1), 1)
    # The general per-codeword path, kept as the WHY-grouped-exists row.
    mixed["mixed_per_codeword"] = bench_embedded(5114, 1024,
                                                 (320, 1280, 5114))
    print("per-cw", mixed["mixed_per_codeword"], flush=True)
    mixed["per_codeword_vs_grouped_x"] = round(
        mixed["mixed_per_codeword"]["wall_s"]
        / mixed["mixed_grouped"]["wall_s"], 1)
    # C3's own acceptance shape: B=128 pads to one whole 1024-row cell.
    mixed["mixed_grouped_b128"] = bench_embedded(5114, 128,
                                                 (320, 1280, 5114),
                                                 grouped=True)
    print("grouped b128", mixed["mixed_grouped_b128"], flush=True)
    out["mixed_k"] = mixed

    with open("experiments/k_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written experiments/k_sweep.json")


if __name__ == "__main__":
    main()

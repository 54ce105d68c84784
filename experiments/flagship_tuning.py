#!/usr/bin/env python
"""Flagship schedule tuning + variance discipline (round-3 VERDICT items
3 and 4).

One artifact answers four open questions:

1. **Variance**: the committed headline must be reproducible -- 5
   independent bench_decode passes (each already min-of-3 chained-rep
   timings with the round-trip floor subtracted) on the flagship config,
   reported as min/median/max, so docs can quote a number with a stated
   run-to-run band under the axon tunnel.
2. **Batch sweep** (SURVEY component 30's "batch growth" lever): B in
   {512, 1024, 2048, 4096} at the flagship config.  VMEM is per-cell
   (B=1024) and does not change with B; HBM high-water is ~4 tensors x
   (B/1024) x 12.8 MB -- far under 16 GB at every point, so the sweep is
   pure schedule measurement.
3. **log-MAP / linlog rows**: C3/C4 run mode=logmap; its kernel cost was
   never measured (every committed perf artifact was max-log).
4. **Extrinsic dtype A/B** at the flagship: bfloat16 vs int8 fixed-point.

Run ON TPU:  python experiments/flagship_tuning.py
Writes experiments/flagship_tuning.json.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.harness.bench import bench_decode

    K, iters = 6144, 6
    flag = dict(K=K, n_iters=iters, mode="maxlog", ext_scale=0.75,
                siso="pallas", io_dtype="bfloat16", nii=True, window=256)
    out = {}

    # -- 4. extrinsic dtype A/B (also selects the config for 1-3) -------
    ab = {}
    for ext in ("", "int8"):
        cfg = DecoderConfig(**flag, ext_dtype=ext)
        ab[ext or "bfloat16"] = bench_decode(cfg, 1024, n_timed=16
                                             )["mbit_per_s"]
        print("ext", ext or "bfloat16", round(ab[ext or "bfloat16"], 1),
              flush=True)
    out["ext_dtype_ab"] = ab
    best_ext = max(ab, key=ab.get)
    best_ext_arg = "" if best_ext == "bfloat16" else best_ext

    # -- 1. variance on the winning config ------------------------------
    cfg = DecoderConfig(**flag, ext_dtype=best_ext_arg)
    runs = [bench_decode(cfg, 1024, n_timed=16)["mbit_per_s"]
            for _ in range(5)]
    runs.sort()
    out["variance"] = {
        "config": {**flag, "ext_dtype": best_ext, "B": 1024},
        "runs_mbit_per_s": [round(r, 1) for r in runs],
        "min": round(runs[0], 1), "median": round(runs[2], 1),
        "max": round(runs[-1], 1),
        "spread_pct": round(100 * (runs[-1] - runs[0]) / runs[2], 2),
    }
    print("variance", out["variance"], flush=True)

    # -- 2. batch sweep --------------------------------------------------
    bs = {}
    for B in (512, 1024, 2048, 4096):
        bs[str(B)] = round(bench_decode(cfg, B, n_timed=16)["mbit_per_s"], 1)
        print("B", B, bs[str(B)], flush=True)
    out["batch_sweep"] = bs

    # -- 3. MAP-variant rows (C3/C4 run logmap; linlog is the LUT-free
    #       middle ground) ----------------------------------------------
    modes = {}
    for mode in ("logmap", "linlog"):
        cfgm = DecoderConfig(**{**flag, "mode": mode, "ext_scale": 1.0},
                             ext_dtype=best_ext_arg)
        modes[mode] = round(bench_decode(cfgm, 1024, n_timed=16)
                            ["mbit_per_s"], 1)
        print("mode", mode, modes[mode], flush=True)
    out["map_variants"] = {"maxlog": out["variance"]["median"], **modes}

    with open("experiments/flagship_tuning.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written experiments/flagship_tuning.json")


if __name__ == "__main__":
    main()

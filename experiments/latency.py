#!/usr/bin/env python
"""Measured single-batch decode latency (round-4 VERDICT next-round
item 7): ARCHITECTURE.md's "~2.0 ms decode latency (any B <= 1024)" row
was derived from the throughput number, never measured.  This measures
it: rep-scaled chained timing (bench_decode, compute >= 5x the tunnel
floor) at B in {1, 64, 1024}, flagship config, fixed 6 iterations.
wall_s_per_batch IS the latency: the chain serializes decodes, so per
-rep wall = one decode's device time.

Context rows recorded alongside:
  * the kernel is batch-on-lanes -- one 1024-row cell is the minimum
    tile, so B=1 and B=1024 should cost the same wall (B<1024 pads);
  * the seq axis's modeled latency lever (n_seq=8 => ~1.85x faster per
    batch at K=6144, experiments/comm_model.json) applies ON TOP of
    the B=1024 number measured here.

Run ON TPU:  python experiments/latency.py
Writes experiments/latency.json.
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

    cfg = DecoderConfig(K=6144, n_iters=6, mode="maxlog", ext_scale=0.75,
                        siso="pallas", io_dtype="bfloat16", nii=True,
                        window=256)
    out = {"config": "K=6144, 6 iters, maxlog, pallas+NII W=256, bf16"}
    for B in (1, 64, 1024):
        rec = bench_decode(cfg, B, n_timed=16)
        out[f"latency_ms_B{B}"] = round(rec["wall_s_per_batch"] * 1e3, 3)
        out[f"timed_reps_B{B}"] = rec["timed_reps"]
        print("B", B, out[f"latency_ms_B{B}"], "ms", flush=True)
    try:
        cm = json.load(open("experiments/comm_model.json"))
        row8 = next(r for r in cm["seq_sharded"] if r["n_seq"] == 8)
        out["seq8_modeled_latency_speedup"] = round(
            row8["latency_speedup_vs_1chip"], 3)
        out["seq8_modeled_note"] = ("model-composed (measured glue + "
                                    "modeled ICI links), not a one-program "
                                    "measurement -- comm_model.json")
    except Exception:
        pass
    with open("experiments/latency.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written experiments/latency.json")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the primary metric.

Primary metric (BASELINE.json): decoded information Mbit/s per chip at
6 iterations on K=6144 LTE blocks, max-log-MAP.  vs_baseline is measured
against the driver target of 1 Gbit/s on a v5e-8 slice, i.e. 125 Mbit/s
per chip (reference throughput itself is unrecoverable -- BASELINE.md).
"""

import json
import sys


def main():
    import jax
    try:
        # Persistent compile cache: the fused decode chain takes minutes to
        # compile cold; cached runs start in seconds.
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.harness.bench import bench_decode

    K, B, iters = 6144, 1024, 6
    last_err = None
    for siso in ("pallas", "scan"):
        try:
            # bfloat16 LLR I/O on the bandwidth-bound kernel path (+19%
            # over fp32; BER validated indistinguishable at 0.7 dB --
            # RESULTS.md).  Metrics stay fp32 in VMEM.
            cfg = DecoderConfig(K=K, n_iters=iters, mode="maxlog",
                                ext_scale=0.75, siso=siso,
                                io_dtype="bfloat16" if siso == "pallas"
                                else "float32")
            rec = bench_decode(cfg, B, n_timed=16, n_warmup=1)
            break
        except Exception as e:  # fall back if the Pallas path regresses
            import traceback
            print(f"[bench] siso={siso} failed, falling back:", file=sys.stderr)
            traceback.print_exc()
            last_err = e
    else:
        raise last_err

    per_chip_target = 125.0  # Mbit/s/chip (1 Gbit/s / 8 chips)
    print(json.dumps({
        "metric": f"decoded Mbit/s/chip (K={K}, {iters} iters, max-log-MAP, "
                  f"batch={B}, siso={rec['siso']}, io={cfg.io_dtype})",
        "value": round(rec["mbit_per_s"], 2),
        "unit": "Mbit/s/chip",
        "vs_baseline": round(rec["mbit_per_s"] / per_chip_target, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

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
    # Flagship first: NII windowed kernel (W=256), bfloat16 LLR I/O, int8
    # extrinsic streams -- all BER-validated on-chip at the K=6144
    # waterfall (RESULTS.md: NII/W=256 costs ~0.03 dB inside the 0.05 dB
    # conformance bar; bf16 I/O indistinguishable from fp32; int8
    # extrinsics 0.00 dB, experiments/ext_dtype_ber.json).  This is the
    # exact configuration of the committed round-5 variance band
    # (experiments/flagship_tuning.json), so driver captures are
    # comparable to it.  Fall back to bf16 extrinsics, the exact
    # two-phase kernel, then the lax.scan path, if a variant regresses.
    variants = (
        dict(siso="pallas", io_dtype="bfloat16", nii=True, window=256,
             ext_dtype="int8"),
        dict(siso="pallas", io_dtype="bfloat16", nii=True, window=256),
        dict(siso="pallas", io_dtype="bfloat16"),
        dict(siso="scan"),
    )
    for var in variants:
        try:
            cfg = DecoderConfig(K=K, n_iters=iters, mode="maxlog",
                                ext_scale=0.75, **var)
            rec = bench_decode(cfg, B, n_timed=16, n_warmup=1)
            break
        except Exception as e:  # fall back if a fast path regresses
            import traceback
            print(f"[bench] variant {var} failed, falling back:",
                  file=sys.stderr)
            traceback.print_exc()
            last_err = e
    else:
        raise last_err

    per_chip_target = 125.0  # Mbit/s/chip (1 Gbit/s / 8 chips)
    kern = rec["siso"] + (",nii" if cfg.nii else "") + (
        f",ext={cfg.ext_dtype}" if cfg.ext_dtype else "")
    print(json.dumps({
        "metric": f"decoded Mbit/s/chip (K={K}, {iters} iters, max-log-MAP, "
                  f"batch={B}, siso={kern}, io={cfg.io_dtype})",
        "value": round(rec["mbit_per_s"], 2),
        "unit": "Mbit/s/chip",
        "vs_baseline": round(rec["mbit_per_s"] / per_chip_target, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""BER validation of the int8 extrinsic-stream quantization at the
K=6144 waterfall (round-3 VERDICT item 2a acceptance: the quantized
exchange payload must sit inside the 0.05 dB bar).

Paired comparison against the bf16-extrinsic flagship on IDENTICAL noise
realizations (same seeds -> sampling noise cancels to first order), dB
penalty via the measured local FER slope -- the same methodology as
experiments/nii_window_sweep.py, whose fer_run this reuses.

int8 extrinsics: step 0.25 LLR, saturation +-31.75 (the classic
fixed-point extrinsic representation of hardware turbo decoders).  The
kernel computes metrics in fp32; only the HBM extrinsic tensors -- which
are ALSO the seq-parallel all_to_all payload -- are quantized.

Run ON TPU:  python experiments/ext_dtype_ber.py [--ext int8 float8_e4m3fn]
Writes experiments/ext_dtype_ber.json (or --out).

--ext float8_e4m3fn closes round-4 VERDICT missing item 5: fp8
extrinsics were a public CLI surface with a functional test but no BER
artifact.  e4m3 spends its 8 bits on ~2 significant digits over a huge
range, where the extrinsic distribution wants fixed step size over
[-32, 32] -- int8's exact shape -- so the prior is that fp8 underperforms
int8; this measures it.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ext", nargs="+", default=["int8"],
                    help="quantized ext dtypes to compare against bfloat16")
    ap.add_argument("--out", default="experiments/ext_dtype_ber.json")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from nii_window_sweep import fer_run
    from turbotpu.decoder.turbo import DecoderConfig

    K, B, n_batches = 6144, 1024, 12
    ebn0 = [0.6, 0.7, 0.8]
    rows = {}
    for ext in ("", *args.ext):
        cfg = DecoderConfig(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                            siso="pallas", io_dtype="bfloat16", nii=True,
                            window=256, ext_dtype=ext)
        fer = {}
        for e in ebn0:
            bit, frame = fer_run(cfg, K, B, e, n_batches, seed0=777)
            fer[str(e)] = {"frames": n_batches * B, "frame_errs": frame,
                           "bit_errs": bit, "fer": frame / (n_batches * B)}
            print(ext or "bfloat16", e, fer[str(e)], flush=True)
        rows[ext or "bfloat16"] = fer

    # dB penalty from the bf16 curve's measured local slope.
    bf = rows["bfloat16"]
    out = {"K": K, "B": B, "n_batches": n_batches, "rows": rows}
    f0, f1 = bf[str(ebn0[0])]["fer"], bf[str(ebn0[-1])]["fer"]
    if f0 > 0 and f1 > 0:
        slope = (np.log10(f0) - np.log10(f1)) / (ebn0[-1] - ebn0[0])
        for ext in args.ext:
            pen = {}
            for e in ebn0:
                fi, fb = rows[ext][str(e)]["fer"], bf[str(e)]["fer"]
                if fi > 0 and fb > 0:
                    pen[str(e)] = round(
                        (np.log10(fi) - np.log10(fb)) / slope, 4)
            out[f"{ext}_penalty_db"] = pen
            print(f"{ext} penalty (dB):", pen)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("written", args.out)


if __name__ == "__main__":
    main()

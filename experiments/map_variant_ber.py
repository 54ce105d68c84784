#!/usr/bin/env python
"""MAP-variant BER at the K=6144 waterfall: log-MAP vs linlog vs max-log.

Round 4 measured the kernel cost of each variant
(experiments/flagship_tuning.json: logmap 758, linlog 1418, maxlog 3076
Mbit/s at the flagship config) -- this experiment supplies the matching
ACCURACY column so the speed/accuracy trade is a table, not folklore:

  * logmap: exact Jacobian correction (log1p+exp per max* reduction);
  * linlog: the classical piecewise-linear correction
    max(0, c0 - c1*|a-b|) -- the LUT-free TPU analog of the hardware
    LUT correction, ~1.9x faster than logmap here;
  * maxlog + 0.75 extrinsic scaling: the throughput flagship.

Paired FER on identical noise (same seeds; fer_run from
nii_window_sweep), dB deltas via the logmap curve's measured local
slope.  Run ON TPU:  python experiments/map_variant_ber.py
Writes experiments/map_variant_ber.json.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np
import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from nii_window_sweep import fer_run
    from turbotpu.decoder.turbo import DecoderConfig

    K, B, n_batches = 6144, 1024, 12
    ebn0 = [0.6, 0.7]
    variants = {
        "logmap": dict(mode="logmap", ext_scale=1.0),
        "linlog": dict(mode="linlog", ext_scale=1.0),
        "maxlog": dict(mode="maxlog", ext_scale=0.75),
    }
    rows = {}
    for name, kw in variants.items():
        cfg = DecoderConfig(K=K, n_iters=6, siso="pallas",
                            io_dtype="bfloat16", nii=True, window=256,
                            **kw)
        fer = {}
        for e in ebn0:
            bit, frame = fer_run(cfg, K, B, e, n_batches, seed0=777)
            fer[str(e)] = {"frames": n_batches * B, "frame_errs": frame,
                           "bit_errs": bit, "fer": frame / (n_batches * B)}
            print(name, e, fer[str(e)], flush=True)
        rows[name] = fer

    out = {"K": K, "B": B, "n_batches": n_batches, "rows": rows,
           "throughput_mbit_s": {"logmap": 758, "linlog": 1418,
                                 "maxlog": 3076,
                                 "source": "flagship_tuning.json"}}
    lm = rows["logmap"]
    f0, f1 = lm[str(ebn0[0])]["fer"], lm[str(ebn0[-1])]["fer"]
    if f0 > 0 and f1 > 0:
        slope = (np.log10(f0) - np.log10(f1)) / (ebn0[-1] - ebn0[0])
        pen = {}
        for name in ("linlog", "maxlog"):
            pen[name] = {}
            for e in ebn0:
                fv, fl = rows[name][str(e)]["fer"], lm[str(e)]["fer"]
                if fv > 0 and fl > 0:
                    pen[name][str(e)] = round(
                        (np.log10(fv) - np.log10(fl)) / slope, 4)
        out["penalty_db_vs_logmap"] = pen
        print("penalties vs logmap (dB):", pen)
    with open("experiments/map_variant_ber.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written experiments/map_variant_ber.json")


if __name__ == "__main__":
    main()

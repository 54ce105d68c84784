#!/usr/bin/env python
"""linlog vs log-MAP on UMTS at the C3 operating point (round-4 VERDICT
next-round item 2, first half).

Round 4 established linlog == logmap within sampling error on LTE/QPP at
K=6144 (experiments/map_variant_ber.json: +0.02/-0.01 dB) at a measured
1.9x kernel speedup -- but C3/C3-RM/C4 acceptance still burn log-MAP,
and the equivalence was never shown on the UMTS interleaver family.
This experiment runs the ACTUAL C3 production path (TRUE mixed-K UMTS
batch, wire-exact mux, CRC early termination, embedded per-codeword
tables) with both MAP variants on IDENTICAL frames: both arms use the
same SimConfig seed, and the stopping rule is pinned to a fixed frame
count (min_frame_errors=inf), so the key-split tree -- hence every
payload and noise draw -- is identical and sampling noise cancels to
first order.

dB delta via the logmap curve's measured local FER slope, the same
methodology as map_variant_ber.py / ext_dtype_ber.py.

Run ON TPU:  python experiments/map_variant_umts.py
Writes experiments/map_variant_umts.json.  If the deltas sit inside the
0.05 dB conformance bar (BASELINE.json:5), configs/acceptance.py C3/
C3-RM/C4 switch to linlog.
"""

from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import numpy as np
import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from configs.acceptance import C3
    from turbotpu.harness.ber import simulate_point

    ebn0 = [0.5, 1.0]
    n_frames = 12_288          # ~1.1k / ~100 frame errors at the 2 points
    rows = {}
    for mode in ("logmap", "linlog"):
        sc = dataclasses.replace(
            C3,
            name=f"c3_{mode}_paired",
            decoder=dataclasses.replace(C3.decoder, mode=mode),
            ebn0_db_grid=tuple(ebn0),
            min_frame_errors=1 << 30,      # fixed-frame paired run
            max_frames=n_frames)
        fer = {}
        for e in ebn0:
            rec = simulate_point(sc, e)
            fer[str(e)] = {"frames": rec["frames"],
                           "frame_errs": rec["frame_errs"],
                           "bit_errs": rec["bit_errs"], "fer": rec["fer"],
                           "avg_iters": round(rec["avg_iters"], 3),
                           "wall_s": round(rec["wall_s"], 1)}
            print(mode, e, fer[str(e)], flush=True)
        rows[mode] = fer

    out = {"config": "C3 (umts mixed-K, crc early-term, 8 iters)",
           "K_mix": list(C3.K_mix), "B": C3.B, "n_frames": n_frames,
           "rows": rows}
    lm = rows["logmap"]
    f0, f1 = lm[str(ebn0[0])]["fer"], lm[str(ebn0[-1])]["fer"]
    if f0 > 0 and f1 > 0:
        slope = (np.log10(f0) - np.log10(f1)) / (ebn0[-1] - ebn0[0])
        pen = {}
        for e in ebn0:
            fv, fl = rows["linlog"][str(e)]["fer"], lm[str(e)]["fer"]
            if fv > 0 and fl > 0:
                pen[str(e)] = round((np.log10(fv) - np.log10(fl)) / slope, 4)
        out["linlog_penalty_db_vs_logmap"] = pen
        print("linlog penalty vs logmap (dB):", pen)
    with open("experiments/map_variant_umts.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written experiments/map_variant_umts.json")


if __name__ == "__main__":
    main()

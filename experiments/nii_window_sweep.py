"""NII window sweep: throughput AND FER-vs-exact at the K=6144 waterfall
for W in {128, 160, 192, 224, 256} (round-2 VERDICT item 7: "W sweep
beyond 256" / find the fastest window inside the 0.05 dB bar).

Round-2 data points: W=128 runs 3.29 Gbit/s but costs ~0.06 dB (over the
bar); W=256 runs 3.03 Gbit/s at ~0.03 dB.  The candidates in between are
unexplored.  This script measures, for each W:

  * fixed-iteration throughput (bench_decode discipline: chained reps,
    round-trip floor subtracted) at K=6144, B=1024, 6 iters, max-log,
    bf16 I/O;
  * FER at the waterfall operating points vs the exact two-phase kernel
    on the SAME noise realizations (paired comparison -- sampling noise
    cancels to first order), converted to a dB penalty via the measured
    local FER slope.

Run ON TPU:  python experiments/nii_window_sweep.py
Writes experiments/nii_window_sweep.json.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def fer_run(cfg, K, B, ebn0_db, n_batches, seed0):
    """Frame errors over n_batches independent batches of B frames."""
    import functools

    from turbotpu.decoder.turbo import turbo_decode
    from turbotpu.harness.bench import make_decode_inputs

    @jax.jit
    def one(inputs, bits_ref):
        hard, iters, L = turbo_decode(*inputs, cfg)
        errs = (hard != bits_ref).astype(jnp.int32)
        bit = errs.sum()
        frame = (errs.sum(axis=1) > 0).astype(jnp.int32).sum()
        return bit, frame

    # make_decode_inputs tiles unique payloads then draws i.i.d. noise;
    # we need the reference bits too, so re-derive them the same way.
    from turbotpu.golden import numpy_ref as npr
    from turbotpu.spec.qpp import qpp_perm

    bit_t = frame_t = 0
    perm = qpp_perm(K)
    for b in range(n_batches):
        seed = seed0 + b
        rng = np.random.default_rng(seed)
        n_base = min(B, 64)
        bits = np.stack([rng.integers(0, 2, K).astype(np.int8)
                         for _ in range(n_base)])
        parts = [[] for _ in range(5)]
        for row in bits:
            for i, x in enumerate(npr.turbo_encode(row, perm)):
                parts[i].append(x)
        sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
        reps = -(-B // n_base)
        out = []
        for p in parts:
            a = np.tile(np.stack(p).astype(np.float64), (reps, 1))[:B]
            y = (1 - 2 * a) + sigma * rng.normal(size=a.shape)
            out.append(jnp.asarray(2 * y / sigma ** 2, jnp.float32))
        bits_full = jnp.asarray(np.tile(bits, (reps, 1))[:B])
        bit, frame = one(tuple(out), bits_full)
        bit_t += int(bit)
        frame_t += int(frame)
    return bit_t, frame_t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, nargs="+",
                    default=[128, 160, 192, 224, 256])
    ap.add_argument("--k", type=int, default=6144)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--ebn0", type=float, nargs="+", default=[0.7, 0.8])
    ap.add_argument("--n-batches", type=int, default=12,
                    help="FER batches per point (B frames each)")
    ap.add_argument("--skip-ber", action="store_true")
    ap.add_argument("--out", default="experiments/nii_window_sweep.json")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.harness.bench import bench_decode

    K, B, iters = args.k, args.batch, args.iters
    rows = []

    # Exact kernel first: the FER anchor and the speed floor.
    import warnings
    variants = [("exact", dict(siso="pallas", io_dtype="bfloat16"))]
    variants += [(f"nii_w{w}", dict(siso="pallas", io_dtype="bfloat16",
                                    nii=True, window=w))
                 for w in args.windows]
    for name, kw in variants:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # in-bar warning for small W
            cfg = DecoderConfig(K=K, n_iters=iters, mode="maxlog",
                                ext_scale=0.75, **kw)
        rec = bench_decode(cfg, B, n_timed=16, n_warmup=1)
        row = {"name": name, **{k: kw.get(k) for k in ("nii", "window")},
               "mbit_per_s": rec["mbit_per_s"]}
        if not args.skip_ber:
            fer = {}
            for e in args.ebn0:
                bit, frame = fer_run(cfg, K, B, e, args.n_batches, seed0=777)
                fer[str(e)] = {"frames": args.n_batches * B,
                               "frame_errs": frame, "bit_errs": bit,
                               "fer": frame / (args.n_batches * B)}
            row["fer"] = fer
        rows.append(row)
        print(json.dumps(row), flush=True)

    # dB penalty vs exact from the measured slope between the two
    # operating points of the EXACT curve (decades per dB).
    if not args.skip_ber and len(args.ebn0) >= 2:
        ex = rows[0]["fer"]
        e0, e1 = str(args.ebn0[0]), str(args.ebn0[1])
        f0, f1 = ex[e0]["fer"], ex[e1]["fer"]
        if f0 > 0 and f1 > 0:
            slope = (np.log10(f0) - np.log10(f1)) / (args.ebn0[1] - args.ebn0[0])
            for row in rows[1:]:
                pen = {}
                for e in (e0, e1):
                    fe, fx = row["fer"][e]["fer"], ex[e]["fer"]
                    if fe > 0 and fx > 0:
                        pen[e] = float(np.log10(fe / fx) / slope)
                row["db_penalty_vs_exact"] = pen
            print("exact-curve slope: %.2f decades/dB" % slope)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("written", args.out)


if __name__ == "__main__":
    main()

"""SISO-variant shape benchmark (round-2 VERDICT item 10; SURVEY.md
section 8 hard part 1 promised "build both, benchmark; the benchmark
decides per shape").

Times one SISO half-iteration for each implementation over a (K, B)
grid on the current backend:

  * scan  -- lax.scan sequential recursion (jnp, XLA-fused)
  * ascan -- associative_scan over 8x8 (max,+) matrices: O(log K) depth
             but ~32x the FLOPs of the sequential form
  * pallas -- the fused gamma/alpha/beta/LLR Mosaic kernel

Run ON TPU:  python experiments/siso_shapes.py
Writes experiments/siso_shapes.json and prints a winner table.
Timing discipline: chained on-device reps inside one jit, round-trip
floor subtracted (harness.bench conventions for the axon tunnel).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench_one(siso_name: str, K: int, B: int, mode: str = "maxlog",
              reps: int = 32) -> float:
    """Seconds per half-iteration (one SISO pass over the batch)."""
    from turbotpu.decoder.turbo import DecoderConfig, get_siso
    from turbotpu.harness.bench import measure_roundtrip, _timed

    siso = get_siso(DecoderConfig(K=K, siso=siso_name))
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    ls, lp = f32(B, K + 3), f32(B, K + 3)
    la = f32(B, K)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(ls, lp, la, n: int):
        def body(i, carry):
            la, acc = carry
            _, le = siso(ls, lp, la, mode=mode)
            return le * 0.999, acc + le[0, 0]
        _, acc = jax.lax.fori_loop(0, n, body, (la, jnp.float32(0)))
        return acc

    floor = measure_roundtrip()
    float(run(ls, lp, la, reps))                 # compile + warm
    wall = min(_timed(lambda: float(run(ls, lp, la, reps)))
               for _ in range(3))
    # Small shapes finish in microseconds; subtracting the ~38 ms tunnel
    # fetch floor from a floor-sized wall is pure noise.  Scale reps
    # until compute dominates the floor 5x (one extra compile at the new
    # static rep count), same discipline as cost_breakdown._calibrate_vpu.
    target = max(5 * floor, 0.2)
    if wall - floor < target:
        scale = int(np.ceil(target / max(wall - floor, 1e-4)))
        reps = min(reps * scale, 1_000_000)
        float(run(ls, lp, la, reps))
        wall = min(_timed(lambda: float(run(ls, lp, la, reps)))
                   for _ in range(3))
    return max(wall - floor, 1e-9) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="+",
                    default=[104, 512, 2048, 6144])
    ap.add_argument("--bs", type=int, nargs="+", default=[8, 64, 1024])
    ap.add_argument("--variants", nargs="+",
                    default=["scan", "ascan", "pallas"])
    ap.add_argument("--mode", default="maxlog",
                    choices=["maxlog", "logmap", "linlog"],
                    help="MAP variant (round-3 VERDICT item 4: logmap's "
                         "kernel cost was never measured)")
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--out", default="experiments/siso_shapes.json")
    args = ap.parse_args(argv)

    backend = jax.default_backend()
    if backend != "tpu":
        print(f"WARNING: backend={backend}; Pallas runs INTERPRETED here "
              "-- numbers are only meaningful on TPU", file=sys.stderr)

    rows = []
    for K in args.ks:
        for B in args.bs:
            row = {"K": K, "B": B}
            for v in args.variants:
                try:
                    t = bench_one(v, K, B, mode=args.mode,
                                  reps=args.reps)
                    row[v] = t
                    row[f"{v}_mbit_s"] = B * K / t / 1e6
                except Exception as e:  # noqa: BLE001 - record and move on
                    row[v] = None
                    row[f"{v}_error"] = f"{type(e).__name__}: {e}"[:200]
            timed = {v: row[v] for v in args.variants if row.get(v)}
            row["winner"] = min(timed, key=timed.get) if timed else None
            rows.append(row)
            print({k: (f"{v:.2e}" if isinstance(v, float) else v)
                   for k, v in row.items() if not k.endswith("mbit_s")})
    rec = {"backend": backend, "mode": args.mode,
           "reps": args.reps, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"written {args.out}")


if __name__ == "__main__":
    main()

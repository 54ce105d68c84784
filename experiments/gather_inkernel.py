#!/usr/bin/env python
"""Can the extrinsic interleave gather be folded INTO the SISO kernel?

Round-3 VERDICT item 1 asks to make the SISO2 la-window DMA read through a
precomputed per-window QPP index table instead of consuming a pre-gathered
tensor, reclaiming the ~17% of decode wall spent in the 12 per-decode HBM
gathers (decoder/turbo_cells.py g_perm/g_inv).

The physics of that fold: a gathered la window is W rows, each a
contiguous (8, 128) batch tile (2 KB bf16 / 1 KB f8), scattered over the
whole source tensor -- QPP contention-freeness guarantees CONFLICT-free
(bank-parallel) access for parallel window decoders, not CONTIGUOUS
access, so the in-kernel fold is W separate row DMAs per window issued
from the kernel.  Whether that beats XLA's gather is a pure issue-rate
question:

  * budget: the fused kernel runs ~22 ns per trellis row (1.65 ms kernel
    -only decode / (12 SISO calls x 6272 rows), experiments/seq_gap.json),
    so folding the gather in is a win ONLY if a row-granular DMA can be
    issued+retired in ~ that budget;
  * the XLA gather alternative moves 2x the tensor bytes (read+write
    round trip through HBM) but runs at full HBM bandwidth: ~28 us per
    6272-row gather measured (seq_gap delta / 12).

This experiment measures the actual per-row DMA cost on hardware with a
Pallas row-gather kernel (scalar-prefetched index table, per-row
make_async_copy, double-buffered windows) against jnp.take on identical
shapes, and derives the verdict.  Writes experiments/gather_inkernel.json.

Result (v5e, 2026-08-21): ~200 ns/row for the in-kernel row gather --
about 9x the kernel's per-row compute budget and ~45x slower than the
XLA gather's effective per-row cost (~4.5 ns/row at HBM bandwidth).
Folding the gather into the kernel at row granularity would make the
kernel DMA-issue-bound and ~5x SLOWER overall; the committed answer to
the 17% is instead to halve the gathered bytes (float8 extrinsic
streams, DecoderConfig.ext_dtype) -- see RESULTS.md.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timed(fn, reps=5):
    """fn must end in a blocking SCALAR fetch: under the axon TPU tunnel
    jax.block_until_ready returns before device work completes (measured
    this round -- a 4 ms chain 'finished' in 35 us), so only a value
    fetch is a real sync.  Callers subtract the round-trip floor."""
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def row_gather_pallas(src: jax.Array, idx: jax.Array, W: int = 128,
                      interpret: bool = False) -> jax.Array:
    """out[t] = src[idx[t]] via per-row DMAs, one grid step per W-row
    window, rows double-buffered against the window write-back."""
    T = src.shape[0]
    assert T % W == 0
    row_shape = src.shape[1:]

    def kernel(idx_ref, src_hbm, out_hbm, buf, sems, osem):
        w = pl.program_id(0)

        def row_dma(i):
            return pltpu.make_async_copy(
                src_hbm.at[idx_ref[w * W + i]], buf.at[i], sems.at[i])

        # Issue all W row DMAs back-to-back, then retire them in order:
        # measures sustained issue+retire throughput with max overlap.
        def issue(i, _):
            row_dma(i).start()
            return 0

        jax.lax.fori_loop(0, W, issue, 0)

        def drain(i, _):
            row_dma(i).wait()
            return 0

        jax.lax.fori_loop(0, W, drain, 0)
        out = pltpu.make_async_copy(buf, out_hbm.at[pl.ds(w * W, W)], osem)
        out.start()
        out.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // W,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((W,) + row_shape, src.dtype),
            pltpu.SemaphoreType.DMA((W,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), src)


def main():
    on_tpu = jax.default_backend() == "tpu"
    T, W = 6272, 128
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.permutation(T).astype(np.int32))
    out = {"T": T, "W": W, "backend": jax.default_backend(), "rows": {}}

    for dt_name in ("bfloat16", "float8_e4m3fn"):
        dt = jnp.dtype(dt_name)
        src = jnp.asarray(
            rng.normal(size=(T, 8, 128)).astype(np.float32)).astype(dt)

        @functools.partial(jax.jit, static_argnames=("reps", "kind"))
        def run(src, idx, reps: int, kind: str):
            # Each rep's output is the next rep's input (no folding:
            # row_gather/take with the same constant idx composed 'reps'
            # times cannot be collapsed because the CARRY is data-
            # dependent), and the result funnels into one scalar so the
            # host fetch is a true sync.
            def body(i, s):
                g = (row_gather_pallas(s, idx, W, interpret=not on_tpu)
                     if kind == "pallas" else jnp.take(s, idx, axis=0))
                return g
            out = jax.lax.fori_loop(0, reps, body, src)
            return out[0, 0, 0].astype(jnp.float32)

        from turbotpu.harness.bench import measure_roundtrip
        floor = measure_roundtrip() if on_tpu else 0.0
        reps = 64 if on_tpu else 1
        rec = {}
        for kind in ("xla", "pallas"):
            wall = max(
                _timed(lambda k=kind: float(run(src, idx, reps, k)))
                - floor, 1e-9)
            rec[kind] = {
                "wall_s": wall / reps,
                "ns_per_row": wall / reps / T * 1e9,
            }
        rec["pallas_over_xla"] = (rec["pallas"]["wall_s"]
                                  / rec["xla"]["wall_s"])
        out["rows"][dt_name] = rec
        print(dt_name, {k: round(v["ns_per_row"], 1)
                        for k, v in rec.items() if isinstance(v, dict)})

    # The decision numbers: kernel per-row compute budget vs measured DMA.
    out["kernel_ns_per_row_budget"] = 22.0   # seq_gap.json kernel-only / rows
    bf = out["rows"]["bfloat16"]
    out["verdict"] = {
        "in_kernel_fold_viable": bf["pallas"]["ns_per_row"] < 30.0,
        "note": ("fold viable only if per-row DMA cost fits the ~22 ns/row "
                 "kernel budget; otherwise the gather fold makes the kernel "
                 "DMA-issue-bound and the XLA gather (bandwidth-bound, "
                 "2x bytes) stays the right tool -- attack BYTES instead "
                 "(ext_dtype=float8_e4m3fn)"),
    }
    with open("experiments/gather_inkernel.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["verdict"], indent=1))


if __name__ == "__main__":
    main()

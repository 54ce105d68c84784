"""Locate the seq-parallel 1x1 overhead vs the monolithic flagship
(round 3: 2.56 vs 3.17 Gbit/s).  Times, with the bench chained-reps
discipline:

  (a) the plain NII kernel     (monolithic contract: nii_ckpt)
  (b) the boundary+NII kernel  (seq chunk contract: nii_boundaries)
  (c) full monolithic decode   (turbo_decode_cells, lean loop)
  (d) full seq decode, n_seq=1 (shard_map program on a 1x1 mesh)

If (b) ~= (a), the kernel contract is free and the gap is loop glue in
(d); whatever (b)-(a) shows is the kernel-contract cost itself.

Run ON TPU: python experiments/seq_gap.py
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

K, B, W, ITERS = 6144, 1024, 256, 6


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_kernel(boundary: bool, reps: int = 64) -> float:
    from turbotpu.harness.bench import measure_roundtrip
    from turbotpu.siso.pallas_kernel import siso_cells, to_cells, _round_up

    KT = K + 3
    KTp = _round_up(KT, W)
    n_win = KTp // W
    rng = np.random.default_rng(0)
    st = jax.device_put(tuple(
        to_cells(jnp.asarray(rng.normal(size=(B, KTp)) * 4, jnp.bfloat16))
        for _ in range(3)))
    cells = st[0].shape[0]
    ck0 = jnp.zeros((cells, n_win, 8, 8, 128), jnp.float32)
    e0 = jnp.concatenate([jnp.zeros((cells, 1, 8, 128), jnp.float32),
                          jnp.full((cells, 7, 8, 128), -1e9, jnp.float32)],
                         axis=1)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(ls, lp, la, n: int):
        def body(i, carry):
            la, ck, edge, acc = carry
            if boundary:
                le, aout, eout, bout = siso_cells(
                    ls, lp, la, K, "maxlog", 0.75,
                    nii_boundaries=(ck, edge, e0), window=W)
                ck, edge = aout, eout
                s = (le[0, 0, 0, 0].astype(jnp.float32)
                     + bout[0, 0, 0, 0] * 0.0)
            else:
                le, ck = siso_cells(ls, lp, la, K, "maxlog", 0.75,
                                    nii_ckpt=ck, window=W)
                s = le[0, 0, 0, 0].astype(jnp.float32)
            return la + (s * 0).astype(la.dtype), ck, edge, acc + s
        _, _, _, acc = jax.lax.fori_loop(
            0, n, body, (la, ck0, e0, jnp.float32(0)))
        return acc

    floor = measure_roundtrip()
    float(run(*st, reps))
    wall = min(_timed(lambda: float(run(*st, reps))) for _ in range(3))
    return max(wall - floor, 1e-9) / reps


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    ta = bench_kernel(False)
    tb = bench_kernel(True)
    out = {
        "plain_nii_ms_per_half_iter": ta * 1e3,
        "boundary_nii_ms_per_half_iter": tb * 1e3,
        "kernel_contract_overhead_pct": 100 * (tb - ta) / ta,
    }
    # Full-decode context: 12 half-iterations/decode.
    out["kernel_only_decode_ms"] = {"plain": 12 * ta * 1e3,
                                    "boundary": 12 * tb * 1e3}
    print(json.dumps(out, indent=1))
    with open("experiments/seq_gap.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

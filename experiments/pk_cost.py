"""Micro-benchmarks isolating Pallas SISO kernel cost components on TPU.

Variants (all over the same (KTp, 8, 128) branch-metric stream):
  alpha       -- pure forward recursion, nothing stored
  alpha_st8   -- + per-step alpha store as 8 separate (8,128) writes
  alpha_st1   -- + per-step alpha store as one stacked (8,8,128) write
  alpha_nr    -- pure recursion, no renorm at all
Run: python experiments/pk_cost.py [K] [B]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from turbotpu.siso.pallas_kernel import (_alpha_step, _init_e0, _renorm,
                                         UNROLL)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
KTp = -(-(K + 3) // 128) * 128
W = 128
n_win = KTp // W
n_sub = W // UNROLL
MODE = "maxlog"


def make(variant):
    def kernel(a_hbm, p_hbm, out, a_buf, p_buf, aw, a_sem, p_sem):
        cell = pl.program_id(0)

        def start(slot, w):
            pltpu.make_async_copy(a_hbm.at[cell, pl.ds(w * W, W)],
                                  a_buf.at[slot], a_sem.at[slot]).start()
            pltpu.make_async_copy(p_hbm.at[cell, pl.ds(w * W, W)],
                                  p_buf.at[slot], p_sem.at[slot]).start()

        def wait(slot, w):
            pltpu.make_async_copy(a_hbm.at[cell, pl.ds(w * W, W)],
                                  a_buf.at[slot], a_sem.at[slot]).wait()
            pltpu.make_async_copy(p_hbm.at[cell, pl.ds(w * W, W)],
                                  p_buf.at[slot], p_sem.at[slot]).wait()

        start(0, 0)

        def wbody(w, alpha):
            slot = jax.lax.rem(w, 2)

            @pl.when(w + 1 < n_win)
            def _():
                start(jax.lax.rem(w + 1, 2), w + 1)
            wait(slot, w)

            def body(i, alpha):
                ca = a_buf[slot, pl.ds(i * UNROLL, UNROLL)]
                cp = p_buf[slot, pl.ds(i * UNROLL, UNROLL)]
                for j in range(UNROLL):
                    if variant == "alpha_st8":
                        t = i * UNROLL + j
                        for s in range(8):
                            aw[t, s] = alpha[s]
                    elif variant == "alpha_st1":
                        t = i * UNROLL + j
                        aw[t] = jnp.stack(alpha)
                    alpha = _alpha_step(alpha, ca[j], cp[j], MODE)
                if variant == "alpha_nr":
                    return alpha
                return _renorm(alpha)

            return jax.lax.fori_loop(0, n_sub, body, alpha)

        alpha = jax.lax.fori_loop(0, n_win, wbody, _init_e0())
        for s in range(8):
            out[s] = alpha[s]

    n_cells = B // 1024
    return pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W, 8, 128), jnp.float32),
            pltpu.VMEM((2, W, 8, 128), jnp.float32),
            pltpu.VMEM((W, 8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def bench(name, fn, A, P):
    g = jax.jit(lambda a, p: fn(a, p).sum())
    t0 = time.perf_counter()
    float(g(A, P))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(4):
            x = g(A, P)
            acc = x if acc is None else acc + x
        float(acc)
        best = min(best, (time.perf_counter() - t0) / 4)
    ns_per_step = best / KTp / (B // 1024) * 1e9
    print(f"{name:10s} compile {compile_s:6.1f}s  per-call {best*1e3:7.2f} ms "
          f"  {ns_per_step:6.1f} ns/step/cell (~{ns_per_step*0.94:.0f} cyc)",
          flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    n_cells = B // 1024
    A = jnp.asarray(rng.normal(size=(n_cells, KTp, 8, 128)) * 4, jnp.float32)
    P = jnp.asarray(rng.normal(size=(n_cells, KTp, 8, 128)) * 4, jnp.float32)
    A, P = jax.device_put((A, P))
    import os
    vs = os.environ.get("PK_VARIANTS", "alpha,alpha_nr,alpha_st8,alpha_st1").split(",")
    for v in vs:
        bench(v, make(v), A, P)

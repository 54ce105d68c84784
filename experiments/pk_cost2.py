"""Second-stage isolation: is the slowness the recursion, the VMEM row
reads, or the windowed-DMA structure?  Uses K=1024 so A/P fit in VMEM with
no manual DMA at all.

  flat        -- VMEM inputs, single fori over steps, row reads per step
  flat_noread -- same recursion but reuses one row (no per-step VMEM reads)
  flat_chunk  -- reads an UNROLL-row chunk per body, static in-chunk index
  flat_u32    -- like flat_chunk but UNROLL=32
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from turbotpu.siso.pallas_kernel import _alpha_step, _init_e0, _renorm

K = 1024
KTp = 1152
MODE = "maxlog"


def make(variant, unroll=8):
    n_sub = KTp // unroll

    def kernel(a_ref, p_ref, out):
        def body(i, alpha):
            if variant == "flat_noread":
                ca = a_ref[0]
                cp = p_ref[0]
                for j in range(unroll):
                    alpha = _alpha_step(alpha, ca, cp, MODE)
            elif variant == "flat":
                for j in range(unroll):
                    t = i * unroll + j
                    alpha = _alpha_step(alpha, a_ref[t], p_ref[t], MODE)
            else:  # flat_chunk
                ca = a_ref[pl.ds(i * unroll, unroll)]
                cp = p_ref[pl.ds(i * unroll, unroll)]
                for j in range(unroll):
                    alpha = _alpha_step(alpha, ca[j], cp[j], MODE)
            return _renorm(alpha)

        alpha = jax.lax.fori_loop(0, n_sub, body, _init_e0())
        for s in range(8):
            out[s] = alpha[s]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
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
        for _ in range(8):
            x = g(A, P)
            acc = x if acc is None else acc + x
        float(acc)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"{name:12s} compile {compile_s:6.1f}s  per-call {best*1e3:7.3f} ms "
          f"  {best/KTp*1e9:6.1f} ns/step", flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(KTp, 8, 128)) * 4, jnp.float32)
    P = jnp.asarray(rng.normal(size=(KTp, 8, 128)) * 4, jnp.float32)
    A, P = jax.device_put((A, P))
    bench("flat", make("flat"), A, P)
    bench("flat_noread", make("flat_noread"), A, P)
    bench("flat_chunk", make("flat_chunk"), A, P)
    bench("flat_u32", make("flat_chunk", 32), A, P)

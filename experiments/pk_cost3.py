"""Clean kernel timing: R invocations inside one on-device fori_loop, so
host/axon dispatch overhead is paid once.  Also times an empty kernel to
quantify fixed per-call overhead.

  empty      -- kernel that writes one tile
  flat       -- K=1024 alpha recursion (VMEM inputs)
  flat6k     -- K=6144-shaped windowed alpha (the production structure)
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

MODE = "maxlog"


def make_flat(KTp, unroll=8):
    n_sub = KTp // unroll

    def kernel(a_ref, p_ref, out):
        def body(i, alpha):
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


def make_empty():
    def kernel(a_ref, out):
        out[:] = a_ref[:] * 2.0

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )


def bench_repeated(name, fn, args, R, steps):
    @jax.jit
    def run(*a):
        def body(i, acc):
            out = fn(*a)
            return acc + out.reshape(-1)[0]
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    per_call = best / R
    print(f"{name:10s} compile {compile_s:5.1f}s  {per_call*1e6:9.1f} us/call"
          + (f"  {per_call/steps*1e9:7.1f} ns/step" if steps else ""),
          flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    mk = lambda *s: jax.device_put(jnp.asarray(rng.normal(size=s) * 4, jnp.float32))
    bench_repeated("empty", make_empty(), (mk(8, 128),), 256, None)
    KTp = 1152
    bench_repeated("flat", make_flat(KTp), (mk(KTp, 8, 128), mk(KTp, 8, 128)),
                   32, KTp)
    bench_repeated("flat_u16", make_flat(KTp, 16),
                   (mk(KTp, 8, 128), mk(KTp, 8, 128)), 32, KTp)

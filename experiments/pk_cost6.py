"""Ground truth via profiler + hoisting-proof straight-line kernels.

Kernels with N straight-line dependent ops (no loops), each call fed a
DIFFERENT input (prevents loop-invariant hoisting); wall time per call
measured over individually fetched results, and a profiler trace captured
for direct device-time inspection.
"""

import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(n_ops):
    def kernel(x_ref, out):
        v = x_ref[:]
        c = v * 0.5
        for _ in range(n_ops):
            v = jnp.maximum(v + c, v)
        out[:] = v

    return jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ))


def bench(n_ops):
    fn = make(n_ops)
    xs = [jax.device_put(jnp.full((8, 128), 1e-7 * (i + 1), jnp.float32))
          for i in range(8)]
    float(fn(xs[0])[0, 0])
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        float(fn(xs[i])[0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"N={n_ops:5d}: best wall {best*1e6:9.1f} us "
          f" -> {best/ (2*n_ops) *1e9:8.1f} ns/op (incl fixed overhead)",
          flush=True)
    return fn, xs


if __name__ == "__main__":
    for n in (16, 256, 2048):
        fn, xs = bench(n)
    # profile the N=2048 kernel
    with jax.profiler.trace("/tmp/pk6trace"):
        for i in range(4):
            float(fn(xs[i])[0, 0])
    print("trace written", flush=True)

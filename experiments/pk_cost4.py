"""Raw VPU dependency-latency probe inside a Pallas kernel.

dep1   -- one chain of dependent (8,128) ops
depN   -- N independent chains interleaved (N = 2, 4, 8)
Reports ns per vector op; if depN >> dep1/N the VPU is latency-bound and
the SISO kernel should interleave independent batch cells.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 2048
UNROLL = 16


def make(n_chains):
    def kernel(x_ref, out):
        chains = [x_ref[:] + float(i) for i in range(n_chains)]
        c = x_ref[:]

        def body(i, chains):
            new = list(chains)
            for _ in range(UNROLL):
                new = [jnp.maximum(v + c, v) for v in new]
            return tuple(new)

        chains = jax.lax.fori_loop(0, STEPS // UNROLL, body, tuple(chains))
        acc = chains[0]
        for v in chains[1:]:
            acc = acc + v
        out[:] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )


def bench(name, fn, x, n_chains, R=16):
    @jax.jit
    def run(a):
        def body(i, acc):
            return acc + fn(a)[0, 0]
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    float(run(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    per_call = best / R
    n_ops = STEPS * 2 * n_chains  # add + max per chain per step
    print(f"{name:8s} {per_call*1e6:8.1f} us/call  {per_call/n_ops*1e9:6.2f} ns/op"
          f"  ({per_call/STEPS*1e9:7.1f} ns/step)", flush=True)


if __name__ == "__main__":
    x = jax.device_put(jnp.ones((8, 128), jnp.float32) * 1e-6)
    for n in (1, 2, 4, 8, 16):
        bench(f"dep{n}", make(n), x, n)

"""Does Pallas vector-op cost depend on operand size?

Chains of dependent max(v+c, v) ops on (R, 128) operands for growing R,
plus a straight-line (no fori) variant to exclude loop overhead.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 512


def make(R, straightline=False):
    def kernel(x_ref, out):
        v = x_ref[:]
        c = v * 0.5
        if straightline:
            for _ in range(STEPS):
                v = jnp.maximum(v + c, v)
        else:
            def body(i, v):
                for _ in range(16):
                    v = jnp.maximum(v + c, v)
                return v
            v = jax.lax.fori_loop(0, STEPS // 16, body, v)
        out[:] = v

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
    )


def bench(name, fn, x, reps=16):
    @jax.jit
    def run(a):
        def body(i, acc):
            return acc + fn(a)[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    float(run(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    per_op = best / reps / (2 * STEPS)
    print(f"{name:14s} {per_op*1e9:8.1f} ns/op "
          f"({per_op/ (x.shape[0]*128) *1e12:6.2f} ps/elem)", flush=True)


if __name__ == "__main__":
    for R in (8, 64, 256):
        x = jax.device_put(jnp.full((R, 128), 1e-7, jnp.float32))
        bench(f"fori_R{R}", make(R), x)
    x = jax.device_put(jnp.full((8, 128), 1e-7, jnp.float32))
    bench("straight_R8", make(8, True), x)
    x = jax.device_put(jnp.full((256, 128), 1e-7, jnp.float32))
    bench("straight_R256", make(256, True), x)

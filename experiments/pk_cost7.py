"""Trustworthy kernel timing: R chained invocations on device, input
depends on previous output (no hoisting possible), ONE host fetch total.
Round-trip overhead (~35-40 ms) measured separately and subtracted.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from turbotpu.siso.pallas_kernel import _build_call

K = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
R = int(sys.argv[2]) if len(sys.argv) > 2 else 64
KTp = -(-(K + 3) // 128) * 128
MODE = "maxlog"


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(1, KTp, 8, 128)) * 4, jnp.float32)
    P = jnp.asarray(rng.normal(size=(1, KTp, 8, 128)) * 4, jnp.float32)
    A, P = jax.device_put((A, P))
    call = _build_call(1, KTp, 128, MODE, False)

    @jax.jit
    def run(A, P):
        def body(i, carry):
            A, acc = carry
            le = call(A, P)
            s = le[0, 0, 0, 0]
            # Chain: next input depends on this output (defeats hoisting),
            # cost of the add is one 25MB elementwise pass.
            A = A + s * 0.0
            return A, acc + s
        A, acc = jax.lax.fori_loop(0, R, body, (A, jnp.float32(0)))
        return acc

    # Round-trip floor: trivial jitted op, individually fetched.
    t = jax.jit(lambda x: x + 1.0)
    float(t(jnp.float32(0)))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(t(jnp.float32(_)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"round-trip floor {floor*1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    float(run(A, P))
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(A, P))
        best = min(best, time.perf_counter() - t0)
    per_call = (best - floor) / R
    print(f"K={K} R={R}: total {best*1e3:.1f} ms -> per half-iteration "
          f"{per_call*1e3:.3f} ms ({per_call/(3*KTp)*1e9:.1f} ns/step-pass; "
          f"1024 cw -> {1024*K/per_call/1e6:.0f} Mbit/s/chip/half-iter)",
          flush=True)


if __name__ == "__main__":
    main()

"""Where does decode time go: fused kernel vs interleave gathers vs
L/hard/freeze bookkeeping.  Chained on-device reps, one host fetch,
round-trip floor subtracted (same discipline as harness.bench)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.decoder.turbo_cells import turbo_decode_cells
from turbotpu.siso.pallas_kernel import siso_cells, to_cells, _round_up, window_len
from turbotpu.spec.qpp import qpp_perm, qpp_inv

K, B, ITERS = 6144, 1024, 6
DT = jnp.bfloat16
KT = K + 3
W = window_len(KT)
KTp = _round_up(KT, W)


def floor_ms():
    t = jax.jit(lambda x: x + 1.0)
    float(t(jnp.float32(0)))
    best = 1e9
    for i in range(5):
        t0 = time.perf_counter()
        float(t(jnp.float32(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, args, reps):
    run = fn(reps)
    fl = floor_ms()
    float(run(*args))  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return (best - fl) / reps


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, KTp)) * 4, DT)
    ls1, lp1, ls2, lp2 = (to_cells(mk()) for _ in range(4))
    perm = np.asarray(qpp_perm(K), np.int32)
    inv = np.asarray(qpp_inv(K), np.int32)
    ext = np.arange(K, KTp, dtype=np.int32)
    perm_e = jnp.asarray(np.concatenate([perm, ext]))
    inv_e = jnp.asarray(np.concatenate([inv, ext]))
    args = jax.device_put((ls1, lp1, ls2, lp2))

    # (a) kernels only: 2*ITERS chained siso_cells
    def mk_kernels(reps):
        @jax.jit
        def run(ls1, lp1, ls2, lp2):
            def body(i, carry):
                la, acc = carry
                le1 = siso_cells(ls1, lp1, la, K, "maxlog", 0.75)
                le2 = siso_cells(ls2, lp2, le1, K, "maxlog", 0.75)
                s = le2[0, 0, 0, 0].astype(jnp.float32)
                return le2 + (s * 0).astype(le2.dtype), acc + s
            la0 = jnp.zeros_like(ls1)
            _, acc = jax.lax.fori_loop(0, reps * ITERS, body,
                                       (la0, jnp.float32(0)))
            return acc
        return run

    # (b) kernels + gathers (the lean body)
    def mk_kg(reps):
        @jax.jit
        def run(ls1, lp1, ls2, lp2):
            def body(i, carry):
                la, acc = carry
                le1 = siso_cells(ls1, lp1, la, K, "maxlog", 0.75)
                le2 = siso_cells(ls2, lp2, le1[:, perm_e], K, "maxlog", 0.75)
                la = le2[:, inv_e]
                s = la[0, 0, 0, 0].astype(jnp.float32)
                return la + (s * 0).astype(la.dtype), acc + s
            la0 = jnp.zeros_like(ls1)
            _, acc = jax.lax.fori_loop(0, reps * ITERS, body,
                                       (la0, jnp.float32(0)))
            return acc
        return run

    # (c) full current turbo_decode_cells
    cfg = DecoderConfig(K=K, n_iters=ITERS, mode="maxlog", ext_scale=0.75,
                        siso="pallas", io_dtype="bfloat16")
    from turbotpu.harness.bench import make_decode_inputs
    full_in = jax.device_put(make_decode_inputs(K, B))

    def mk_full(reps):
        @jax.jit
        def run(ls, lp1_, lp2_, t1, t2):
            def body(i, carry):
                (ls, a, b, c, d), acc = carry
                hard, iters, L = turbo_decode_cells(ls, a, b, c, d, cfg)
                s = L[0, 0] + iters[0].astype(L.dtype)
                return (ls + s * 0.0, a, b, c, d), acc + s
            _, acc = jax.lax.fori_loop(0, reps, body,
                                       ((ls, lp1_, lp2_, t1, t2),
                                        jnp.float32(0)))
            return acc
        return run

    ta = timeit(mk_kernels, args, 8)
    print(f"(a) kernels only      : {ta*1e3:8.3f} ms/decode "
          f"-> {B*K/ta/1e9:.2f} Gbit/s", flush=True)
    tb = timeit(mk_kg, args, 8)
    print(f"(b) kernels + gathers : {tb*1e3:8.3f} ms/decode "
          f"-> {B*K/tb/1e9:.2f} Gbit/s", flush=True)
    tc = timeit(mk_full, full_in, 8)
    print(f"(c) full decode       : {tc*1e3:8.3f} ms/decode "
          f"-> {B*K/tc/1e9:.2f} Gbit/s", flush=True)
    print(f"glue beyond gathers: {(tc-tb)*1e3:.3f} ms "
          f"({(tc-tb)/tc*100:.0f}% of total)")


if __name__ == "__main__":
    main()

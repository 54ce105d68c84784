"""Scaling-efficiency benchmark: samples/s at 1 chip vs N chips
(SURVEY.md section 3, component 30; BASELINE target >= 85 %).

Runs the data-parallel sharded decode over meshes of growing size and
reports throughput per configuration plus efficiency relative to the
single-device run scaled linearly.  On a single-chip environment this
measures the real thing only for n=1; larger meshes exercise the identical
shard_map code on fake CPU devices (structure check), and the same harness
runs unchanged on a real multi-chip slice.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..decoder.turbo import DecoderConfig, turbo_decode
from ..dist.mesh import make_mesh
from .bench import make_decode_inputs, measure_chained, measure_roundtrip


def bench_scaling(cfg: DecoderConfig, per_device_batch: int,
                  device_counts: list[int] | None = None,
                  n_timed: int = 8, seed: int = 0) -> list[dict]:
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    floor = measure_roundtrip()
    out = []
    base = None
    for n in device_counts:
        mesh = make_mesh(data=n, seq=1)
        B = per_device_batch * n
        spec = NamedSharding(mesh, P(("data",), None))
        inputs = [jax.device_put(x, spec)
                  for x in make_decode_inputs(cfg.K, B, seed)]

        @jax.jit
        def run(ls, lp1, lp2, t1, t2, reps):
            def body(i, carry):
                (ls, lp1, lp2, t1, t2), acc = carry
                hard, iters, L = turbo_decode(ls, lp1, lp2, t1, t2, cfg)
                s = L[0, 0] + iters[0].astype(L.dtype)
                return (ls + s * 0.0, lp1, lp2, t1, t2), acc + s
            carry, acc = jax.lax.fori_loop(
                0, reps, body, (tuple([ls, lp1, lp2, t1, t2]), jnp.float32(0)))
            return acc

        float(run(*inputs, jnp.int32(1)))
        # Rep-scaled timing (compute >= 5x the tunnel floor before the
        # floor is subtracted) -- same discipline as bench_decode.
        wall, _ = measure_chained(
            lambda r: float(run(*inputs, jnp.int32(r))), n_timed, floor)
        mbps = B * cfg.K / wall / 1e6
        if base is None:
            base = mbps
        out.append({
            "devices": n, "B": B, "mbit_per_s": mbps,
            "efficiency": mbps / (base * n),
        })
    return out

"""Pallas remote-DMA boundary exchange (dist/dma.py) vs lax.ppermute.

Interpret mode executes the same remote-copy semantics on the fake-device
CPU mesh, so these tests validate the actual kernel program that lowers
to TPU remote DMAs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from turbotpu.dist.dma import boundary_exchange_dma


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("seq",))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_matches_ppermute_ring(n):
    mesh = _mesh(n)
    B = 16
    fwd = jnp.arange(n * B * 8, dtype=jnp.float32).reshape(n * B, 8)
    bwd = -fwd

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P("seq"),) * 2,
                       out_specs=(P("seq"),) * 4, check_vma=False)
    def run(f, b):
        fr, br = boundary_exchange_dma(f, b, "seq")
        n_ = jax.lax.axis_size("seq")
        fp = jax.lax.ppermute(f, "seq", [(i, (i + 1) % n_) for i in range(n_)])
        bp = jax.lax.ppermute(b, "seq", [((i + 1) % n_, i) for i in range(n_)])
        return fr, br, fp, bp

    fr, br, fp, bp = run(fwd, bwd)
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(fp))
    np.testing.assert_array_equal(np.asarray(br), np.asarray(bp))


def test_iterated_exchange_in_while_loop():
    """The decode-loop usage pattern: stacked two-SISO payloads exchanged
    repeatedly inside a lax.while_loop (semaphore reuse across trips);
    must track the ppermute reference over every iteration."""
    n, iters = 4, 5
    mesh = _mesh(n)
    x = jnp.arange(n * 2 * 8 * 8, dtype=jnp.float32).reshape(n * 2, 8, 8)

    def loop(f, b, use_dma):
        n_ = jax.lax.axis_size("seq")

        def body(c):
            i, f, b = c
            if use_dma:
                f, b = boundary_exchange_dma(f, b, "seq")
            else:
                f = jax.lax.ppermute(
                    f, "seq", [(k, (k + 1) % n_) for k in range(n_)])
                b = jax.lax.ppermute(
                    b, "seq", [((k + 1) % n_, k) for k in range(n_)])
            return i + 1, f + 1.0, b - 1.0

        _, f, b = jax.lax.while_loop(lambda c: c[0] < iters, body,
                                     (jnp.int32(0), f, b))
        return f, b

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P("seq"),) * 2,
                       out_specs=(P("seq"),) * 4, check_vma=False)
    def run(f, b):
        fd, bd = loop(f, b, True)
        fp, bp = loop(f, b, False)
        return fd, bd, fp, bp

    fd, bd, fp, bp = run(x, -x)
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(fp))
    np.testing.assert_array_equal(np.asarray(bd), np.asarray(bp))


def _decode_both_xch(nii: bool):
    import dataclasses

    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.dist.mesh import make_mesh
    from turbotpu.harness.bench import make_decode_inputs
    from turbotpu.dist.seq_parallel import decode_seq_sharded

    mesh = make_mesh(data=2, seq=4)
    cfg = DecoderConfig(K=168, n_iters=2, mode="maxlog", siso="pallas",
                        early_term="crc", nii=nii)
    inputs = make_decode_inputs(168, 8, seed=3)
    outs = []
    for xch in ("ppermute", "dma"):
        dec = decode_seq_sharded(mesh, dataclasses.replace(
            cfg, boundary_xch=xch))
        hard, iters, L = dec(*inputs)
        outs.append((np.asarray(hard), np.asarray(iters), np.asarray(L)))
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("nii", [False, True])
def test_seq_decode_dma_matches_ppermute_fake_mesh(nii):
    """boundary_xch='dma' through the production ('data','seq') decode on
    the fake mesh: under interpret the call takes the documented
    semantics-identical ppermute fallback (jax cannot discharge multi-axis
    remote DMA), so this covers the full production call path -- payload
    stacking and NII edge rolling included -- and must match the ppermute
    branch bit-for-bit."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    _decode_both_xch(nii)


@pytest.mark.tpu
def test_seq_decode_dma_equals_ppermute_tpu():
    """Same comparison with the REAL remote-DMA kernel (logical-id
    arithmetic + barrier semaphore); needs a real multi-chip mesh."""
    if len(jax.devices()) < 8 or jax.default_backend() != "tpu":
        pytest.skip("needs 8 real TPU devices")
    _decode_both_xch(False)
    _decode_both_xch(True)

"""Pallas remote-DMA boundary exchange (SURVEY.md section 3, component 23
optional path; section 8 hard part 5).

The NII window-boundary alpha/beta metrics exchanged between neighboring
'seq' shards each half-iteration are tiny (8 state metrics per codeword
per edge) -- latency-bound on ICI/DCN.  `lax.ppermute` issues one
collective per tensor; this module instead ships BOTH directions in ONE
Pallas kernel with two `pltpu.make_async_remote_copy` DMAs in flight
simultaneously (forward alpha payload to shard j+1, backward beta payload
to shard j-1), the TPU-native analog of overlapping send/recv pairs.
Payloads for the two SISOs are stacked so a full iteration's boundary
traffic is two DMAs instead of four collectives.

Kernel-validated against `lax.ppermute` on the fake-device CPU mesh
(interpret mode executes the same remote-DMA semantics; tests/dist).
Opt in with DecoderConfig(boundary_xch="dma") on the seq-parallel path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xch_kernel(axis_name, multi_axis, fwd_ref, bwd_ref, fwd_out, bwd_out,
                s_f, r_f, s_b, r_b):
    my = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    nxt = jax.lax.rem(my + 1, n)
    prv = jax.lax.rem(my + n - 1, n)
    if multi_axis:
        # Dict device ids (MESH type): unnamed axes keep the caller's own
        # coordinate, composing with a multi-axis ('data','seq') mesh on
        # hardware.  jax's interpret-mode discharge cannot execute this
        # form (single-named-axis limitation), so CI covers the kernel on
        # a seq-only mesh via the LOGICAL branch below and the multi-axis
        # composition is exercised by the tpu-marked decode test.
        mk = lambda dev: dict(device_id={axis_name: dev},
                              device_id_type=pltpu.DeviceIdType.MESH)
    else:
        mk = lambda dev: dict(device_id=dev,
                              device_id_type=pltpu.DeviceIdType.LOGICAL)
    fwd = pltpu.make_async_remote_copy(
        src_ref=fwd_ref, dst_ref=fwd_out, send_sem=s_f, recv_sem=r_f,
        **mk(nxt))
    bwd = pltpu.make_async_remote_copy(
        src_ref=bwd_ref, dst_ref=bwd_out, send_sem=s_b, recv_sem=r_b,
        **mk(prv))
    # Both directions in flight before either wait: the two transfers
    # overlap on the wire instead of serializing like two collectives.
    fwd.start()
    bwd.start()
    fwd.wait()
    bwd.wait()


@functools.partial(jax.jit, static_argnames=("axis_name", "multi_axis"))
def boundary_exchange_dma(fwd_payload: jax.Array, bwd_payload: jax.Array,
                          axis_name: str = "seq",
                          multi_axis: bool = False):
    """Ring-shift fwd_payload to shard j+1 and bwd_payload to shard j-1.

    Drop-in for the (ppermute(+1), ppermute(-1)) pair on a named mesh
    axis; call from inside shard_map.  Payload shapes are arbitrary
    (boundary metrics are small -- they live in VMEM end to end).
    Set multi_axis=True when the enclosing mesh has named axes besides
    `axis_name` (selects MESH-dict device ids).  Returns
    (fwd_received, bwd_received).
    """
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_xch_kernel, axis_name, multi_axis),
        out_shape=(jax.ShapeDtypeStruct(fwd_payload.shape,
                                        fwd_payload.dtype),
                   jax.ShapeDtypeStruct(bwd_payload.shape,
                                        bwd_payload.dtype)),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 4,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(fwd_payload, bwd_payload)

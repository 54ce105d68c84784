"""Data-parallel batched decode: codeword batch sharded over the 'data'
mesh axis via shard_map (SURVEY.md section 3, component 22).

Each shard decodes its local codewords independently (turbo decoding has no
cross-codeword coupling); error counters reduce with psum so every host
sees global counts without gathering decoded bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..decoder.turbo import DecoderConfig, turbo_decode


def decode_batch_sharded(mesh: jax.sharding.Mesh, cfg: DecoderConfig):
    """Returns a jitted fn(ls, lp1, lp2, tail1, tail2) -> (hard, iters, L)
    with the batch axis sharded over 'data' (and replicated over 'seq')."""
    spec = P(("data",), None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, P(("data",)), spec), check_vma=False)
    def fn(ls, lp1, lp2, t1, t2):
        return turbo_decode(ls, lp1, lp2, t1, t2, cfg)

    return fn


def count_errors_sharded(mesh: jax.sharding.Mesh):
    """Global (bit_errs, frame_errs) via psum over the mesh."""
    spec = P(("data",), None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec), out_specs=(P(), P()), check_vma=False)
    def fn(hard, ref):
        bit = jnp.sum(hard != ref, dtype=jnp.int32)
        frame = jnp.sum(jnp.any(hard != ref, axis=1), dtype=jnp.int32)
        # Inputs are REPLICATED over 'seq' (every seq shard holds the same
        # rows and computes the same local count), so the reduction runs
        # over 'data' only -- psum'ing over 'seq' too would multiply the
        # counts by n_seq (a real bug this comment marks the grave of:
        # it inflated FER above 1.0 on seq>1 CPU meshes).  The psum over
        # 'data' already leaves the result identical on every shard, which
        # is what the replicated out_spec requires.
        bit = jax.lax.psum(bit, "data")
        frame = jax.lax.psum(frame, "data")
        return bit, frame

    return fn

"""Fully on-device batched turbo decode loop (SURVEY.md section 4.2).

The CUDA reference's host loop (kernel launches per half-iteration, early
-exit flag copied to host) becomes a single jitted `lax.fori_loop`: no host
round-trips inside the iteration loop; converged codewords are frozen
branchlessly with per-codeword masks (component 20).

Inputs are the canonical codeword format of golden/numpy_ref.py, batched:
ls, lp1, lp2: (B, K); tail1, tail2: (B, 6).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import crc as crc_mod
from ..spec.qpp import qpp_inv, qpp_perm
from ..spec.umts import umts_inv, umts_perm
from .early_term import crc_ok_batch, make_crc_matrix
from ..siso.scan import siso_decode_scan

SisoFn = Callable[..., tuple[jax.Array, jax.Array]]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Static decode configuration (hashable: used as a jit static arg)."""
    K: int
    n_iters: int = 8
    mode: str = "logmap"            # "logmap" | "maxlog" | "linlog"
                                    # (linlog: piecewise-linear Jacobian
                                    # correction -- log-MAP-grade BER at
                                    # ~1.9x its speed; RESULTS.md matrix)
    ext_scale: float | None = None  # extrinsic scaling; None resolves to
                                    # 0.75 for maxlog (recovers ~0.2-0.3 dB,
                                    # SURVEY.md section 1.1), 1.0 otherwise
    interleaver: str = "lte"        # "lte" (QPP) | "umts"
    early_term: str = "none"        # "none" | "crc" | "sign"
    crc_poly: int = crc_mod.CRC24A_POLY
    siso: str = "scan"              # "scan" | "ascan" | "pallas" | "window"
    window: int = 0                 # sliding-window length (0 = full block)
    io_dtype: str = "float32"       # LLR/extrinsic HBM dtype on the Pallas
                                    # cells path ("bfloat16" halves traffic
                                    # on the bandwidth-bound kernel;
                                    # metrics stay fp32)
    ext_dtype: str = ""             # extrinsic-stream HBM dtype (la/le) on
                                    # the Pallas cells path; "" inherits
                                    # io_dtype.  "float8_e4m3fn" or "int8"
                                    # halves the interleave-gather bytes --
                                    # the dominant non-kernel decode cost
                                    # (round-3 VERDICT item 1); metrics and
                                    # the exchange math stay fp32 in VMEM
    ext_qscale: float = 0.25        # int8 extrinsic quantization step
                                    # (LLR units per code); range +-31.75.
                                    # Ignored unless ext_dtype == "int8"
    boundary_xch: str = "ppermute"  # seq-parallel boundary-metric
                                    # exchange: "ppermute" (XLA collective)
                                    # | "dma" (one Pallas kernel, both ring
                                    # directions' remote DMAs in flight --
                                    # dist/dma.py, component 23 optional)
    seq_groups: int = 1             # seq-parallel software pipelining:
                                    # split each shard's local batch into
                                    # this many independent cell groups so
                                    # XLA's async-collective scheduler can
                                    # overlap group g's extrinsic
                                    # all_to_all with group g+1's chunk
                                    # kernel (round-3 VERDICT item 2b).
                                    # Coerced to 1 unless the local batch
                                    # is a whole number of 1024-row cells
                                    # per group AND boundary_xch is
                                    # ppermute (the dma barrier protocol
                                    # assumes one boundary round per half
                                    # -iteration); see
                                    # dist.seq_parallel.effective_seq_groups.
                                    # Needs local batch >= groups*1024;
                                    # silently 1 otherwise
    nii: bool = False               # Pallas path: skip the exact phase-1
                                    # alpha pass; window-start alphas inherit
                                    # from the previous half-iteration
                                    # (next-iteration initialization).
                                    # ~25-30% faster; BER validated within
                                    # the 0.05 dB bar (tests/ber)
    fold_gather: bool = False       # Pallas+nii shared-interleaver path:
                                    # fold the extrinsic interleave into
                                    # the kernel's la stream (per-row DMA
                                    # through the QPP table, issues
                                    # interleaved with compute) -- each
                                    # SISO reads the other's RAW extrinsic
                                    # output, eliminating the materialized
                                    # per-half-iteration HBM gathers
                                    # (round-3 VERDICT item 1)

    def perm(self) -> np.ndarray:
        return qpp_perm(self.K) if self.interleaver == "lte" else umts_perm(self.K)

    def inv(self) -> np.ndarray:
        return qpp_inv(self.K) if self.interleaver == "lte" else umts_inv(self.K)

    def __post_init__(self):
        if self.nii and self.K >= 4096 and (self.window or 128) < 256:
            import warnings
            warnings.warn(
                f"NII with window={self.window or 128} at K={self.K} was "
                "measured at ~0.06 dB BER penalty -- OUTSIDE the 0.05 dB "
                "conformance bar (RESULTS.md NII table). Use window=256 "
                "(validated at ~0.03 dB) or disable nii.",
                stacklevel=3)

    def ext_io(self) -> tuple[str, float]:
        """(extrinsic HBM dtype, int8 quant step or 0.0) for the Pallas
        cells paths; the quant step only applies to int8 fixed-point."""
        dt = self.ext_dtype or self.io_dtype
        return dt, (self.ext_qscale if dt == "int8" else 0.0)

    def resolved_ext_scale(self) -> float:
        """THE single resolution point for extrinsic scaling (round-1
        VERDICT item 8: the resolution idiom was copy-pasted in four
        places and the None branch was unreachable)."""
        if self.ext_scale is not None:
            return self.ext_scale
        return 0.75 if self.mode == "maxlog" else 1.0


def get_siso(cfg: DecoderConfig) -> SisoFn:
    if cfg.siso == "scan":
        return siso_decode_scan
    if cfg.siso == "ascan":
        from ..siso.ascan import siso_decode_ascan
        return siso_decode_ascan
    if cfg.siso == "pallas":
        from ..siso.pallas_kernel import siso_decode_pallas
        return siso_decode_pallas
    if cfg.siso == "window":
        from ..siso.windowed import make_windowed_siso
        return make_windowed_siso(cfg.window or 128)
    raise ValueError(f"unknown siso impl {cfg.siso!r}")


@functools.partial(jax.jit, static_argnames=("cfg",))
def turbo_decode(ls: jax.Array, lp1: jax.Array, lp2: jax.Array,
                 tail1: jax.Array, tail2: jax.Array,
                 cfg: DecoderConfig,
                 perm_b: jax.Array | None = None,
                 inv_b: jax.Array | None = None,
                 group_tables=None
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode a batch of codewords.

    Returns (hard_bits (B, K) int8, n_iters_run (B,) int32, L (B, K)).

    perm_b / inv_b: optional per-codeword (B, K) int32 interleaver tables
    for TRUE mixed-K batches (bucketing.embedded_perm_tables) -- each
    codeword is gathered through its OWN embedded permutation, so a
    heterogeneous batch of real per-K codewords decodes in one call.
    None (the default) uses the shared cfg.K table.

    group_tables: (perm_g (G, K), inv_g (G, K), gid (B,)) from
    bucketing.grouped_perm_tables -- the fast TPU form of the same
    mixed-K decode for batches with few DISTINCT sizes (G shared row
    gathers + select instead of an elementwise per-codeword gather;
    see turbo_cells).  Mutually exclusive with perm_b/inv_b.
    """
    B, K = ls.shape
    assert K == cfg.K
    if cfg.siso == "pallas":
        # Transpose-free hot loop in the kernel's native cell layout.
        from .turbo_cells import turbo_decode_cells
        return turbo_decode_cells(ls, lp1, lp2, tail1, tail2, cfg,
                                  perm_b=perm_b, inv_b=inv_b,
                                  group_tables=group_tables)
    if group_tables is not None:
        # The scan SISO path keeps the general elementwise gather (fine
        # on CPU/testing); expand the grouped form to per-codeword rows.
        assert perm_b is None and inv_b is None
        perm_g, inv_g, gid = group_tables
        perm_b = jnp.take(perm_g.astype(jnp.int32), gid, axis=0)
        inv_b = jnp.take(inv_g.astype(jnp.int32), gid, axis=0)
    siso = get_siso(cfg)
    scale = cfg.resolved_ext_scale()

    if perm_b is None:
        perm = jnp.asarray(cfg.perm())
        inv = jnp.asarray(cfg.inv())
        g_perm = lambda x: x[:, perm]
        g_inv = lambda x: x[:, inv]
    else:
        g_perm = lambda x: jnp.take_along_axis(x, perm_b, axis=1)
        g_inv = lambda x: jnp.take_along_axis(x, inv_b, axis=1)

    ls1 = jnp.concatenate([ls, tail1[:, 0::2]], axis=1)
    lp1f = jnp.concatenate([lp1, tail1[:, 1::2]], axis=1)
    ls2 = jnp.concatenate([g_perm(ls), tail2[:, 0::2]], axis=1)
    lp2f = jnp.concatenate([lp2, tail2[:, 1::2]], axis=1)

    if cfg.early_term == "crc":
        G = make_crc_matrix(K, cfg.crc_poly)
    else:
        G = None

    def cond(carry):
        it, le21, L_prev, hard_prev, done, iters = carry
        return (it < cfg.n_iters) & ~jnp.all(done)

    def body(carry):
        it, le21, L_prev, hard_prev, done, iters = carry
        _, le1 = siso(ls1, lp1f, le21, mode=cfg.mode)
        le1 = le1 * scale
        _, le2 = siso(ls2, lp2f, g_perm(le1), mode=cfg.mode)
        le2 = le2 * scale
        le21_new = g_inv(le2)
        L_new = ls + le1 + le21_new
        hard_new = (L_new < 0).astype(jnp.int8)

        if cfg.early_term == "crc":
            newly_done = crc_ok_batch(hard_new, G)
        elif cfg.early_term == "sign":
            newly_done = jnp.all(hard_new == hard_prev, axis=1)
        else:
            newly_done = jnp.zeros((B,), bool)

        # Freeze converged codewords branchlessly.
        keep = done[:, None]
        le21 = jnp.where(keep, le21, le21_new)
        L = jnp.where(keep, L_prev, L_new)
        hard = jnp.where(keep, hard_prev, hard_new)
        iters = iters + (~done).astype(jnp.int32)
        done = done | newly_done
        return it + 1, le21, L, hard, done, iters

    init = (jnp.int32(0), jnp.zeros_like(ls), jnp.zeros_like(ls),
            jnp.zeros(ls.shape, jnp.int8), jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32))
    # while_loop: avoids XLA unrolling the iteration loop (compile blowup)
    # and exits early once every codeword in the batch has converged.
    _, le21, L, hard, done, iters = jax.lax.while_loop(cond, body, init)
    return hard, iters, L

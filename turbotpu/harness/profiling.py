"""Profiling / observability hooks (SURVEY.md section 6).

The CUDA reference's nvprof/CUDA-event instrumentation maps to:
- `trace(dir)`: jax.profiler context writing a Perfetto/TensorBoard trace;
- `kernel_ir(fn, *args)`: lowered StableHLO + Mosaic dump for inspection;
- `compile_count_guard()`: asserts no silent recompilation in steady state
  (the perf-test guard of SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def kernel_ir(fn, *args, **kwargs) -> str:
    """Return the StableHLO for a jitted callable on example args."""
    return jax.jit(fn).lower(*args, **kwargs).as_text()


def compiled_stats(fn, *args, **kwargs) -> dict:
    c = jax.jit(fn).lower(*args, **kwargs).compile()
    try:
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
    except Exception:
        an = {}
    return {k: an.get(k) for k in ("flops", "bytes accessed") if an and k in an}


@contextlib.contextmanager
def compile_count_guard(max_new: int = 0):
    """Fails if more than max_new jit compilations happen inside the block."""
    start = _compile_count()
    yield
    new = _compile_count() - start
    assert new <= max_new, f"unexpected recompilation: {new} > {max_new}"


def _compile_count() -> int:
    try:
        from jax._src.monitoring import get_event_count
        return get_event_count("/jax/core/compile/count")
    except Exception:
        try:
            return jax.lib.xla_client._xla.compile_count()  # type: ignore
        except Exception:
            return 0

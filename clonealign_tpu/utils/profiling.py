"""Profiling hooks (SURVEY.md §5: the reference has none; the ELBO trace in
``convergence_info`` plus these helpers are the observability surface)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX/XLA device trace viewable in TensorBoard/Perfetto.

    >>> with trace("/tmp/clonealign-trace"):
    ...     fit = clonealign(Y, L)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", sink=print):
    """Wall-clock a block, blocking on async dispatch at exit."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        # flush any in-flight device work before reading the clock
        (jax.effects_barrier if hasattr(jax, "effects_barrier") else lambda: None)()
        sink(f"{label or 'block'}: {time.perf_counter() - t0:.3f}s")

"""Profiling/tracing utilities.

Capability parity with the reference's three mechanisms (SURVEY.md §5):
fvcore FLOPs analysis → ``compiled_cost`` (XLA cost analysis of the actual
compiled program); wall-clock AverageMeter/runtime_wrapper → ``timed`` and
``TunnelSafeTimer``; dormant per-layer hooks → ``profile_trace`` (jax
profiler, viewable in TensorBoard/XProf).

The TPU in this environment sits behind a tunnel where dispatch returns
before execution and device->host bandwidth is tiny; ``TunnelSafeTimer``
documents the only honest pattern: run K iterations inside one jit and
fetch a scalar.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict


def runtime_wrapper(fn: Callable) -> Callable:
    """Wall-clock decorator (reference: EE/thresh.py:16-22); returns
    (result, seconds)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        return result, time.perf_counter() - t0

    return wrapped


def compiled_cost(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs / bytes of the compiled XLA program for ``fn(*example_args)``.

    The TPU-native replacement for fvcore FlopCountAnalysis
    (EE/analysis.py:17-27): measures the program XLA actually emits,
    including fusion effects.
    """
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    out = {k: float(v) for k, v in dict(cost).items()
           if isinstance(v, (int, float))}
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            out["output_size_bytes"] = float(
                getattr(mem, "output_size_in_bytes", 0)
            )
            out["temp_size_bytes"] = float(
                getattr(mem, "temp_size_in_bytes", 0)
            )
    except Exception:
        pass
    return out


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """jax profiler trace context (open with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class TunnelSafeTimer:
    """Honest device timing through an async-dispatch tunnel.

    Usage: build a jitted ``fn_k`` that runs K iterations internally (e.g.
    lax.scan) and returns a SCALAR; ``measure`` times n_calls invocations,
    forcing completion via the scalar fetch each call.
    """

    def __init__(self, fn_k: Callable, k: int):
        self.fn_k = fn_k
        self.k = k

    def measure(self, *args, n_calls: int = 3, warmup: int = 1) -> Dict[str, float]:
        for _ in range(warmup):
            float(self.fn_k(*args))
        t0 = time.perf_counter()
        for _ in range(n_calls):
            float(self.fn_k(*args))
        dt = time.perf_counter() - t0
        iters = self.k * n_calls
        return {
            "seconds": dt,
            "iterations": iters,
            "sec_per_iteration": dt / iters,
        }

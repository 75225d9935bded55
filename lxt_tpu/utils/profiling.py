"""Tracing and benchmarking helpers (the reference has none — SURVEY.md §5
"Tracing/profiling: none"; TPU-native replacement is the JAX/XLA profiler).

``trace(logdir)`` captures an xprof trace viewable in TensorBoard/XProf;
``annotate`` labels regions inside jitted code via named scopes; ``benchmark``
times a jitted callable with proper device synchronization and fresh-input
handling (TPU dispatch is async — naive timing measures nothing).
"""

import contextlib
import time
from typing import Callable, Iterable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace: ``with trace('/tmp/prof'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler scope (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


def benchmark(fn: Callable, args_stream: Iterable, *, warmup: int = 2,
              iters: Optional[int] = None):
    """Time ``fn`` over a stream of (already device-resident) argument tuples.

    Returns (seconds_per_call, calls_per_second). Distinct inputs per call
    defeat constant-folding/caching; a single block_until_ready at the end
    measures the true pipeline throughput.
    """
    args_list = list(args_stream)
    if iters is None:
        iters = len(args_list) - warmup
    assert iters > 0 and warmup + iters <= len(args_list)

    for i in range(warmup):
        out = fn(*args_list[i])
    jax.block_until_ready(out)

    outs = []
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        outs.append(fn(*args_list[i]))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return dt, 1.0 / dt


#: v5e TensorCore bf16 peak, the MFU denominator for every bench script
PEAK_BF16 = 197e12


def chained_timeit(fn, arg, iters=8, min_window=0.4):
    """Seconds per call of ``fn(arg) -> array-like-arg``, timed by CHAINING
    iterations through a data dependence and draining with one scalar
    fetch. ``block_until_ready`` can return before execution completes on
    remote-attached TPUs (axon tunnel), so wall-clocking n chained calls
    minus one subtracts the fetch overhead exactly. The iteration count
    adapts upward until the measured window covers ``min_window`` seconds —
    for sub-5ms kernels a fixed n leaves the estimate dominated by tunnel
    jitter (observed 2x run-to-run). Single source of truth for bench.py /
    scripts/bench_*.py."""
    import jax.numpy as jnp

    def chain(a, n):
        for _ in range(n):
            a = fn(a)
        return float(jnp.real(jnp.asarray(a)).ravel()[0])

    chain(arg, 1)  # compile + warm
    while True:
        t0 = time.perf_counter(); chain(arg, 1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); chain(arg, 1 + iters)
        tn = time.perf_counter() - t0
        dt = max((tn - t1) / iters, 1e-9)
        if tn - t1 >= min_window or iters >= 4096:
            return dt
        iters = min(4096, max(iters * 2, int(min_window / dt) + 1))


def memory_stats(device=None):
    """Per-device HBM usage snapshot (bytes), or {} if unsupported."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return stats or {}

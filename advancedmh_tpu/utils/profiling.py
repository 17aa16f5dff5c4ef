"""Profiling & instrumentation hooks (SURVEY.md §5 'tracing/profiling').

The reference's only instrumentation is a progress bar; here profiling is
first-class: ``trace()`` wraps ``jax.profiler`` for TensorBoard-viewable
device traces of the sampling kernels, and ``Timer``/``throughput`` give
fenced walltime for honest samples/s numbers. The fence is a dependent
scalar host read, not ``block_until_ready`` — on tunneled TPU backends the
latter can return before the kernel finishes (observed: 0.2 ms for a 50 ms
kernel), silently inflating throughput by orders of magnitude.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def fence(value: Any) -> Any:
    """True completion fence: force a dependent scalar host read of every
    array leaf (one small D2H each) and return ``value``."""
    for leaf in jax.tree_util.tree_leaves(value):
        if hasattr(leaf, "dtype"):
            arr = jnp.ravel(
                jax.random.key_data(leaf)
                if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)
                else leaf
            )
            if arr.size:
                _ = np.asarray(arr[0])
    return value


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace of the enclosed block (view in TensorBoard)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Fenced walltime: blocks on the result before reading the clock."""

    def __init__(self):
        self.elapsed: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0

    def fence(self, value: Any) -> Any:
        """Block until ``value``'s computation is done (call before exit)."""
        return fence(value)


def throughput(fn, *args, iters: int = 3, warmup: int = 1, items: int = 1):
    """Measure items/s of ``fn(*args)`` with compile excluded.

    Runs ``warmup`` untimed calls (compile + cache) then ``iters`` timed
    calls; returns (items_per_s, seconds_per_call).
    """
    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    return items / dt, dt

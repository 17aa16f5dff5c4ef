"""Shared fence-timing helper for the benchmark scripts.

On the remote-TPU tunnel ``jax.block_until_ready`` can return before the
kernel finishes (CLAUDE.md gotcha), so every timed callable must end with a
dependent scalar host read (``float(out[...])``) as the true sync.
"""
import time


def best_of(go, n_trials: int = 3, warm: bool = True):
    """Time ``go(seed)`` over ``n_trials`` seeds and return
    ``(best_seconds, output_of_best_trial)``.

    ``go`` must fence internally with a dependent scalar read. ``warm=True``
    runs ``go(0)`` first (compile + cache warm) outside the timing. The
    returned output comes from the *same* trial as the best time so derived
    metrics (e.g. ESS/s) pair numerator and denominator consistently.
    """
    if warm:
        go(0)
    best, best_out = float("inf"), None
    for i in range(n_trials):
        t0 = time.perf_counter()
        out = go(1 + i)
        dt = time.perf_counter() - t0
        if dt < best:
            best, best_out = dt, out
    return best, best_out

"""Chunked sampling: host offload, per-chunk callbacks, progress.

≙ three reference-runtime capabilities at once (SURVEY.md §5):

- **host offload** for very long runs: 100k-step × 10k-chain outputs do not
  fit in HBM; chunking scans ``chunk_size`` samples at a time and moves each
  chunk to host numpy while the next chunk runs (double-buffered via JAX's
  async dispatch);
- **per-iteration callback** (≙ the AbstractMCMC ``callback`` kwarg,
  exercised by the reference's RAM StatesExtractor test,
  test/RobustAdaptiveMetropolis.jl:14-28): called once per *chunk* on the
  host with the chunk's transitions (and states when ``collect_states``) —
  scan-chunk granularity is the TPU-native cadence for host hooks;
- **progress** (≙ the ``progress`` kwarg): one host-side line per chunk.

Chunk boundaries are invisible to the statistics: resume is bit-exact
(per-step RNG keys are indexed by absolute iteration), so
``sample_chunked(...)`` equals ``sample(...)`` value-for-value.
"""
from __future__ import annotations

import sys
import time
from typing import Any, Callable, Optional, Union

import jax
import numpy as np

from ..utils import KeyArray
from .sample import SamplingResult, sample
from .schedule import Schedule


def sample_chunked(
    model,
    sampler,
    n_samples: int,
    *,
    chunk_size: int = 1000,
    key: Union[int, KeyArray] = 0,
    num_chains: Optional[int] = None,
    initial_params: Any = None,
    initial_params_batched: bool = False,
    num_warmup: int = 0,
    discard_initial: Optional[int] = None,
    thinning: int = 1,
    collect_states: bool = False,
    callback: Optional[Callable[[SamplingResult, int], None]] = None,
    progress: bool = False,
    to_host: bool = True,
    **kwargs,
) -> SamplingResult:
    """Like :func:`sample` but in chunks of ``chunk_size`` samples.

    Returns a :class:`SamplingResult` whose transition leaves are host numpy
    arrays (``to_host=True``) concatenated over all chunks. ``callback`` runs
    after each chunk with (chunk_result, chunk_index).
    """
    schedule = Schedule(
        n_samples=n_samples,
        num_warmup=num_warmup,
        discard_initial=discard_initial,
        thinning=thinning,
    )
    D, W, th = schedule.discard_initial, schedule.num_warmup, schedule.thinning

    chunks = []
    state = None
    offset = 0
    done = 0
    t0 = time.perf_counter()
    chunk_idx = 0
    while done < n_samples:
        n_chunk = min(chunk_size, n_samples - done)
        if state is None:
            res = sample(
                model, sampler, n_chunk, key=key, num_chains=num_chains,
                initial_params=initial_params,
                initial_params_batched=initial_params_batched,
                num_warmup=W, discard_initial=D, thinning=th,
                collect_states=collect_states, **kwargs,
            )
            offset = res.schedule.total_steps
        else:
            # Remaining warmup steps relative to this chunk's start.
            w_rem = max(0, W - offset)
            res = sample(
                model, sampler, n_chunk, key=key, num_chains=num_chains,
                initial_state=state, iteration_offset=offset,
                num_warmup=w_rem, discard_initial=th, thinning=th,
                collect_states=collect_states, **kwargs,
            )
            offset += res.schedule.total_steps
        state = res.final_state
        host = res
        if to_host:
            host_tr = jax.tree_util.tree_map(np.asarray, res.transitions)
            host_st = (
                jax.tree_util.tree_map(np.asarray, res.states)
                if collect_states
                else None
            )
            host = SamplingResult(
                transitions=host_tr, final_state=res.final_state,
                schedule=res.schedule, num_chains=num_chains,
                states=host_st, sampler=sampler,
            )
        chunks.append(host)
        done += n_chunk
        if callback is not None:
            callback(host, chunk_idx)
        if progress:
            rate = done / max(time.perf_counter() - t0, 1e-9)
            print(
                f"[sample] {done}/{n_samples} samples "
                f"({rate:.1f} samples/s/chain)",
                file=sys.stderr,
            )
        chunk_idx += 1

    axis = 0 if num_chains is None else 1
    cat = np.concatenate if to_host else (
        lambda xs, axis: jax.numpy.concatenate(xs, axis=axis)
    )
    transitions = jax.tree_util.tree_map(
        lambda *xs: cat(xs, axis=axis), *[c.transitions for c in chunks]
    )
    states = None
    if collect_states:
        states = jax.tree_util.tree_map(
            lambda *xs: cat(xs, axis=axis), *[c.states for c in chunks]
        )
    return SamplingResult(
        transitions=transitions,
        final_state=state,
        schedule=schedule,
        num_chains=num_chains,
        states=states,
        sampler=sampler,
    )

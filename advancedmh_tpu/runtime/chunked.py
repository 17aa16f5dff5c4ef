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

import json
import os
import sys
import time
from typing import Any, Callable, Optional, Union

import jax
import numpy as np

from ..utils import KeyArray
from .checkpoint import load_state, save_state
from .sample import SamplingResult, sample
from .schedule import Schedule


def _save_tree(path: str, tree: Any) -> None:
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def _load_tree(path: str, like: Any) -> Any:
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(
        treedef, [data[f"leaf_{i}"] for i in range(len(leaves))]
    )


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
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    store_path: Optional[str] = None,
    param_names=None,
    **kwargs,
) -> SamplingResult:
    """Like :func:`sample` but in chunks of ``chunk_size`` samples.

    Returns a :class:`SamplingResult` whose transition leaves are host numpy
    arrays (``to_host=True``) concatenated over all chunks. ``callback`` runs
    after each chunk with (chunk_result, chunk_index).

    **Elastic recovery** (SURVEY.md §5 'failure detection'): with
    ``checkpoint_dir``, each completed chunk writes its transitions
    (``chunk_NNNNN.npz``), the sampler state (``state.npz``), and progress
    metadata (``meta.json``). After a crash, rerunning the identical call
    with ``resume=True`` skips completed chunks (reloaded from disk) and
    continues from the saved state — the result is bit-identical to an
    uninterrupted run.

    ``store_path`` streams every chunk into the native :class:`ChainStore`
    (io/chainstore.py): flattened ``params... , lp`` float32 rows written by
    a background C++ thread, so disk IO overlaps the next device chunk. Read
    back with ``advancedmh_tpu.io.open_reader(store_path)``.
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
    store = None
    offset = 0
    done = 0
    t0 = time.perf_counter()
    chunk_idx = 0
    resumed_chunk_files = []
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        meta_path = os.path.join(checkpoint_dir, "meta.json")
        if resume and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            done = meta["samples_done"]
            offset = meta["iteration_offset"]
            chunk_idx = meta["chunks_done"]
            resumed_chunk_files = [
                os.path.join(checkpoint_dir, f"chunk_{i:05d}.npz")
                for i in range(chunk_idx)
            ]
            if meta.get("chunk_size") != chunk_size or meta.get(
                "n_samples"
            ) != n_samples:
                raise ValueError(
                    "resume=True requires the same n_samples/chunk_size as "
                    f"the checkpointed run ({meta})."
                )
            template_result = None
            if done > 0:
                # Template run (structure only) to deserialize the state and
                # the completed chunk files.
                template_result = sample(
                    model, sampler, 1, key=key, num_chains=num_chains,
                    initial_params=initial_params,
                    initial_params_batched=initial_params_batched,
                    discard_initial=0, collect_states=collect_states, **kwargs,
                )
                state = load_state(
                    os.path.join(checkpoint_dir, "state.npz"),
                    template_result.final_state,
                )
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
        if store_path is not None:
            from ..output.flatten import flatten_params

            sample_ndim = 1 if num_chains is None else 2
            values, names = flatten_params(
                host.transitions.params, sample_ndim, param_names
            )
            lp_col = np.asarray(host.transitions.lp)[..., None]
            rows = np.concatenate(
                [np.asarray(values), lp_col], axis=-1
            ).reshape(-1, len(names) + 1)
            if store is None:
                from ..io import ChainStore

                store = ChainStore(store_path, list(names) + ["lp"])
            store.append(rows)
        if checkpoint_dir is not None:
            _save_tree(
                os.path.join(checkpoint_dir, f"chunk_{chunk_idx:05d}.npz"),
                host.transitions,
            )
            if collect_states:
                _save_tree(
                    os.path.join(checkpoint_dir, f"states_{chunk_idx:05d}.npz"),
                    host.states,
                )
            save_state(os.path.join(checkpoint_dir, "state.npz"), state)
            tmp = os.path.join(checkpoint_dir, "meta.json.tmp")
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "samples_done": done,
                        "iteration_offset": offset,
                        "chunks_done": chunk_idx + 1,
                        "chunk_size": chunk_size,
                        "n_samples": n_samples,
                    },
                    f,
                )
            os.replace(tmp, os.path.join(checkpoint_dir, "meta.json"))
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

    if store is not None:
        store.close()

    if resumed_chunk_files:
        tmpl_tr = (
            chunks[0].transitions if chunks else template_result.transitions
        )
        old = [
            SamplingResult(
                transitions=_load_tree(p, tmpl_tr), final_state=None,
                schedule=schedule, num_chains=num_chains, sampler=sampler,
                states=(
                    _load_tree(
                        p.replace("chunk_", "states_"),
                        chunks[0].states if chunks else template_result.states,
                    )
                    if collect_states
                    else None
                ),
            )
            for p in resumed_chunk_files
        ]
        chunks = old + chunks

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

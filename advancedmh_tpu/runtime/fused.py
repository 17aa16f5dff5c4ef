"""Fused-engine dispatch: run `sample()` on the Pallas VMEM-resident kernel.

Applicable when the sampler is a symmetric Gaussian random-walk
``MetropolisHastings`` (the reference's flagship ``RWMH(MvNormal(...))``
family) and the model carries a Pallas tile density (``model.tile_density``
+ ``model.tile_consts``, see models/targets.py, or a jnp-only
``logdensity_batched_fn`` adapted via ``tile_fn_from_batched``).

Contract note: the fused engine's sample k is the state after
``burn + (k+1)*thinning`` steps with ``burn = max(discard_initial -
thinning, 0)`` — identical to the standard schedule when ``discard_initial
>= thinning`` (the init draw itself is never emitted). RNG comes from the
TPU hardware PRNG seeded from the user key: equal to the XLA path in
distribution, not bitstream.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import MvNormal, Normal
from ..proposals import RandomWalkProposal, is_proposal
from ..samplers.base import Transition
from ..samplers.mh import MetropolisHastings
from ..utils import KeyArray


def _extract_rw_scale(sampler, d: int) -> np.ndarray:
    """Return the proposal scale — per-dimension std-dev ``(d,)`` or a full
    lower-Cholesky factor ``(d, d)`` — or raise if the sampler is not a
    symmetric Gaussian random walk."""
    if not isinstance(sampler, MetropolisHastings):
        raise ValueError("engine='fused' supports MetropolisHastings only")
    return _rw_leaf_scale(sampler.proposal, d)


def _rw_leaf_scale(p, d: int) -> np.ndarray:
    """Scale of a single zero-mean Gaussian RandomWalkProposal leaf."""
    if not is_proposal(p) or not isinstance(p, RandomWalkProposal):
        raise ValueError(
            "engine='fused' requires a single RandomWalkProposal leaf"
        )
    payload = p.payload
    if isinstance(payload, MvNormal):
        if not np.allclose(np.asarray(payload.loc), 0.0):
            raise ValueError("fused RW proposal must be zero-mean")
        if payload.scale_tril is not None:
            return np.tril(np.asarray(payload.scale_tril, np.float32))
        if payload.scale_diag is not None:
            return np.broadcast_to(np.asarray(payload.scale_diag), (d,))
        return np.broadcast_to(np.asarray(payload.scale), (d,))
    if isinstance(payload, Normal):
        if not np.allclose(np.asarray(payload.loc), 0.0):
            raise ValueError("fused RW proposal must be zero-mean")
        return np.broadcast_to(np.asarray(payload.scale), (d,))
    raise ValueError(
        f"engine='fused' does not support payload {type(payload).__name__}"
    )


def _shard_fused(run, mesh, axis: str):
    """Wrap a fused engine ``run(*arrays, seed)`` in ``shard_map`` over the
    chains/walkers mesh axis (≙ MCMCDistributed, SURVEY.md §2: chain
    parallelism has zero hot-loop collectives — each device runs the whole
    VMEM-resident kernel on its chain shard).

    Every array argument and output carries chains on its *last* axis, so
    in/out specs shard the last dim. Each shard offsets the hardware-PRNG
    seed by a Knuth-multiplicative stride so no two devices replay the same
    stream (the kernels themselves only stride by small tile/group indices).
    """
    from jax.sharding import PartitionSpec

    SEED_STRIDE = np.int32(-1640531527)  # 2654435761 mod 2^32 (Knuth)

    def wrapped(*args):
        *arrs, seed = args
        arrs = [jnp.asarray(a) for a in arrs]
        in_specs = tuple(
            PartitionSpec(*([None] * (a.ndim - 1) + [axis])) for a in arrs
        ) + (PartitionSpec(),)
        out_shape = jax.eval_shape(run, *arrs, jnp.int32(0))
        out_specs = jax.tree_util.tree_map(
            lambda s: PartitionSpec(*([None] * (s.ndim - 1) + [axis])),
            out_shape,
        )

        def body(*xs):
            *xa, sd = xs
            idx = jax.lax.axis_index(axis).astype(jnp.int32)
            return run(*xa, sd + idx * SEED_STRIDE)

        return jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(*arrs, jnp.asarray(seed, jnp.int32))

    return wrapped


_ENGINE_CACHE = {}


def _freeze(v):
    """Hashable key form of a builder argument (arrays → bytes)."""
    if isinstance(v, (np.ndarray, jax.Array)):
        a = np.asarray(v)
        return ("arr", a.tobytes(), a.shape, str(a.dtype))
    if isinstance(v, (tuple, list)):
        return tuple(_freeze(x) for x in v)
    return v


def _cached_engine(factory, tile_fn, consts, **statics):
    """Module-level cache of built fused-engine runners.

    Rebuilding a ``fused_*_sample`` jit wrapper per ``sample()`` call
    re-pays tracing/lowering + a remote Mosaic round-trip (~2-5 s through
    the axon tunnel) even when the compiled kernel itself is cached — for
    ``sample_chunked(engine="fused")`` that tax lands on EVERY chunk. The
    key covers the factory identity, the tile density function, the
    density constants (by value), and every static builder argument, so a
    cache hit is exactly a call that would have built an identical
    runner."""
    key = (
        factory.__module__, factory.__qualname__, tile_fn,
        _freeze(tuple(consts)),
        tuple(sorted((k, _freeze(v)) for k, v in statics.items())),
    )
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = factory(tile_fn, consts=consts, **statics)
    return _ENGINE_CACHE[key]


def _chain_constrainer(mesh, axis: str):
    """Sharding-constrain every leaf of a chain-leading state pytree over
    the mesh (identity without a mesh). Used by the two-stage engines so
    their XLA warmup runs sharded like the XLA engine (pooled reductions →
    psum over ICI) instead of concentrating on one device."""
    if mesh is None:
        return lambda s: s
    from ..parallel.mesh import chain_sharding

    ws = chain_sharding(mesh, axis)
    return lambda s: jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, ws), s
    )


def _fused_tiling(
    num_chains: int, max_tile: int, mesh, axis: str,
    d: int = 2, vmem_budget: int = 4 << 20,
):
    """Pick (padded chain count, tile size) for a fused kernel launch.

    The Pallas kernels need the per-device chain count to be a multiple of
    the tile and tiles to be lane-aligned (128). Rather than pushing that
    onto callers, pad the batch up to the next 128·n_devices multiple and
    choose the largest lane-aligned tile ≤ ``max_tile`` dividing the
    per-device count (for power-of-two batches this is ``max_tile`` itself).

    ``max_tile`` is additionally capped so the emission output block —
    ``samples_per_block × d × tile`` f32 (the VMEM-resident slab streamed to
    HBM per grid step; samples_per_block = 32, the factory default) — stays
    within ``vmem_budget`` bytes: the tuned 1024/2048 defaults are measured
    at d=2 and would exhaust VMEM at d ≫ 2 (pass a smaller budget for
    kernels that carry extra per-chain state, e.g. MALA's gradients).
    """
    if max_tile < 128:
        raise ValueError(f"tile_chains must be ≥ 128 lanes, got {max_tile}")
    cap = max(128, vmem_budget // (32 * d * 4) // 128 * 128)
    max_tile = min(max_tile, cap)
    n_dev = mesh.shape[axis] if mesh is not None else 1
    unit = 128 * n_dev
    c_pad = -(-num_chains // unit) * unit
    k = (c_pad // n_dev) // 128  # per-device lane groups
    for t in range(min(k, max_tile // 128), 0, -1):
        if k % t == 0:
            return c_pad, 128 * t
    raise AssertionError("unreachable: t=1 always divides k")


def _fence_launch(arr):
    """Block until the producing Pallas kernel has actually finished.

    On the axon tunnel a device→host transfer can BEGIN before the producing
    kernel completes (``jax.block_until_ready`` has the same flaw — see
    CLAUDE.md): a 524 MB transitions buffer was observed to arrive with
    partially-written emission groups, reading as an irreproducible ~2%
    posterior-mean "bias" that vanished under a dependent scalar fence. One
    ~2 ms scalar host read per launch makes every later transfer safe."""
    jax.device_get(jnp.ravel(arr)[-1])


def _pad_chains(run, c: int, c_pad: int):
    """Wrap a fused engine so callers may pass any chain count: array inputs
    are edge-padded on the chain (last) axis to ``c_pad`` before the kernel
    and every output is trimmed back to ``c`` chains."""
    if c_pad == c:
        return run

    def wrapped(*args):
        *arrs, seed = args
        padded = [
            jnp.pad(
                jnp.asarray(a),
                [(0, 0)] * (jnp.ndim(a) - 1) + [(0, c_pad - c)],
                mode="edge",
            )
            for a in arrs
        ]
        out = run(*padded, seed)
        return jax.tree_util.tree_map(lambda x: x[..., :c], out)

    return wrapped


def _tile_density_of(model):
    tile = getattr(model, "tile_density", None)
    consts = getattr(model, "tile_consts", ())
    if tile is not None:
        return tile, tuple(consts)
    if model.logdensity_batched_fn is not None:
        from ..ops.pallas_mh import tile_fn_from_batched

        return tile_fn_from_batched(model.logdensity_batched_fn), ()
    raise ValueError(
        "engine='fused' needs a Pallas-traceable density: attach "
        "model.tile_density (+ tile_consts) or provide "
        "logdensity_batched_fn built from jnp ops."
    )


def sample_fused_ram(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    num_warmup: int,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    initial_S=None,
    iteration_offset: int = 0,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused RAM engine (ops/pallas_ram.py): the full adaptive warmup +
    frozen-S sampling schedule in one VMEM-resident kernel (~8× the XLA
    path). Fresh runs require the standard RAM schedule ``discard_initial ==
    num_warmup`` (warmup draws discarded); resumed runs (``initial_S`` set,
    via ``sample_chunked``) continue post-warmup with S frozen and require
    ``num_warmup == 0``, ``discard_initial == thinning``.

    ``sampler.pooled=True`` runs the two-stage shape (≙ pooled AdaptiveHMC
    / :func:`sample_fused_chees`, VERDICT r4 #1): the rank-C pooled Vihola
    warmup (``samplers/ram.py::_adapt_pooled`` — its chain-axis reduction
    spans grid tiles, so it stays on XLA/GSPMD where it compiles to a psum
    under a mesh) adapts ONE shared S, which is then staged onto the same
    frozen-S fused kernel the per-chain resume path uses. Post-warmup RAM
    never adapts (≙ reference src/RobustAdaptiveMetropolis.jl:216-237), so
    the staging changes no algorithm — only where the warmup runs.

    Schedule note: sample k is the state after ``num_warmup + k·thinning``
    steps — all ``num_warmup`` steps adapt (matching the XLA contract
    "steps j ≤ num_warmup use step_warmup"), and the first emit lands one
    thinning stride *after* the XLA schedule's sample 1 (which is the state
    at step ``num_warmup`` exactly). Both sides of the stride are stationary
    frozen-S draws and the engines share no RNG bitstream, so the runs are
    equal in distribution; only the absolute step labels differ."""
    from ..ops.pallas_ram import fused_ram_sample
    from ..samplers.ram import RobustAdaptiveMetropolisState

    if initial_S is None:
        if discard_initial != num_warmup:
            raise ValueError(
                "fused RAM supports the standard schedule discard_initial == "
                "num_warmup; use the XLA path to keep warmup draws."
            )
    elif num_warmup != 0 or discard_initial != thinning:
        raise ValueError(
            "fused RAM resume expects the chunk-resume schedule "
            "(num_warmup=0, discard_initial=thinning)."
        )
    if initial_params is None:
        raise ValueError("engine='fused' requires initial_params")
    d = model.dimension
    if d is None:
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    c_pad, tile = _fused_tiling(num_chains, tile_chains, mesh, mesh_axis, d=d)
    # Pooled fresh runs take the two-stage shape (docstring): the rank-C
    # Vihola warmup happens on XLA, so the kernel itself runs frozen-only.
    pooled_fresh = bool(sampler.pooled) and initial_S is None and num_warmup >= 1

    run = _cached_engine(
        fused_ram_sample, tile_fn, consts, d=d, n_samples=n_samples,
        warmup=0 if pooled_fresh else num_warmup, thin=thinning,
        alpha=sampler.alpha, gamma=sampler.gamma,
        eigenvalue_lower_bound=sampler.eigenvalue_lower_bound,
        eigenvalue_upper_bound=sampler.eigenvalue_upper_bound,
        tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    const_args = tuple(jnp.asarray(c) for c in consts)
    if pooled_fresh:
        # -- stage 1 (XLA): rank-C pooled Vihola warmup → ONE shared S ----
        init = jnp.asarray(initial_params, jnp.float32)
        init_b = (
            jnp.broadcast_to(init, (num_chains, d))
            if init.ndim == 1
            else init
        )
        constrain = _chain_constrainer(mesh, mesh_axis)

        @jax.jit
        def warm(k):
            _, state = jax.vmap(
                lambda kk, x0: sampler.init(kk, model, x0)
            )(jax.random.split(k, num_chains), init_b)
            state = constrain(state)

            def body(s, j):
                _, s = sampler.step_warmup_batched(
                    jax.random.fold_in(k, j), s, model, (num_chains,)
                )
                return s, None

            state, _ = jax.lax.scan(
                body, state, jnp.arange(1, num_warmup + 1)
            )
            return state

        wstate = warm(key)
        # _adapt_pooled broadcasts the one shared factor over the batch, so
        # every chain's S is identical by construction — stage chain 0's.
        x_t = jnp.transpose(jnp.asarray(wstate.x, jnp.float32))
        lp0 = jnp.asarray(wstate.logprob, jnp.float32)[None, :]
        S0 = jnp.broadcast_to(
            jnp.asarray(wstate.S, jnp.float32)[0].reshape(d * d, 1),
            (d * d, num_chains),
        )
        # Warmup consumed fold_in(key, 0..num_warmup); the frozen launch
        # seeds from the first post-warmup index (≙ sample_fused_chees).
        seed = jax.random.randint(
            jax.random.fold_in(key, num_warmup + 1), (), 0, 2**31 - 1,
            dtype=jnp.int32,
        )
    else:
        init = jnp.asarray(initial_params, jnp.float32)
        x_t = (
            jnp.broadcast_to(init[:, None], (d, num_chains))
            if init.ndim == 1
            else jnp.asarray(init).T
        )
        lp0 = tile_fn(x_t, *const_args)
        if initial_S is not None:  # (C, d, d) per-chain adapted factors
            S_in = jnp.asarray(initial_S, jnp.float32)
            if sampler.pooled:
                # Pooled resume expects the replicated S a pooled warmup
                # produces; a per-chain-adapted state must raise, not
                # silently run 16384 different factors under a pooled=True
                # sampler (≙ the pooled AdaptiveHMC resume guard).
                spread = float(
                    jnp.max(jnp.max(S_in, axis=0) - jnp.min(S_in, axis=0))
                )
                if spread > 1e-5:
                    raise ValueError(
                        "fused pooled RAM resume needs the replicated "
                        "(shared) S a pooled warmup produces, but this "
                        "state carries per-chain factors (spread "
                        f"{spread:.3g}) - it was warmed with pooled=False. "
                        "Resume with a pooled=False sampler or use the "
                        "XLA engine."
                    )
            S0 = jnp.transpose(S_in, (1, 2, 0)).reshape(d * d, num_chains)
        else:
            S0 = (
                jnp.eye(d, dtype=jnp.float32)
                if sampler.S is None
                else jnp.tril(jnp.asarray(sampler.S, jnp.float32))
            ).reshape(d * d, 1)
            S0 = jnp.broadcast_to(S0, (d * d, num_chains))
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs, S_final = run(x_t, lp0, S0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    C = num_chains
    total_iters = iteration_offset + num_warmup + n_samples * thinning + 1
    final_state = RobustAdaptiveMetropolisState(
        x=params[:, -1, :],
        logprob=lp[:, -1],
        S=jnp.transpose(S_final.reshape(d, d, C), (2, 0, 1)),
        logalpha=jnp.zeros((C,), jnp.float32),
        eta=jnp.zeros((C,), jnp.float32),
        iteration=jnp.full((C,), total_iters, jnp.int32),
        isaccept=accepted[:, -1],
    )
    return transitions, final_state


def sample_fused_am(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    initial_state=None,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused Adaptive-Metropolis engine (ops/pallas_am.py): mixture proposal
    + exact Welford Cholesky-factor covariance adaptation, VMEM-resident.
    Adaptation continues through every step (the AM ergodicity contract), so
    resume (``initial_state`` via ``sample_chunked``) carries (mean, L, n)
    straight back into the kernel — unlike RAM there is no frozen phase.

    Also serves :class:`DRAM` (ops/pallas_dram.py): identical state plumbing,
    the kernel swaps the mixture step for the two-stage DR step.

    ``pooled=True`` deliberately raises (docs/design.md §8): the AM/DRAM
    ergodicity contract keeps the shared Σ adapting on EVERY post-warmup
    step, and that chain-axis Welford merge spans grid tiles — there is no
    frozen stage to stage onto a kernel (unlike RAM, whose S freezes). A
    tile-local approximation would silently change the algorithm; the XLA
    engine runs pooled AM/DRAM exactly (the merge compiles to a psum under
    a mesh)."""
    import math as _math

    from ..ops.pallas_am import fused_am_sample
    from ..ops.pallas_dram import fused_dram_sample
    from ..samplers.am import AdaptiveMetropolisState
    from ..samplers.dram import DRAM as _DRAM

    if sampler.pooled:
        raise ValueError(
            "engine='fused' does not support pooled "
            f"{type(sampler).__name__}: pooled AM/DRAM keep adapting the "
            "ONE shared covariance on every post-warmup step (the AM "
            "ergodicity contract), and that cross-chain Welford merge "
            "spans kernel tiles - there is no frozen stage to stage "
            "(unlike pooled RAM, whose S freezes after warmup). Use the "
            "XLA engine, which runs the pooled merge exactly."
        )
    if initial_params is None:
        raise ValueError("engine='fused' requires initial_params")
    d = model.dimension
    if d is None:
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    # state rows per chain: x(d) + mean(d) + L(d²) + lp + n — derate the tile
    # like MALA's gradient scratch.
    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=2 << 20,
    )

    if isinstance(sampler, _DRAM):
        run = _cached_engine(
            fused_dram_sample, tile_fn, consts, d=d, n_samples=n_samples, burn=burn, thin=thinning,
            opt_scale=sampler.opt_scale, gamma=sampler.gamma,
            tile_chains=tile,
        )
    else:
        run = _cached_engine(
            fused_am_sample, tile_fn, consts, d=d, n_samples=n_samples, burn=burn, thin=thinning,
            beta=sampler.beta, fixed_scale=sampler.fixed_scale,
            opt_scale=sampler.opt_scale, adapt_start=sampler.adapt_start,
            tile_chains=tile,
        )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    init = jnp.asarray(initial_params, jnp.float32)
    x_t = (
        jnp.broadcast_to(init[:, None], (d, num_chains))
        if init.ndim == 1
        else jnp.asarray(init).T
    )
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    if initial_state is not None:  # per-chain adapted moments (C, ...)
        mean0 = jnp.asarray(initial_state.mean, jnp.float32).T  # (d, C)
        L0 = jnp.transpose(
            jnp.asarray(initial_state.L, jnp.float32), (1, 2, 0)
        ).reshape(d * d, num_chains)
        n0 = jnp.asarray(
            initial_state.iteration, jnp.float32
        ).reshape(1, num_chains)
    else:
        mean0 = x_t
        L0 = (
            (sampler.fixed_scale / _math.sqrt(d))
            * jnp.eye(d, dtype=jnp.float32)
        ).reshape(d * d, 1)
        L0 = jnp.broadcast_to(L0, (d * d, num_chains))
        n0 = jnp.ones((1, num_chains), jnp.float32)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs, mean_f, L_f, n_f = run(x_t, lp0, mean0, L0, n0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    C = num_chains
    final_state = AdaptiveMetropolisState(
        x=params[:, -1, :],
        logprob=lp[:, -1],
        mean=mean_f.T,
        L=jnp.transpose(L_f.reshape(d, d, C), (2, 0, 1)),
        iteration=n_f[0].astype(jnp.int32),
        isaccept=accepted[:, -1],
    )
    return transitions, final_state


def sample_fused_mala(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 2048,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused Langevin-MALA engine (ops/pallas_mala.py): gradients traced by
    jax.value_and_grad *inside* the kernel. Requires a sampler built with
    ``MALA.langevin(step_size_sq)`` (the canonical proposal form — arbitrary
    gradient→distribution closures can't be introspected)."""
    from ..ops.pallas_mala import fused_mala_sample
    from ..samplers.base import GradientTransition

    s2 = getattr(sampler, "langevin_step_size_sq", None)
    if s2 is None:
        raise ValueError(
            "engine='fused' for MALA requires MALA.langevin(step_size_sq) "
            "(the canonical MvNormal(σ²/2 g, σ² I) proposal)."
        )
    if initial_params is None:
        raise ValueError("please specify initial parameters")
    d = model.dimension
    if d is None:
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=2 << 20,
    )

    run = _cached_engine(
        fused_mala_sample, tile_fn, consts, d=d, step_size_sq=s2, n_samples=n_samples, burn=burn,
        thin=thinning, tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    init = jnp.asarray(initial_params, jnp.float32)
    x_t = (
        jnp.broadcast_to(init[:, None], (d, num_chains))
        if init.ndim == 1
        else jnp.asarray(init).T
    )
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    g0 = jax.grad(lambda xm: jnp.sum(tile_fn(xm, *const_args)))(x_t)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, g0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    # Emitted samples carry (params, lp, accepted); the resume state is a
    # GradientTransition with the gradient recomputed at the final draws.
    grad_last_t = jax.grad(
        lambda xm: jnp.sum(tile_fn(xm, *const_args))
    )(jnp.transpose(params[:, -1, :]))  # (d, C)
    transitions = Transition(params, lp, accepted)
    final_state = GradientTransition(
        params[:, -1, :], lp[:, -1], jnp.transpose(grad_last_t), accepted[:, -1]
    )
    return transitions, final_state


def sample_fused_hmc(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused HMC engine (ops/pallas_hmc.py): whole leapfrog trajectories in
    VMEM with in-kernel vjp gradients. Supports scalar/diagonal
    ``inverse_mass`` (pytree masses need the XLA engine)."""
    from ..ops.pallas_hmc import fused_hmc_sample
    from ..samplers.base import GradientTransition

    if initial_params is None:
        raise ValueError("please specify initial parameters")
    if sampler.trajectory_sampling != "endpoint":
        raise ValueError(
            "engine='fused' HMC is endpoint-only; multinomial trajectory "
            "sampling runs on the XLA engine."
        )
    minv = sampler.inverse_mass
    if minv is not None:
        minv = np.asarray(minv, np.float32)
        if minv.ndim > 1:
            raise ValueError(
                "engine='fused' HMC supports scalar/diagonal inverse_mass; "
                "pytree masses need the XLA engine."
            )
    d = model.dimension
    if d is None:
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=2 << 20,
    )

    run = _cached_engine(
        fused_hmc_sample, tile_fn, consts, d=d, step_size=float(sampler.step_size),
        n_leapfrog=int(sampler.n_leapfrog), n_samples=n_samples, burn=burn,
        thin=thinning, inverse_mass=minv, tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    init = jnp.asarray(initial_params, jnp.float32)
    x_t = (
        jnp.broadcast_to(init[:, None], (d, num_chains))
        if init.ndim == 1
        else jnp.asarray(init).T
    )
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    g0 = jax.grad(lambda xm: jnp.sum(tile_fn(xm, *const_args)))(x_t)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, g0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    grad_last_t = jax.grad(
        lambda xm: jnp.sum(tile_fn(xm, *const_args))
    )(jnp.transpose(params[:, -1, :]))  # (d, C)
    transitions = Transition(params, lp, accepted)
    final_state = GradientTransition(
        params[:, -1, :], lp[:, -1], jnp.transpose(grad_last_t), accepted[:, -1]
    )
    return transitions, final_state


def sample_fused_adaptive_hmc(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    num_warmup: int,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    initial_state=None,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused AdaptiveHMC engine: joint (ε, diag M⁻¹) warmup + frozen
    trajectory sampling.

    Two shapes, matching the sampler's adaptation mode:

    - **Per-chain** (``pooled=False``): the whole schedule runs in one
      VMEM-resident launch (ops/pallas_hmc_adapt.py) — per-chain
      dual-averaged ε and per-chain Welford mass adapt in-kernel, then the
      frozen phase emits.
    - **Pooled** (``pooled=True``): two-stage ≙ :func:`sample_fused_chees`
      (VERDICT r3 #5) — the cross-chain pooled Welford warmup runs on the
      XLA engine (its chain-axis reductions span grid tiles), the shared
      frozen (ε̄, M⁻¹) are host-staged, and the frozen phase runs on the
      ChEES frozen kernel with a constant leapfrog schedule (trips =
      ``n_leapfrog`` — AdaptiveHMC has no trajectory jitter).

    Requires the standard ``discard_initial == num_warmup`` schedule
    (≙ sample_fused_adapt_rwmh).

    ``initial_state`` (a frozen ``AdaptiveHMCState``) resumes post-warmup
    under the chunk-resume schedule (``num_warmup=0``,
    ``discard_initial=thinning``): per-chain states stage the frozen
    (ε̄, M⁻¹) back into the resume kernel variant; pooled (replicated)
    states re-stage the shared scalars onto the frozen kernel.

    A fresh per-chain ``final_state`` supports **frozen (post-warmup)
    continuation only**: the kernel does not export the Welford running
    mean or the dual-averaging error sum, so the reconstruction uses
    ``mean = last position`` and ``h_bar = 0`` (with M2 inverted from the
    frozen M⁻¹ so a frozen-phase regularized estimate reproduces it
    exactly). An XLA-engine resume that *continues warmup* from this state
    (``num_warmup > 0``) would adapt from those inconsistent statistics —
    resume with ``num_warmup=0``. Pooled final states carry the complete
    XLA warmup statistics (≙ fused ChEES)."""
    from ..ops.pallas_hmc_adapt import fused_adaptive_hmc_sample
    from ..samplers.base import GradientTransition
    from ..samplers.hmc_adapt import AdaptiveHMCState
    from ..utils import replace as _replace

    resume = initial_state is not None
    if resume:
        if num_warmup != 0 or discard_initial != thinning:
            raise ValueError(
                "fused AdaptiveHMC resume expects the chunk-resume "
                "schedule (num_warmup=0, discard_initial=thinning)."
            )
        d = model.dimension
        if d is None:
            d = int(np.asarray(initial_state.inner.params).shape[-1])
    else:
        if discard_initial != num_warmup:
            raise ValueError(
                "fused AdaptiveHMC supports the standard schedule "
                "discard_initial == num_warmup; use the XLA path to keep "
                "warmup draws."
            )
        if num_warmup < 1:
            raise ValueError("fused AdaptiveHMC requires num_warmup >= 1")
        if initial_params is None:
            raise ValueError("please specify initial parameters")
        d = model.dimension
        if d is None:
            d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    const_args = tuple(jnp.asarray(c) for c in consts)
    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=2 << 20,
    )
    C = num_chains

    if sampler.pooled:
        # -- pooled: two-stage (XLA pooled warmup → shared frozen kernel) --
        if resume:
            wstate = initial_state
        else:
            init = jnp.asarray(initial_params, jnp.float32)
            init_b = (
                jnp.broadcast_to(init, (num_chains, d))
                if init.ndim == 1
                else init
            )
            constrain = _chain_constrainer(mesh, mesh_axis)

            @jax.jit
            def warm(k):
                _, state = jax.vmap(
                    lambda kk, x0: sampler.init(kk, model, x0)
                )(jax.random.split(k, num_chains), init_b)
                state = constrain(state)

                def body(s, j):
                    _, s = sampler.step_warmup_batched(
                        jax.random.fold_in(k, j), s, model, (num_chains,)
                    )
                    return s, None

                state, _ = jax.lax.scan(
                    body, state, jnp.arange(1, num_warmup + 1)
                )
                return state

            wstate = warm(key)

        eps_row, minv_col, x_t, lp0, g_t = _ahmc_pooled_stage(wstate, d)
        E = min(16, n_samples)
        L = int(sampler.n_leapfrog)
        base = _chees_frozen_kernel_for(
            tile_fn, consts, d, n_samples, (L,) * (E * thinning),
            thinning, tile, E,
        )
        # ε̄ is per-chain (pooled AdaptiveHMC dual-averages per chain), so
        # it travels as an explicit argument — _shard_fused shards it with
        # the chains; the shared M⁻¹ column stays a closed-over constant.
        run = lambda x, l, g, e, seed: base(x, l, g, e, minv_col, seed)
        if mesh is not None:
            run = _shard_fused(run, mesh, mesh_axis)
        run = _pad_chains(run, num_chains, c_pad)
        seed = jax.random.randint(
            jax.random.fold_in(key, num_warmup + 1), (), 0, 2**31 - 1,
            dtype=jnp.int32,
        )
        samples, lps, accs = run(x_t, lp0, g_t, eps_row, seed)
        _fence_launch(samples)

        params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
        lp = jnp.transpose(lps[:, 0, :], (1, 0))
        accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
        transitions = Transition(params, lp, accepted)
        grad_last_t = jax.grad(
            lambda xm: jnp.sum(tile_fn(xm, *const_args))
        )(jnp.transpose(params[:, -1, :]))
        inner = GradientTransition(
            params[:, -1, :], lp[:, -1], jnp.transpose(grad_last_t),
            accepted[:, -1],
        )
        return transitions, _replace(wstate, inner=inner)

    # -- per-chain: single launch (fresh) or resume kernel variant --------
    run = _cached_engine(
        fused_adaptive_hmc_sample, tile_fn, consts, d=d, n_samples=n_samples, warmup=num_warmup,
        n_leapfrog=int(sampler.n_leapfrog), thin=thinning,
        initial_step_size=sampler.initial_step_size,
        target_accept=sampler.target_accept,
        t0=sampler.t0, kappa=sampler.kappa, gamma=sampler.gamma,
        mu=sampler.mu,
        mass_regularization=sampler.mass_regularization,
        mass_warm_start=sampler.mass_warm_start,
        tile_chains=tile, resume=resume,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    if resume:
        x_t = jnp.transpose(
            jnp.asarray(initial_state.inner.params, jnp.float32)
        )
        lp0 = jnp.asarray(initial_state.inner.lp, jnp.float32)[None, :]
        g0 = jnp.transpose(
            jnp.asarray(initial_state.inner.gradient, jnp.float32)
        )
        inv_mass_leaf = jax.tree_util.tree_leaves(
            initial_state.inverse_mass
        )[0]
        extra = (
            jnp.exp(
                jnp.asarray(initial_state.log_eps_bar, jnp.float32)
            )[None, :],
            jnp.transpose(jnp.asarray(inv_mass_leaf, jnp.float32)),
        )
    else:
        init = jnp.asarray(initial_params, jnp.float32)
        x_t = (
            jnp.broadcast_to(init[:, None], (d, num_chains))
            if init.ndim == 1
            else jnp.asarray(init).T
        )
        lp0 = tile_fn(x_t, *const_args)
        g0 = jax.grad(lambda xm: jnp.sum(tile_fn(xm, *const_args)))(x_t)
        extra = ()
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs, eps_final, minv_final = run(x_t, lp0, g0, *extra, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    grad_last_t = jax.grad(
        lambda xm: jnp.sum(tile_fn(xm, *const_args))
    )(jnp.transpose(params[:, -1, :]))  # (d, C)
    inner = GradientTransition(
        params[:, -1, :], lp[:, -1], jnp.transpose(grad_last_t),
        accepted[:, -1],
    )
    if resume:
        # Frozen continuation: the saved statistics carry through.
        return transitions, _replace(initial_state, inner=inner)
    log_eps = jnp.log(eps_final[0])  # (C,)
    inv_mass = jnp.transpose(minv_final)  # (C, d)
    # Reconstruct Welford M2 so an XLA-resumed chunk's regularized estimate
    # reproduces the frozen inverse mass exactly (the est formula inverted
    # at n = num_warmup).
    nn = float(max(num_warmup, 1))
    r = float(sampler.mass_regularization)
    var = (inv_mass - 1e-3 * (r / (nn + r))) * ((nn + r) / nn)
    m2 = jnp.maximum(var, 0.0) * max(nn - 1.0, 1.0)
    final_state = AdaptiveHMCState(
        inner=inner,
        log_eps=log_eps,
        log_eps_bar=log_eps,
        h_bar=jnp.zeros((C,), jnp.float32),
        t=jnp.full((C,), num_warmup + 1, jnp.int32),
        mean=inner.params,
        m2=m2,
        n=jnp.full((C,), nn, jnp.float32),
        inverse_mass=inv_mass,
    )
    return transitions, final_state


_CHEES_WARMUP_KERNELS = {}


@functools.partial(
    jax.jit,
    static_argnames=(
        "m_obs", "adapt_mass", "reg", "warm_start", "num_chains", "d",
    ),
)
def _chees_warmup_combine(
    sv_wide, sumx_wide, sumx2_wide, x, lp, g, acc, minv0,
    *, m_obs, adapt_mass, reg, warm_start, num_chains, d,
):
    """Jitted cross-tile combine + state build for the fused ChEES warmup
    (ONE dispatch — run unjitted, each of the ~20 small jnp ops here costs
    a separate ~1-2 ms tunnel dispatch, which dominated the warmup time)."""
    from ..samplers.base import GradientTransition
    from ..samplers.chees import ChEESHMCState

    # Per-tile stats are replicated over 128-lane blocks — read every
    # 128th column. Scalars: average over tiles (each tile is an i.i.d.
    # low-variance estimate of the same fixed point). Mass: exact merge
    # from the raw batch sums.
    sv_tiles = sv_wide[:, ::128]
    scalars = jnp.mean(sv_tiles[0:7], axis=1, keepdims=True)
    s1 = jnp.sum(sumx_wide[:, ::128], axis=1, keepdims=True)
    s2 = jnp.sum(sumx2_wide[:, ::128], axis=1, keepdims=True)
    mean = s1 / m_obs
    m2 = s2 - s1 * s1 / m_obs
    n_new = jnp.full((1, 1), m_obs, jnp.float32)
    if adapt_mass and m_obs >= warm_start:
        var = m2 / max(m_obs - 1.0, 1.0)
        minv = (m_obs / (m_obs + reg)) * var + 1e-3 * (reg / (m_obs + reg))
    else:
        minv = minv0
    sv = jnp.concatenate([scalars, sv_tiles[7:8, 0:1], n_new], axis=0)

    C = num_chains
    trim = lambda a: a[:, :C]
    brow = lambda v: jnp.broadcast_to(v, (C,))
    bcol = lambda a: jnp.broadcast_to(jnp.transpose(a), (C, d))
    inner = GradientTransition(
        jnp.transpose(trim(x)), trim(lp)[0], jnp.transpose(trim(g)),
        trim(acc)[0] > 0.5,
    )
    state = ChEESHMCState(
        inner=inner,
        log_eps=brow(sv[0, 0]),
        log_eps_bar=brow(sv[1, 0]),
        h_bar=brow(sv[2, 0]),
        log_traj=brow(sv[3, 0]),
        log_traj_bar=brow(sv[4, 0]),
        adam_m=brow(sv[5, 0]),
        adam_v=brow(sv[6, 0]),
        t=brow(sv[7, 0].astype(jnp.int32)),
        mean=bcol(mean),
        m2=bcol(m2),
        n=brow(sv[8, 0]),
        inverse_mass=bcol(minv),
    )
    # sv and minv ride along so the caller can stage the frozen phase with
    # ONE small host pull instead of chees_frozen_stage's several.
    return state, sv, minv


def _chees_warmup_kernel_for(tile_fn, consts, d, trips, us, n_groups,
                             tile, sampler, valid=None):
    """Module-level cache of built warmup-block kernels: rebuilding a
    ``jax.jit`` wrapper per sample() call re-pays lowering + the remote
    Mosaic round-trip (~5 s through the tunnel) even when the compiled
    kernel itself is cached — keying on the full static configuration
    makes repeat warmups dispatch in milliseconds."""
    from ..ops.pallas_chees import fused_chees_warmup_block

    consts_key = tuple(
        (np.asarray(c).tobytes(), np.asarray(c).shape) for c in consts
    )
    key = (
        tile_fn, consts_key, d, trips, us, n_groups, tile, valid,
        sampler.target_accept, sampler.t0, sampler.kappa, sampler.gamma,
        sampler._mu, sampler.learning_rate, sampler.adam_b1,
        sampler.adam_b2, int(sampler.max_leapfrog), sampler.adapt_mass,
        sampler.mass_regularization, sampler.mass_warm_start,
    )
    if key not in _CHEES_WARMUP_KERNELS:
        _CHEES_WARMUP_KERNELS[key] = fused_chees_warmup_block(
            tile_fn, d, trips=trips, us=us, n_groups=n_groups,
            target_accept=sampler.target_accept,
            t0=sampler.t0, kappa=sampler.kappa, gamma=sampler.gamma,
            mu=sampler._mu, learning_rate=sampler.learning_rate,
            adam_b1=sampler.adam_b1, adam_b2=sampler.adam_b2,
            max_leapfrog=int(sampler.max_leapfrog),
            adapt_mass=sampler.adapt_mass,
            mass_regularization=sampler.mass_regularization,
            mass_warm_start=sampler.mass_warm_start,
            consts=consts, tile_chains=tile, valid_chains=valid,
        )
    return _CHEES_WARMUP_KERNELS[key]


def fused_chees_warmup(
    tile_fn,
    consts,
    sampler,
    d: int,
    num_chains: int,
    key: KeyArray,
    x_t,
    lp0,
    g_t,
    num_warmup: int,
    tile_chains: int = 4096,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused ChEES warmup (VERDICT r4 #1): the warmup phase in ONE Pallas
    launch instead of the XLA scan. Motivation is twofold: the XLA warmup
    ran at 1.57e8 chain-steps/s against the frozen kernel's ~1.9e9
    grad-evals/s, and — decisive for the launch structure — EVERY kernel
    launch costs ~24 ms of fixed dispatch through the axon tunnel
    (measured: n_steps=2 and n_steps=100 RWMH launches both take 24.5
    ms), so a multi-block segmented warmup would drown in fixed cost.

    Inside the launch every adaptation statistic updates per STEP with
    live values, pooled exactly over each ≥1024-chain tile (tile-local
    pooling — far lower-variance than the ChEES paper's ~100-chain
    batches; a single-tile exact variant dies on the density's (n_obs, C)
    VMEM intermediates at C = 16384), including the per-tile Welford
    mass. The ONE static quantity is the leapfrog trip schedule, staged
    from the INITIAL ratio T₀/ε₀ with van-der-Corput jitter (period =
    the largest divisor of ``num_warmup`` ≤ 16): executed trajectory
    lengths are quantized at the initial ratio while the statistics adapt
    live — the frozen phase then re-quantizes from the FULLY-ADAPTED
    (ε̄, T̄), which is where trip fidelity actually buys ESS (4000 draws
    vs 500 warmup steps). Afterwards the launcher combines tiles:
    averaged scalars + exact cross-tile Welford merge from the emitted
    raw batch sums (Chan–Golub–LeVeque with the global count).

    The launch's RNG seed derives from ``fold_in(key, 1)`` — the first
    warmup iteration index — so the frozen stage's ``fold_in(key,
    num_warmup + 1)`` seed never collides.

    Returns a fully-populated replicated ``ChEESHMCState`` (≙ the XLA
    warmup's), so frozen staging, resume, and checkpointing behave
    identically downstream.

    ``mesh`` (r5, opt-in via ``warmup_engine="fused"``) shards the warmup
    launch over the chains axis: each device runs the kernel on its chain
    shard with a strided PRNG seed, the per-TILE stat blocks come back
    concatenated along the stats axis, and the existing cross-tile combine
    merges tiles from ALL devices (averaged scalars + exact Welford merge
    — the combine never cared which device a tile ran on). Adaptation
    pooling is tile-local either way; only the combine is global."""
    from ..ops.pallas_chees import vdc

    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=2 << 20,
    )
    sv = np.zeros((9, 1), np.float32)
    sv[0, 0] = sv[1, 0] = math.log(sampler.initial_step_size)
    sv[3, 0] = sv[4, 0] = math.log(sampler.initial_trajectory_length)
    sv[7, 0] = 1.0  # t
    sv = jnp.asarray(sv)
    minv = jnp.ones((d, 1), jnp.float32)
    pad = lambda a: jnp.pad(
        a, [(0, 0), (0, c_pad - num_chains)], mode="edge"
    ) if c_pad != num_chains else a
    x, lp, g = pad(x_t), pad(lp0), pad(g_t)
    # Ragged batch: mask the edge-padded clone lanes out of the kernel's
    # pooled statistics (VERDICT r4 #5) and count only real observations
    # in the combine.
    valid = num_chains if c_pad != num_chains else None
    if mesh is not None and valid is not None:
        raise ValueError(
            "sharded fused ChEES warmup needs the chain count to be a "
            f"multiple of 128 x n_devices (got {num_chains}): the ragged-"
            "lane mask uses shard-local tile indices and would zero the "
            "wrong lanes. Pad the chain count or use warmup_engine='xla'."
        )
    max_l = int(sampler.max_leapfrog)
    r = float(sampler.mass_regularization)
    # Period = largest divisor of num_warmup ≤ 16 (exactly num_warmup
    # steps, one launch; a prime num_warmup degrades to a jitter-free
    # period-1 warmup schedule — the frozen phase is still jittered).
    e_w = max(e for e in range(1, 17) if num_warmup % e == 0)
    n_groups = num_warmup // e_w
    us = tuple(vdc(j + 1) for j in range(e_w))
    ratio = sampler.initial_trajectory_length / sampler.initial_step_size
    # Schedule-consistency loop: with a badly misconfigured init ratio the
    # static warmup trips execute the wrong trajectory lengths while T
    # adapts live, so T̄ can run away to the clip (measured at R₀ = 1 on
    # the README-class target: adapted ratio pinned at max_leapfrog,
    # frozen phase ~3× the gradients per draw). If the adapted ratio
    # lands > 3× off the staged one, re-run the warmup staged at the
    # adapted ratio — a well-configured init (the normal case) stages
    # consistently on the first launch and pays nothing.
    for attempt in range(3):
        trips = tuple(max(1, min(max_l, round(u * ratio))) for u in us)
        run = _chees_warmup_kernel_for(
            tile_fn, consts, d, trips, us, n_groups, tile, sampler, valid
        )
        seed = jax.random.randint(
            jax.random.fold_in(jax.random.fold_in(key, 1), attempt),
            (), 0, 2**31 - 1, dtype=jnp.int32,
        )
        if mesh is None:
            xo, lpo, go, acc, sv_wide, sumx_wide, sumx2_wide = run(
                x, lp, g, sv, minv, seed
            )
        else:
            # Shard the launch over chains; sv/minv are replicated
            # closures (a (9, 1) column cannot shard), per-shard seeds
            # stride via _shard_fused, and the per-tile stat outputs
            # concatenate along the stats axis for the global combine.
            sharded = _shard_fused(
                lambda xx, ll, gg, sd, _r=run: _r(xx, ll, gg, sv, minv, sd),
                mesh, mesh_axis,
            )
            xo, lpo, go, acc, sv_wide, sumx_wide, sumx2_wide = sharded(
                x, lp, g, seed
            )
        out = _chees_warmup_combine(
            sv_wide, sumx_wide, sumx2_wide, xo, lpo, go, acc, minv,
            m_obs=float(num_chains * num_warmup),
            adapt_mass=bool(sampler.adapt_mass),
            reg=r,
            warm_start=float(sampler.mass_warm_start),
            num_chains=num_chains,
            d=d,
        )  # (wstate, sv (9, 1), minv (d, 1))
        svh = np.asarray(out[1])
        ratio_hat = float(np.exp(svh[4, 0] - svh[1, 0]))
        if ratio / 3.0 - 1.0 <= ratio_hat <= 3.0 * ratio + 1.0:
            break
        ratio = ratio_hat
    return out


_CHEES_FROZEN_KERNELS = {}
_CHEES_POST = {}


@jax.jit
def _chees_stage_arrays(params, lp, grad):
    """Jitted (C, ...)-state → kernel-layout staging (one dispatch)."""
    return jnp.transpose(params), lp[None, :], jnp.transpose(grad)


_CHEES_X0 = {}


def _chees_x0_for(tile_fn, consts):
    """Jitted initial (lp, grad) evaluation for the fused ChEES pipeline
    (one dispatch instead of two on the amortized-critical path)."""
    consts_key = tuple(
        (np.asarray(c).tobytes(), np.asarray(c).shape) for c in consts
    )
    key = (tile_fn, consts_key)
    if key not in _CHEES_X0:
        const_args = tuple(jnp.asarray(c) for c in consts)

        @jax.jit
        def x0(x_t):
            lp0 = tile_fn(x_t, *const_args)
            g0 = jax.grad(
                lambda xm: jnp.sum(tile_fn(xm, *const_args))
            )(x_t)
            return lp0, g0

        _CHEES_X0[key] = x0
    return _CHEES_X0[key]


def _chees_post_for(tile_fn, consts):
    """Jitted output conversion for the fused ChEES engine: layout
    transposes of the ~0.5 GB emission buffers + the final-state gradient
    in ONE dispatch (run op-by-op these cost ~10 ms of per-op tunnel
    dispatch on the amortized-critical path)."""
    consts_key = tuple(
        (np.asarray(c).tobytes(), np.asarray(c).shape) for c in consts
    )
    key = (tile_fn, consts_key)
    if key not in _CHEES_POST:
        const_args = tuple(jnp.asarray(c) for c in consts)

        # Donate the emission buffers: at d=32 × 4000 draws × 8192 chains
        # the (N, d, C) slab is ~4.2 GB — holding both layouts live OOMs
        # HBM; the caller never reuses the kernel-layout outputs.
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def post(samples, lps, accs):
            params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
            lp = jnp.transpose(lps[:, 0, :], (1, 0))
            accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
            grad_last = jnp.transpose(
                jax.grad(
                    lambda xm: jnp.sum(tile_fn(xm, *const_args))
                )(jnp.transpose(params[:, -1, :]))
            )  # (C, d)
            return params, lp, accepted, grad_last

        _CHEES_POST[key] = post
    return _CHEES_POST[key]


def _chees_frozen_kernel_for(
    tile_fn, consts, d, n_samples, trips, thin, tile, samples_per_block
):
    """Module-level cache of built frozen-phase kernels (≙
    :func:`_chees_warmup_kernel_for`): rebuilding the ``jax.jit`` wrapper
    per sample() call re-pays lowering + the remote Mosaic round-trip
    (~2 s through the tunnel) even on a compiled-kernel cache hit."""
    from ..ops.pallas_chees import fused_chees_frozen_sample

    consts_key = tuple(
        (np.asarray(c).tobytes(), np.asarray(c).shape) for c in consts
    )
    key = (
        tile_fn, consts_key, d, int(n_samples), tuple(trips), int(thin),
        int(tile), int(samples_per_block),
    )
    if key not in _CHEES_FROZEN_KERNELS:
        _CHEES_FROZEN_KERNELS[key] = fused_chees_frozen_sample(
            tile_fn, d, n_samples, trips=trips, thin=thin, consts=consts,
            tile_chains=tile, samples_per_block=samples_per_block,
        )
    return _CHEES_FROZEN_KERNELS[key]


def chees_frozen_stage(sampler, wstate, d: int):
    """Host-stage the frozen ChEES launch from a warmed state.

    Pulls the two adapted scalars, quantizes the trajectory ratio, extracts
    the shared inverse-mass column and the transposed state arrays. Shared
    by :func:`sample_fused_chees` and bench.py's ChEES harness so the
    published numbers measure exactly the staging the library runs.

    Guards against a NON-replicated state: the frozen kernel applies ONE
    (ε̄, T̄, M⁻¹) to every chain, which is only correct for states produced
    by the batched (pooled) warmup. A per-chain-adapted state (e.g. the
    single-chain/vmapped ``step_warmup`` fallback, ``vectorized=False``)
    would be silently collapsed to chain 0's values — raise instead.
    """
    leb = jnp.asarray(wstate.log_eps_bar).reshape(-1)
    ltb = jnp.asarray(wstate.log_traj_bar).reshape(-1)
    minv_leaf = jnp.asarray(
        jax.tree_util.tree_leaves(wstate.inverse_mass)[0]
    )
    spread = jnp.maximum(
        jnp.max(leb) - jnp.min(leb), jnp.max(ltb) - jnp.min(ltb)
    )
    if minv_leaf.ndim > 1:
        spread = jnp.maximum(
            spread,
            jnp.max(jnp.max(minv_leaf, 0) - jnp.min(minv_leaf, 0)),
        )
    if float(spread) > 1e-5:
        raise ValueError(
            "fused ChEESHMC needs replicated (shared) adaptation "
            "statistics, but this state carries per-chain values "
            f"(spread {float(spread):.3g}) - it was warmed by the "
            "per-chain fallback kernels (vectorized=False / single-chain), "
            "not the batched pooled warmup. Use the XLA engine for it."
        )
    eps_bar = float(jnp.exp(leb[0]))
    t_bar = float(jnp.exp(ltb[0]))
    ratio = max(
        1, min(int(round(t_bar / eps_bar)), int(sampler.max_leapfrog))
    )
    minv_col = (
        minv_leaf[0] if minv_leaf.ndim > 1 else minv_leaf
    ).reshape(d, 1)
    x_t = jnp.transpose(wstate.inner.params)  # (d, C)
    lp0 = wstate.inner.lp[None, :]
    g_t = jnp.transpose(wstate.inner.gradient)
    return ratio, jnp.float32(eps_bar), minv_col, x_t, lp0, g_t


def _ahmc_pooled_stage(wstate, d: int):
    """Host-stage the frozen launch of a *pooled* AdaptiveHMC warmup state:
    the per-chain frozen ε̄ row (pooled AdaptiveHMC pools the MASS but
    dual-averages ε per chain — samplers/hmc_adapt.py::step_warmup_batched),
    the shared inverse-mass column, and the transposed state arrays
    (≙ :func:`chees_frozen_stage`, minus the trajectory ratio —
    AdaptiveHMC's leapfrog count is a sampler constant).

    Guards against a per-chain-adapted MASS: the frozen kernel applies ONE
    M⁻¹ column to every chain, which is only correct for the replicated
    estimate the pooled Welford merge produces."""
    minv_leaf = jnp.asarray(
        jax.tree_util.tree_leaves(wstate.inverse_mass)[0]
    )
    if minv_leaf.ndim > 1:
        spread = jnp.max(jnp.max(minv_leaf, 0) - jnp.min(minv_leaf, 0))
        if float(spread) > 1e-5:
            raise ValueError(
                "fused pooled AdaptiveHMC needs a replicated (shared) "
                "inverse-mass estimate, but this state carries per-chain "
                f"values (spread {float(spread):.3g}) - it was warmed "
                "per-chain (pooled=False or the single-chain fallback). "
                "Use the XLA engine for it."
            )
    eps_row = jnp.exp(
        jnp.asarray(wstate.log_eps_bar, jnp.float32).reshape(1, -1)
    )  # (1, C) per-chain frozen step sizes
    minv_col = (
        minv_leaf[0] if minv_leaf.ndim > 1 else minv_leaf
    ).reshape(d, 1)
    x_t = jnp.transpose(wstate.inner.params)  # (d, C)
    lp0 = wstate.inner.lp[None, :]
    g_t = jnp.transpose(wstate.inner.gradient)
    return eps_row, minv_col, x_t, lp0, g_t


def sample_fused_chees(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    num_warmup: int,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    initial_state=None,
    warmup_engine: str = "auto",
    mesh=None,
    mesh_axis: str = "chains",
    stage_clock=None,
):
    """Fused ChEES-HMC engine: fused (or XLA) warmup + fused frozen phase.

    ``stage_clock`` (optional dict) receives host-measured per-stage wall
    times: ``warmup_s`` (stage 1 + staging — fenced by the staging host
    pull) and ``sampling_s`` (the frozen launch, fenced by the dependent
    scalar read). This is how bench.py publishes a TRUE steady-state
    number (VERDICT r4 #2): the stage boundary is timed directly instead
    of inferred from a floored probe subtraction.

    Two stages (ops/pallas_chees.py has the rationale):

    1. **Warmup** — by default (``warmup_engine="auto"``) the
       single-launch FUSED warmup (:func:`fused_chees_warmup`, r4):
       per-step live adaptation pooled exactly within each chain tile,
       cross-tile combine afterwards, static trip schedule staged from
       the initial T₀/ε₀ ratio with a consistency re-run if the adapted
       ratio lands far off it. Under a mesh, ``"auto"`` falls back to the
       XLA engine (``step_warmup_batched`` scanned at the full batch —
       its pooled reductions are exact GLOBAL psums over ICI), while
       ``warmup_engine="fused"`` opts into the SHARDED fused warmup
       (r5): per-shard launches whose per-tile stat blocks merge in the
       same cross-tile combine. ``warmup_engine="xla"`` forces XLA.
    2. **Frozen phase on the fused Pallas kernel** — the two adapted
       scalars (ε̄, T̄) are host-staged (~ms transfer), the trajectory
       ratio is quantized to ``R = round(T̄/ε̄)``, and a deterministic
       van-der-Corput jitter schedule of *static* leapfrog trip counts is
       baked into the kernel (TFP-style Halton jitter) — replacing the XLA
       path's traced-bound ``while_loop`` (measured 1.6x static-loop
       penalty) with fully static control flow.

    The jitter is therefore deterministic low-discrepancy rather than
    ``U(0,1)`` — equal anti-resonance role, not bitwise the XLA stream
    (the standing fused-engine contract: equality in distribution).

    The returned ``final_state`` carries the *complete* XLA warmup
    statistics (Welford moments, dual-averaging sums, Adam state) with the
    last emitted draw as ``inner`` — so both frozen continuation and
    warmup continuation resume consistently, unlike the per-chain fused
    AdaptiveHMC reconstruction.

    ``initial_state`` (a frozen ``ChEESHMCState``, e.g. a prior chunk's
    ``final_state``) resumes post-warmup: stage 1 is skipped and the frozen
    phase is re-staged from the saved (ε̄, T̄, M⁻¹) — same integer ratio →
    same compiled kernel across chunks. Requires the chunk-resume schedule
    (``num_warmup=0``, ``discard_initial=thinning``, ≙ fused RAM)."""
    import time as _time

    from ..ops.pallas_chees import halton_trips
    from ..samplers.base import GradientTransition
    from ..utils import replace as _replace

    t_start = _time.perf_counter()
    if initial_state is not None:
        if num_warmup != 0 or discard_initial != thinning:
            raise ValueError(
                "fused ChEESHMC resume expects the chunk-resume schedule "
                "(num_warmup=0, discard_initial=thinning)."
            )
        wstate = initial_state
        d = model.dimension
        if d is None:
            d = int(np.asarray(wstate.inner.params).shape[-1])
    else:
        if discard_initial != num_warmup:
            raise ValueError(
                "fused ChEESHMC supports the standard schedule "
                "discard_initial == num_warmup; use the XLA path to keep "
                "warmup draws."
            )
        if num_warmup < 1:
            raise ValueError(
                "fused ChEESHMC requires num_warmup >= 1 (the engine "
                "exists to freeze the warmup-adapted (ε̄, T̄))."
            )
        if initial_params is None:
            raise ValueError("please specify initial parameters")
        d = model.dimension
        if d is None:
            d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=2 << 20,
    )

    if warmup_engine not in ("auto", "fused", "xla"):
        raise ValueError(f"unknown warmup_engine {warmup_engine!r}")
    if initial_state is None:
        # auto: fused warmup on a single device, XLA warmup under a mesh
        # (its pooled reductions are exact GLOBAL psums). "fused" with a
        # mesh is supported opt-in (r5): each shard warms its own tiles
        # and the cross-tile combine merges them — statistically the same
        # tile-local-pooling design, just spread over devices.
        use_fused_warmup = warmup_engine == "fused" or (
            warmup_engine == "auto" and mesh is None
        )
        init = jnp.asarray(initial_params, jnp.float32)
        if use_fused_warmup:
            # Stage 1 (fused) — single-launch Pallas warmup (VERDICT r4
            # #1); sv/minv ride along for the fast one-pull staging below.
            x_t0 = (
                jnp.broadcast_to(init[:, None], (d, num_chains))
                if init.ndim == 1
                else jnp.asarray(init).T
            )
            lp00, g00 = _chees_x0_for(tile_fn, consts)(x_t0)
            wstate, sv_dev, minv_dev = fused_chees_warmup(
                tile_fn, consts, sampler, d, num_chains, key,
                x_t0, lp00, g00, num_warmup,
                mesh=mesh, mesh_axis=mesh_axis,
            )
            fast_stage = (sv_dev, minv_dev)
        else:
            # Stage 1 (XLA) — full-batch cross-chain adaptation. With a
            # mesh, the warmup state is sharding-constrained over the
            # chain axis (every ChEESHMCState leaf is chain-leading), so
            # GSPMD runs the warmup sharded with the pooled reductions as
            # psums over ICI — matching the XLA engine — instead of
            # concentrating the whole batch on one device (ADVICE r3).
            init_b = (
                jnp.broadcast_to(init, (num_chains, d))
                if init.ndim == 1
                else init
            )
            constrain = _chain_constrainer(mesh, mesh_axis)

            @jax.jit
            def warm(k):
                _, state = jax.vmap(
                    lambda kk, x0: sampler.init(kk, model, x0)
                )(jax.random.split(k, num_chains), init_b)
                state = constrain(state)

                def body(s, j):
                    # Absolute-iteration key indexing (CLAUDE.md
                    # contract): init is j=0, warmup steps consume
                    # j=1..W.
                    _, s = sampler.step_warmup_batched(
                        jax.random.fold_in(k, j), s, model, (num_chains,)
                    )
                    return s, None

                state, _ = jax.lax.scan(
                    body, state, jnp.arange(1, num_warmup + 1)
                )
                return state

            wstate = warm(key)
            fast_stage = None
    else:
        fast_stage = None

    # Stage 2 — host-stage (ε̄, T̄); bake the static Halton trip schedule.
    if fast_stage is not None:
        # Fused-warmup fast path: the replicated adapted scalars are in the
        # packed sv — ONE small host pull stages everything (the general
        # chees_frozen_stage makes several pulls and runs the replication
        # guard, unnecessary for a state this launcher just built).
        svh = np.asarray(fast_stage[0])
        eps_bar = float(np.exp(svh[1, 0]))
        t_bar = float(np.exp(svh[4, 0]))
        ratio = max(
            1, min(int(round(t_bar / eps_bar)), int(sampler.max_leapfrog))
        )
        eps_arr = jnp.float32(eps_bar)
        minv_col = fast_stage[1]
        x_t, lp0, g_t = _chees_stage_arrays(
            wstate.inner.params, wstate.inner.lp, wstate.inner.gradient
        )
    else:
        ratio, eps_arr, minv_col, x_t, lp0, g_t = chees_frozen_stage(
            sampler, wstate, d
        )
    E = min(16, n_samples)
    trips = halton_trips(ratio, E * thinning, sampler.max_leapfrog)

    base = _chees_frozen_kernel_for(
        tile_fn, consts, d, n_samples, trips, thinning, tile, E
    )
    run = lambda x, l, g, seed: base(x, l, g, eps_arr, minv_col, seed)
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    # Seed from the first *post-warmup* iteration index: fold_in(key, j) for
    # j = 0..num_warmup is already consumed by init + warmup steps, and the
    # absolute-iteration key discipline never reuses a spent index.
    seed = jax.random.randint(
        jax.random.fold_in(key, num_warmup + 1), (), 0, 2**31 - 1,
        dtype=jnp.int32,
    )
    t_frozen = _time.perf_counter()
    samples, lps, accs = run(x_t, lp0, g_t, seed)
    _fence_launch(samples)
    if stage_clock is not None:
        now = _time.perf_counter()
        stage_clock["warmup_s"] = t_frozen - t_start
        stage_clock["sampling_s"] = now - t_frozen

    params, lp, accepted, grad_last = _chees_post_for(tile_fn, consts)(
        samples, lps, accs
    )
    transitions = Transition(params, lp, accepted)
    inner = GradientTransition(
        params[:, -1, :], lp[:, -1], grad_last, accepted[:, -1],
    )
    return transitions, _replace(wstate, inner=inner)


def sample_fused_meads(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 4096,
    initial_state=None,
    iteration_offset: int = 0,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused MEADS engine (ops/pallas_meads.py): the whole warmup-free
    sampler VMEM-resident — per-step fold statistics, max-eigenvalue
    estimates, and GHMC moves all in one launch. Folds are TILE-LOCAL
    (each chain tile is an independent MEADS ensemble; a ≥256-lane fold
    gives far lower-variance statistics than the paper's ~32-chain folds,
    ≙ the fused ChEES warmup's tile-local pooling stance).

    Edge-padding note: at ragged chain counts the clone lanes are full
    ensemble members (every fold statistic is a per-step mean over live
    chains, no cumulative count to bias — unlike the ChEES warmup's
    Welford totals); their draws are simply trimmed. The only transient is
    that clones start at a duplicated position, which washes out like any
    shared init.

    ``initial_state`` (a batched ``MEADSState``) resumes mid-run: the
    persistent momentum p, Neal slice u, gradient, and absolute iteration
    count (a runtime scalar — resume never recompiles) are staged back in,
    so a chunked run continues the exact non-reversible chain.

    Iteration accounting: the kernel's step index is ``t0 + j`` with
    ``t0 = 1 + iteration_offset`` fresh (matching the XLA sampler's
    1-based ``state.iteration``) or the resumed state's count; the
    returned ``iteration`` counts the steps the kernel ACTUALLY ran —
    ``burn + ceil(n_samples/E)·E·thin`` — which overruns ``n_samples`` by
    up to ``(E−1)·thin`` steps when ``n_samples`` is not a multiple of
    the 32-draw emission block (the final persistent state sits those few
    steps past the last emitted draw; a resumed chunk continues from it,
    so the gap draws are simply never emitted — distribution-equal, the
    standing fused-chunking contract)."""
    from ..ops.pallas_meads import fused_meads_sample
    from ..samplers.meads import MEADSState

    resume = initial_state is not None
    if initial_params is None and not resume:
        raise ValueError("engine='fused' requires initial_params")
    d = model.dimension
    if d is None:
        src = (
            initial_state.x if resume else initial_params
        )
        d = int(np.asarray(src).shape[-1])
    K = int(sampler.n_folds)
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    # Wide tiles pay directly here: the fold-sequential sweep runs K
    # narrow (tile/K-lane) density evals per step, so per-step VPU
    # utilization scales with the tile (r5 sweep at d=2: 1024 → 5.0e8,
    # 8192 → 8.0e8 chain-steps/s). Budget 4 MiB keeps d=32 at the
    # measured-optimal 1024 tile.
    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=4 << 20,
    )
    if tile % (128 * K) != 0:
        raise ValueError(
            f"engine='fused' MEADS needs the chain tile ({tile}) to be a "
            f"multiple of 128*n_folds ({128 * K}) — use a per-device "
            f"chain count that is a multiple of {128 * K} (the XLA "
            "engine handles arbitrary counts)."
        )

    # One emission-block constant shared between the kernel build and the
    # step accounting below — never let them drift apart.
    spb = 32
    run = _cached_engine(
        fused_meads_sample, tile_fn, consts, d=d, n_samples=n_samples,
        n_folds=K, burn=burn, thin=thinning,
        step_size_multiplier=sampler.step_size_multiplier,
        step_size_clip=sampler.step_size_clip,
        damping_slowdown=sampler.damping_slowdown,
        diagonal_preconditioning=sampler.diagonal_preconditioning,
        accept=sampler.accept,
        tile_chains=tile, samples_per_block=spb,
    )
    const_args = tuple(jnp.asarray(c) for c in consts)
    if resume:
        x_t = jnp.transpose(jnp.asarray(initial_state.x, jnp.float32))
        lp0 = jnp.asarray(initial_state.lp, jnp.float32)[None, :]
        g0 = jnp.transpose(jnp.asarray(initial_state.grad, jnp.float32))
        p0 = jnp.transpose(jnp.asarray(initial_state.p, jnp.float32))
        u0 = jnp.asarray(initial_state.u, jnp.float32)[None, :]
        t0 = float(np.asarray(initial_state.iteration).reshape(-1)[0])
        key_seed = key
    else:
        init = jnp.asarray(initial_params, jnp.float32)
        x_t = (
            jnp.broadcast_to(init[:, None], (d, num_chains))
            if init.ndim == 1
            else jnp.asarray(init).T
        )
        lp0 = tile_fn(x_t, *const_args)
        g0 = jax.grad(lambda xm: jnp.sum(tile_fn(xm, *const_args)))(x_t)
        key_p, key_u, key_seed = jax.random.split(key, 3)
        p0 = jax.random.normal(key_p, (d, num_chains), jnp.float32)
        u0 = jax.random.uniform(key_u, (1, num_chains), jnp.float32)
        # 1-based first step (≙ the XLA sampler's iteration init).
        t0 = 1.0 + float(iteration_offset or 0)
    # t0 closes over BEFORE the shard/pad wrappers: it is a replicated
    # scalar, not a chain-sharded array.
    core = lambda x, l, g, p, u, seed: run(
        x, l, g, p, u, jnp.float32(t0), seed
    )
    if mesh is not None:
        core = _shard_fused(core, mesh, mesh_axis)
    core = _pad_chains(core, num_chains, c_pad)
    seed = jax.random.randint(key_seed, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs, x_f, lp_f, g_f, p_f, u_f = core(
        x_t, lp0, g0, p0, u0, seed
    )
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    C = num_chains
    # Steps the kernel actually ran (docstring: emission blocks of E).
    E = min(spb, n_samples)
    n_pad = -(-n_samples // E) * E
    steps = burn + n_pad * thinning
    final_state = MEADSState(
        x=jnp.transpose(x_f),
        lp=lp_f[0],
        grad=jnp.transpose(g_f),
        p=jnp.transpose(p_f),
        u=u_f[0],
        iteration=jnp.full((C,), int(t0) + steps, jnp.int32),
        isaccept=accepted[:, -1],
    )
    return transitions, final_state


def sample_fused_barker(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 2048,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused Barker engine (ops/pallas_barker.py): gradient-skewed random
    walk with in-kernel ``jax.vjp`` gradients, same carry structure as the
    fused MALA engine (gradient cached in scratch between steps)."""
    from ..ops.pallas_barker import fused_barker_sample
    from ..samplers.base import GradientTransition

    if initial_params is None:
        raise ValueError("please specify initial parameters")
    d = model.dimension
    if d is None:
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(
        num_chains, tile_chains, mesh, mesh_axis, d=d, vmem_budget=2 << 20,
    )

    run = _cached_engine(
        fused_barker_sample, tile_fn, consts, d=d, step_size=sampler.step_size, n_samples=n_samples,
        burn=burn, thin=thinning, tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    init = jnp.asarray(initial_params, jnp.float32)
    x_t = (
        jnp.broadcast_to(init[:, None], (d, num_chains))
        if init.ndim == 1
        else jnp.asarray(init).T
    )
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    g0 = jax.grad(lambda xm: jnp.sum(tile_fn(xm, *const_args)))(x_t)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, g0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    grad_last_t = jax.grad(
        lambda xm: jnp.sum(tile_fn(xm, *const_args))
    )(jnp.transpose(params[:, -1, :]))  # (d, C)
    transitions = Transition(params, lp, accepted)
    final_state = GradientTransition(
        params[:, -1, :], lp[:, -1], jnp.transpose(grad_last_t),
        accepted[:, -1],
    )
    return transitions, final_state


def _extract_ess_prior(sampler, d: int):
    """Return (loc, scale) of the sampler's Gaussian prior — scale is a
    per-dimension std-dev ``(d,)`` or a full lower-Cholesky ``(d, d)`` — or
    raise if the prior is a pytree (the fused engine handles a single leaf;
    tree priors run on the XLA path)."""
    p = sampler.prior
    if isinstance(p, MvNormal):
        loc = np.broadcast_to(np.asarray(p.loc, np.float32), (d,))
        if p.scale_tril is not None:
            return loc, np.tril(np.asarray(p.scale_tril, np.float32))
        if p.scale_diag is not None:
            return loc, np.broadcast_to(np.asarray(p.scale_diag), (d,))
        return loc, np.broadcast_to(np.asarray(p.scale), (d,))
    if isinstance(p, Normal):
        return (
            np.broadcast_to(np.asarray(p.loc, np.float32), (d,)),
            np.broadcast_to(np.asarray(p.scale, np.float32), (d,)),
        )
    raise ValueError(
        "engine='fused' EllipticalSlice needs a single Normal/MvNormal "
        "prior leaf (pytree priors: use the XLA path)."
    )


def sample_fused_ess(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused elliptical-slice engine (ops/pallas_ess.py): prior-ellipse
    moves with the θ-bracket shrinkage statically unrolled in VMEM
    (``sampler.max_shrink`` capped at 24 trips — see the kernel docstring
    for why static trips beat a data-dependent loop on Mosaic; lanes that
    exhaust the bracket keep their state and report accepted=False, and at
    24 trips that tail is ≲0.05% of steps on tight GP posteriors). The model's
    tile density must be the **log-likelihood** (the ESS contract).
    ``initial_params=None`` draws chain starts from the prior."""
    from ..ops.pallas_ess import fused_ess_sample

    d = model.dimension
    if d is None:
        if initial_params is None:
            raise ValueError(
                "engine='fused' ESS needs model.dimension or initial_params"
            )
        d = int(np.asarray(initial_params).shape[-1])
    loc, scale = _extract_ess_prior(sampler, d)
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(num_chains, tile_chains, mesh, mesh_axis, d=d)

    run = _cached_engine(
        fused_ess_sample, tile_fn, consts, d=d, loc=loc, scale=scale, n_samples=n_samples,
        burn=burn, thin=thinning,
        max_shrink=min(int(sampler.max_shrink), 24),
        tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    init_key, seed_key = jax.random.split(jnp.asarray(key))
    if initial_params is None:
        # ESS default: start every chain at a prior draw (≙ samplers/ess.py
        # init; the prior is proper by construction).
        x_t = jnp.asarray(loc, jnp.float32)[:, None] + (
            jnp.asarray(scale, jnp.float32) @ jax.random.normal(
                init_key, (d, num_chains)
            )
            if np.ndim(scale) == 2
            else jnp.asarray(scale, jnp.float32)[:, None]
            * jax.random.normal(init_key, (d, num_chains))
        )
    else:
        init = jnp.asarray(initial_params, jnp.float32)
        x_t = (
            jnp.broadcast_to(init[:, None], (d, num_chains))
            if init.ndim == 1
            else jnp.asarray(init).T
        )
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    seed = jax.random.randint(seed_key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    final_state = Transition(params[:, -1, :], lp[:, -1], accepted[:, -1])
    return transitions, final_state


def sample_fused_pcn(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused pCN engine (ops/pallas_pcn.py): the RWMH kernel with the state
    contracted toward the prior mean; acceptance is the pure likelihood
    difference (the model's tile density must be the **log-likelihood**, the
    ESS/pCN contract). Single Normal/MvNormal prior leaf (tree priors: XLA
    path). ``initial_params=None`` draws chain starts from the prior."""
    from ..ops.pallas_pcn import fused_pcn_sample

    d = model.dimension
    if d is None:
        if initial_params is None:
            raise ValueError(
                "engine='fused' pCN needs model.dimension or initial_params"
            )
        d = int(np.asarray(initial_params).shape[-1])
    loc, scale = _extract_ess_prior(sampler, d)
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(num_chains, tile_chains, mesh, mesh_axis, d=d)

    run = _cached_engine(
        fused_pcn_sample, tile_fn, consts, d=d, loc=loc, scale=scale, beta=sampler.beta,
        n_samples=n_samples, burn=burn, thin=thinning,
        tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    init_key, seed_key = jax.random.split(jnp.asarray(key))
    if initial_params is None:
        x_t = jnp.asarray(loc, jnp.float32)[:, None] + (
            jnp.asarray(scale, jnp.float32) @ jax.random.normal(
                init_key, (d, num_chains)
            )
            if np.ndim(scale) == 2
            else jnp.asarray(scale, jnp.float32)[:, None]
            * jax.random.normal(init_key, (d, num_chains))
        )
    else:
        init = jnp.asarray(initial_params, jnp.float32)
        x_t = (
            jnp.broadcast_to(init[:, None], (d, num_chains))
            if init.ndim == 1
            else jnp.asarray(init).T
        )
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    seed = jax.random.randint(seed_key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    final_state = Transition(params[:, -1, :], lp[:, -1], accepted[:, -1])
    return transitions, final_state


def sample_fused_slice(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused slice-sampling engine (ops/pallas_slice.py): random-direction
    stepping-out + shrinkage statically unrolled in VMEM. The stepping-out
    budget follows ``sampler.max_stepout`` (capped at 8 trips) and the
    shrink budget ``sampler.max_shrink`` (capped at 24); exhausted lanes
    keep their state and report accepted=False."""
    from ..ops.pallas_slice import fused_slice_sample

    if initial_params is None:
        raise ValueError("please specify initial parameters")
    d = model.dimension
    if d is None:
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(num_chains, tile_chains, mesh, mesh_axis, d=d)

    run = _cached_engine(
        fused_slice_sample, tile_fn, consts, d=d, width=sampler.width, n_samples=n_samples,
        burn=burn, thin=thinning,
        max_stepout=min(int(sampler.max_stepout), 8),
        max_shrink=min(int(sampler.max_shrink), 24),
        tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    init = jnp.asarray(initial_params, jnp.float32)
    x_t = (
        jnp.broadcast_to(init[:, None], (d, num_chains))
        if init.ndim == 1
        else jnp.asarray(init).T
    )
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    final_state = Transition(params[:, -1, :], lp[:, -1], accepted[:, -1])
    return transitions, final_state


def sample_fused_tempering(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    initial_state=None,
    iteration_offset: int = 0,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused replica-exchange engine (ops/pallas_tempering.py): the whole
    temperature ladder — K tempered RWMH replicas + even-odd swaps — runs
    VMEM-resident per chain. Requires the inner sampler to be a symmetric
    Gaussian random-walk ``MetropolisHastings`` with scalar/diagonal scale
    (the fused-introspectable family); emissions are the cold replica."""
    from ..ops.pallas_tempering import fused_tempering_sample
    from ..samplers.base import Transition as _T
    from ..samplers.tempering import ReplicaExchangeState

    if initial_params is None and initial_state is None:
        raise ValueError("engine='fused' requires initial_params")
    K = len(sampler.betas)
    betas = np.asarray(sampler.betas, np.float32)
    d = model.dimension
    if d is None:
        src = initial_params if initial_params is not None else (
            initial_state.inner.params
        )
        d = int(np.asarray(src).shape[-1])
    scale = _extract_rw_scale(sampler.sampler, d)
    if scale.ndim == 2:
        raise ValueError(
            "engine='fused' tempering supports scalar/diagonal proposal "
            "scales (scale_tril ladders: use the XLA path)."
        )
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(num_chains, tile_chains, mesh, mesh_axis, d=d)

    run = _cached_engine(
        fused_tempering_sample, tile_fn, consts, d=d, betas=sampler.betas, scale=scale,
        n_samples=n_samples, burn=burn, thin=thinning,
        replica_scales=sampler.replica_scales,
        tile_chains=tile,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    const_args = tuple(jnp.asarray(c) for c in consts)
    if initial_state is not None:
        # inner Transition leaves are (C, K, ...): rebuild the ladder stack
        xs = jnp.asarray(initial_state.inner.params, jnp.float32)  # (C,K,d)
        x_t = jnp.transpose(xs, (1, 2, 0)).reshape(K * d, num_chains)
        lp_in = jnp.asarray(initial_state.inner.lp, jnp.float32)  # (C,K)
        ell0 = (lp_in / betas[None, :]).T  # raw ℓ rows (K,C)
        sw_acc0 = jnp.asarray(initial_state.swap_accept_count, jnp.float32)
        sw_prop0 = jnp.asarray(initial_state.swap_proposal_count, jnp.float32)
    else:
        init = jnp.asarray(initial_params, jnp.float32)
        one = (
            jnp.broadcast_to(init[:, None], (d, num_chains))
            if init.ndim == 1
            else jnp.asarray(init).T
        )
        x_t = jnp.tile(one, (K, 1))
        ell_one = tile_fn(one, *const_args)  # (1, C)
        ell0 = jnp.broadcast_to(ell_one, (K, num_chains))
        sw_acc0 = jnp.zeros((num_chains, K - 1), jnp.float32)
        sw_prop0 = jnp.zeros((num_chains, K - 1), jnp.float32)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs, x_f, ell_f, sw = run(x_t, ell0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    C = num_chains
    ladder_x = jnp.transpose(x_f.reshape(K, d, C), (2, 0, 1))  # (C,K,d)
    ladder_lp = (ell_f * betas[:, None]).T  # tempered lp (C,K)
    inner_acc = jnp.zeros((C, K), bool).at[:, 0].set(accepted[:, -1])
    steps_taken = burn + n_samples * thinning
    final_state = ReplicaExchangeState(
        inner=_T(ladder_x, ladder_lp, inner_acc),
        swap_accept_count=sw_acc0 + sw.T,
        swap_proposal_count=sw_prop0 + jnp.float32(steps_taken),
    )
    return transitions, final_state


def sample_fused_emcee(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_walkers: Optional[int] = None,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused emcee engine (ops/pallas_emcee.py): red-black stretch moves with
    the partner gather done as a one-hot matmul on the MXU, whole ensemble
    resident in VMEM. Walker count must be a multiple of 256 (the two
    half-ensembles must align to 128 vector lanes).

    With ``mesh`` set, walkers shard over devices and each device runs an
    *independent sub-ensemble* of W/n_devices walkers (stretch partners stay
    shard-local — no collectives). That is a valid Goodman-Weare sampler with
    the same stationary distribution, but with a smaller partner pool than
    the reference's single W-walker ensemble; use the XLA path
    (parallel/emcee.py, all_gather of the complementary half over ICI) when
    full-ensemble partner mixing matters."""
    from ..ops.pallas_emcee import fused_emcee_sample
    from ..samplers.emcee import StretchProposal

    if not isinstance(sampler.proposal, StretchProposal):
        raise NotImplementedError(
            "engine='fused' emcee supports StretchProposal only; the walk "
            "move needs O(n_walkers) fresh normals per walker-step (use the "
            "XLA engine, which is what emcee-scale walker counts want anyway)"
        )
    W = sampler.n_walkers
    per_device = W if mesh is None else W // mesh.shape[mesh_axis]
    if mesh is not None and W % mesh.shape[mesh_axis] != 0:
        raise ValueError(
            f"n_walkers ({W}) must divide over the {mesh.shape[mesh_axis]}-"
            "device mesh"
        )
    if tile_walkers is None:
        # under shard_map each device's kernel sees only its walker shard
        tile_walkers = per_device
    if tile_walkers % 256 != 0 or per_device % tile_walkers != 0:
        raise ValueError(
            f"engine='fused' emcee needs the per-device walker count "
            f"({per_device}) to be a multiple of 256 (half-ensembles must "
            "align to 128 lanes); use the XLA engine for other walker counts."
        )
    d = model.dimension
    if d is None:
        if initial_params is None:
            raise ValueError(
                "engine='fused' emcee needs model.dimension or initial_params"
            )
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)

    run = _cached_engine(
        fused_emcee_sample, tile_fn, consts, d=d, n_samples=n_samples,
        stretch_length=sampler.proposal.stretch_length,
        burn=burn, thin=thinning, tile_walkers=tile_walkers,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    init_key, seed_key = jax.random.split(key)
    if initial_params is None:
        # ≙ reference init (src/emcee.jl:29-34): per-walker prior draws.
        init_tr, _ = sampler.init(init_key, model)
        x = init_tr.params
    else:
        x = initial_params
    x_t = jnp.asarray(x, jnp.float32).reshape(W, d).T  # (d, W)
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    seed = jax.random.randint(seed_key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (0, 2, 1))  # (N, W, d)
    lp = lps[:, 0, :]  # (N, W)
    accepted = accs[:, 0, :] > 0.5
    transitions = Transition(params, lp, accepted)
    final_state = Transition(params[-1], lp[-1], accepted[-1])
    return transitions, final_state


def sample_fused_demc(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_members: Optional[int] = None,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused DE-MC engine (ops/pallas_demc.py): red-black difference-vector
    moves with the cross-member pair gather done as one one-hot-difference
    matmul on the MXU, whole population resident in VMEM. Member count must
    be a multiple of 256 (half-populations must align to 128 lanes).

    ``tile_members`` defaults to the whole (per-device) population for exact
    single-population semantics; each tile is an *independent* population, so
    smaller tiles trade coupling for speed (the H×H difference matmul is
    quadratic in tile — 512 is the measured throughput peak, +40% over 2048).

    With ``mesh`` set, members shard over devices and each device runs an
    independent sub-population (difference pairs stay shard-local — no
    collectives), same semantics note as the fused emcee engine."""
    from ..ops.pallas_demc import fused_demc_sample

    M = sampler.n_members
    per_device = M if mesh is None else M // mesh.shape[mesh_axis]
    if mesh is not None and M % mesh.shape[mesh_axis] != 0:
        raise ValueError(
            f"n_members ({M}) must divide over the {mesh.shape[mesh_axis]}-"
            "device mesh"
        )
    if tile_members is None:
        tile_members = per_device
    if tile_members % 256 != 0 or per_device % tile_members != 0:
        raise ValueError(
            f"engine='fused' DE-MC needs the per-device member count "
            f"({per_device}) to be a multiple of 256 (half-populations must "
            "align to 128 lanes); use the XLA engine for other member counts."
        )
    d = model.dimension
    if d is None:
        if initial_params is None:
            raise ValueError(
                "engine='fused' DE-MC needs model.dimension or initial_params"
            )
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)

    run = _cached_engine(
        fused_demc_sample, tile_fn, consts, d=d, n_samples=n_samples,
        gamma=sampler._gamma(d), noise_scale=sampler.noise_scale,
        jump_probability=sampler.jump_probability,
        snooker_probability=sampler.snooker_probability,
        snooker_gamma=sampler.snooker_gamma,
        burn=burn, thin=thinning, tile_members=tile_members,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    init_key, seed_key = jax.random.split(key)
    if initial_params is None:
        init_tr, _ = sampler.init(init_key, model)
        x = init_tr.params
    else:
        x = initial_params
    x_t = jnp.asarray(x, jnp.float32).reshape(M, d).T  # (d, M)
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(x_t, *const_args)
    seed = jax.random.randint(seed_key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(x_t, lp0, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (0, 2, 1))  # (N, M, d)
    lp = lps[:, 0, :]  # (N, M)
    accepted = accs[:, 0, :] > 0.5
    transitions = Transition(params, lp, accepted)
    final_state = Transition(params[-1], lp[-1], accepted[-1])
    return transitions, final_state


def sample_fused(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Run the fused Pallas sampling engine; returns the raw pieces in the
    standard (chains, samples, ...) layout. Dispatches the MTM variant
    (ops/pallas_mtm.py) when the sampler is a MultipleTryMetropolis."""
    from ..ops.pallas_dr import fused_dr_sample
    from ..ops.pallas_mh import fused_rwmh_sample
    from ..ops.pallas_mtm import fused_mtm_sample
    from ..samplers.dr import DelayedRejection
    from ..samplers.mtm import MultipleTryMetropolis

    d = model.dimension
    if d is None:
        d = int(np.asarray(initial_params).shape[-1])
    tile_fn, consts = _tile_density_of(model)
    burn = max(discard_initial - thinning, 0)
    c_pad, tile = _fused_tiling(num_chains, tile_chains, mesh, mesh_axis, d=d)

    if isinstance(sampler, DelayedRejection):
        s1 = _rw_leaf_scale(sampler.first, d)
        s2 = _rw_leaf_scale(sampler.second, d)
        if s1.ndim == 2 or s2.ndim == 2:
            raise ValueError(
                "engine='fused' DR supports scalar/per-dim stage scales; "
                "full-covariance stages need the XLA engine (the q1 cross "
                "distance would need an in-kernel triangular solve)."
            )
        run = _cached_engine(
            fused_dr_sample, tile_fn, consts, d=d, scale1=s1, scale2=s2, n_samples=n_samples,
            burn=burn, thin=thinning, tile_chains=tile,
        )
        scale = None
    elif isinstance(sampler, MultipleTryMetropolis):
        scale = _extract_rw_scale(sampler, d)
        run = _cached_engine(
            fused_mtm_sample, tile_fn, consts, d=d, scale=scale, k=sampler.k, n_samples=n_samples,
            burn=burn, thin=thinning, tile_chains=tile,
        )
    else:
        scale = _extract_rw_scale(sampler, d)
        run = _cached_engine(
            fused_rwmh_sample, tile_fn, consts, d=d, scale=scale, n_samples=n_samples, burn=burn,
            thin=thinning, tile_chains=tile,
        )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)

    if initial_params is None:
        raise ValueError("engine='fused' requires initial_params")
    init = jnp.asarray(initial_params, jnp.float32)
    if init.ndim == 1:
        params_t = jnp.broadcast_to(init[:, None], (d, num_chains))
    else:  # batched (C, d)
        params_t = jnp.asarray(init).T
    const_args = tuple(jnp.asarray(c) for c in consts)
    lp0 = tile_fn(params_t, *const_args)

    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs = run(params_t, lp0, seed)
    _fence_launch(samples)

    # (N, d, C) → (C, N, d); (N, 1, C) → (C, N)
    params = jnp.transpose(samples, (2, 0, 1))
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    final_state = Transition(params[:, -1, :], lp[:, -1], accepted[:, -1])
    return transitions, final_state


def sample_fused_adapt_rwmh(
    model,
    sampler,
    n_samples: int,
    *,
    key: KeyArray,
    num_chains: int,
    initial_params,
    num_warmup: int,
    discard_initial: int,
    thinning: int,
    tile_chains: int = 1024,
    initial_state=None,
    mesh=None,
    mesh_axis: str = "chains",
):
    """Fused dual-averaging engine (ops/pallas_adapt.py) for
    ``StepSizeAdaptation.rwmh`` — the full HG14 warmup + frozen-ε̄ sampling
    schedule in one VMEM-resident launch. Requires the ``.rwmh`` convenience
    family (arbitrary ``make_sampler`` closures can't be introspected) and
    the standard schedule ``discard_initial == num_warmup`` (warmup draws
    are adaptation transients — the XLA engine keeps them if needed).

    ``initial_state`` (a frozen ``StepSizeAdaptationState``, e.g. a prior
    chunk's ``final_state``) resumes post-warmup: the per-chain frozen
    ε̄ = exp(log ε̄) is staged back into the kernel (the resume variant of
    ops/pallas_adapt.py) and no warmup runs. Requires the chunk-resume
    schedule (``num_warmup=0``, ``discard_initial=thinning``, ≙ fused RAM).

    Schedule note (≙ sample_fused_ram): sample k is the state after
    ``num_warmup + k·thinning`` steps; equal in distribution to the XLA
    schedule, offset by one thinning stride in absolute step labels."""
    from ..ops.pallas_adapt import fused_adapt_rwmh_sample
    from ..samplers.adapt import StepSizeAdaptationState
    from ..samplers.base import Transition
    from ..utils import replace as _replace

    fam = getattr(sampler, "_fused_family", None)
    if not (isinstance(fam, tuple) and fam and fam[0] == "rwmh_iso"):
        raise ValueError(
            "engine='fused' for StepSizeAdaptation requires the "
            "StepSizeAdaptation.rwmh(d) family (general make_sampler "
            "closures cannot be introspected); use the XLA engine instead."
        )
    resume = initial_state is not None
    if resume:
        if num_warmup != 0 or discard_initial != thinning:
            raise ValueError(
                "fused StepSizeAdaptation resume expects the chunk-resume "
                "schedule (num_warmup=0, discard_initial=thinning)."
            )
    elif discard_initial != num_warmup:
        raise ValueError(
            "fused StepSizeAdaptation supports the standard schedule "
            "discard_initial == num_warmup; use the XLA path to keep "
            "warmup draws."
        )
    if initial_params is None and not resume:
        raise ValueError("engine='fused' requires initial_params")
    d = fam[1]
    tile_fn, consts = _tile_density_of(model)
    c_pad, tile = _fused_tiling(num_chains, tile_chains, mesh, mesh_axis, d=d)

    run = _cached_engine(
        fused_adapt_rwmh_sample, tile_fn, consts, d=d, n_samples=n_samples, warmup=num_warmup, thin=thinning,
        initial_step_size=sampler.initial_step_size,
        target_accept=sampler.target_accept,
        t0=sampler.t0, kappa=sampler.kappa, gamma=sampler.gamma,
        mu=sampler.mu, tile_chains=tile, resume=resume,
    )
    if mesh is not None:
        run = _shard_fused(run, mesh, mesh_axis)
    run = _pad_chains(run, num_chains, c_pad)
    const_args = tuple(jnp.asarray(c) for c in consts)
    if resume:
        x_t = jnp.transpose(
            jnp.asarray(initial_state.inner.params, jnp.float32)
        )
        lp0 = jnp.asarray(initial_state.inner.lp, jnp.float32)[None, :]
        extra = (
            jnp.exp(
                jnp.asarray(initial_state.log_eps_bar, jnp.float32)
            )[None, :],
        )
    else:
        init = jnp.asarray(initial_params, jnp.float32)
        x_t = (
            jnp.broadcast_to(init[:, None], (d, num_chains))
            if init.ndim == 1
            else jnp.asarray(init).T
        )
        lp0 = tile_fn(x_t, *const_args)
        extra = ()
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    samples, lps, accs, eps_final = run(x_t, lp0, *extra, seed)
    _fence_launch(samples)

    params = jnp.transpose(samples, (2, 0, 1))  # (C, N, d)
    lp = jnp.transpose(lps[:, 0, :], (1, 0))
    accepted = jnp.transpose(accs[:, 0, :], (1, 0)) > 0.5
    transitions = Transition(params, lp, accepted)
    C = num_chains
    inner = Transition(params[:, -1, :], lp[:, -1], accepted[:, -1])
    if resume:
        # Frozen continuation: the saved dual-averaging statistics carry
        # through untouched; only the inner transition advances.
        final_state = _replace(initial_state, inner=inner)
    else:
        log_eps = jnp.log(eps_final[0])  # (C,)
        final_state = StepSizeAdaptationState(
            inner=inner,
            log_eps=log_eps,
            log_eps_bar=log_eps,
            h_bar=jnp.zeros((C,), jnp.float32),
            t=jnp.full((C,), num_warmup + 1, jnp.int32),
        )
    return transitions, final_state

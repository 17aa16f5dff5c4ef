"""Fused dual-averaging RWMH kernel (Pallas/TPU).

The fused engine for :class:`samplers.adapt.StepSizeAdaptation` over the
isotropic random-walk family (``StepSizeAdaptation.rwmh``): the whole
schedule — ``warmup`` Nesterov-dual-averaging adaptation steps (Hoffman &
Gelman 2014 §3.2) followed by frozen-ε̄ sampling with every thinned draw
emitted — runs in VMEM with the hardware PRNG. Each chain carries its own
``(log ε, log ε̄, H̄)`` as ``(1, TC)`` lane vectors, so the HG14 update is
five VPU ops per chain per warmup step on top of the plain RWMH step.

Layout follows ops/pallas_mh.py: chains on lanes, params ``(d, TC)``.
``it^(−κ)`` is computed as ``exp(−κ·ln it)`` (Mosaic has no powf lowering —
see ops/pallas_ram.py). Accept flags are carried as f32 (i1 fori-loop
carries are fragile in Mosaic).
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _uniform_from_bits


def _adapt_rwmh_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    warmup: int,
    thin: int,
    n_groups: int,
    target: float,
    t0: float,
    kappa: float,
    gamma: float,
    mu: float,
    log_eps0: float,
    resume: bool = False,
):
    const_refs = rest[:n_consts]
    if resume:
        (x_ref, lp_ref, eps_in_ref, out_x_ref, out_lp_ref, out_acc_ref,
         out_eps_ref, sx_ref, slp_ref, seps_ref) = rest[n_consts:]
    else:
        eps_in_ref = None
        (x_ref, lp_ref, out_x_ref, out_lp_ref, out_acc_ref, out_eps_ref,
         sx_ref, slp_ref, seps_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    def mh_step(x, lp, eps, z):
        cand = x + eps * z  # (1, TC) per-chain ε broadcasts over the d rows
        lp_c = logdensity_tile_fn(cand, *consts)
        u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        acc = jnp.log(u) < lp_c - lp
        return (
            jnp.where(acc, cand, x),
            jnp.where(acc, lp_c, lp),
            acc.astype(jnp.float32),
        )

    # Group 0 (resume): no warmup — the frozen per-chain ε̄ arrives as an
    # input (a prior run's adapted values, staged by the launcher).
    if resume:
        @pl.when(g == 0)
        def _():
            sx_ref[:] = x_ref[:]
            slp_ref[:] = lp_ref[:]
            seps_ref[:] = eps_in_ref[:]

    # Group 0 (fresh): warmup sweep with the HG14 update; freeze exp(log ε̄).
    if not resume:
        @pl.when(g == 0)
        def _():
            def da_update(t_i32, a, log_eps, leb, h_bar):
                t = t_i32.astype(jnp.float32)
                w = 1.0 / (t + t0)
                h_bar = (1.0 - w) * h_bar + w * (target - a)
                log_eps = mu - jnp.sqrt(t) / gamma * h_bar
                eta = jnp.exp(-kappa * jnp.log(t))  # t^(−κ), no powf
                leb = eta * log_eps + (1.0 - eta) * leb
                return log_eps, leb, h_bar

            def one(t_i32, z, carry):
                x, lp, log_eps, leb, h_bar = carry
                x, lp, a = mh_step(x, lp, jnp.exp(log_eps), z)
                log_eps, leb, h_bar = da_update(t_i32, a, log_eps, leb, h_bar)
                return x, lp, log_eps, leb, h_bar

            def pair(j, carry):
                z1, z2 = _normal_pair((d, tc))
                carry = one(2 * j + 1, z1, carry)
                return one(2 * j + 2, z2, carry)

            le0 = jnp.full((1, tc), log_eps0, jnp.float32)
            carry = (x_ref[:], lp_ref[:], le0, le0,
                     jnp.zeros((1, tc), jnp.float32))
            carry = jax.lax.fori_loop(0, warmup // 2, pair, carry)
            if warmup % 2:
                z, _ = _normal_pair((d, tc))
                carry = one(jnp.int32(warmup), z, carry)
            x, lp, _, leb, _ = carry
            sx_ref[:] = x
            slp_ref[:] = lp
            seps_ref[:] = jnp.exp(leb)

    # Emission: E thinned draws per grid step at the frozen per-chain ε̄.
    eps = seps_ref[:]

    def store(e, x, lp, acc):
        out_x_ref[pl.ds(e, 1)] = x[None]
        out_lp_ref[pl.ds(e, 1)] = lp[None]
        out_acc_ref[pl.ds(e, 1)] = acc[None]

    def unflat(flat):
        return flat[0], flat[1], flat[2]

    if thin == 1:
        def emit2(k, flat):
            x, lp, acc = unflat(flat)
            z1, z2 = _normal_pair((d, tc))
            x, lp, acc = mh_step(x, lp, eps, z1)
            store(2 * k, x, lp, acc)
            x, lp, acc = mh_step(x, lp, eps, z2)
            store(2 * k + 1, x, lp, acc)
            return (x, lp, acc)

        flat = (sx_ref[:], slp_ref[:], jnp.zeros((1, tc), jnp.float32))
        flat = jax.lax.fori_loop(0, E // 2, emit2, flat)
        if E % 2:
            x, lp, acc = unflat(flat)
            z, _ = _normal_pair((d, tc))
            x, lp, acc = mh_step(x, lp, eps, z)
            store(E - 1, x, lp, acc)
            flat = (x, lp, acc)
    else:
        def emit(e, flat):
            x, lp, acc = unflat(flat)
            n = thin
            if n % 2:
                z, _ = _normal_pair((d, tc))
                x, lp, acc = mh_step(x, lp, eps, z)
                n -= 1

            def tp(_, fl):
                x2, lp2, _a = unflat(fl)
                z1, z2 = _normal_pair((d, tc))
                x2, lp2, a2 = mh_step(x2, lp2, eps, z1)
                x2, lp2, a2 = mh_step(x2, lp2, eps, z2)
                return (x2, lp2, a2)

            x, lp, acc = jax.lax.fori_loop(0, n // 2, tp, (x, lp, acc))
            store(e, x, lp, acc)
            return (x, lp, acc)

        flat = (sx_ref[:], slp_ref[:], jnp.zeros((1, tc), jnp.float32))
        flat = jax.lax.fori_loop(0, E, emit, flat)
    sx_ref[:] = flat[0]
    slp_ref[:] = flat[1]
    out_eps_ref[:] = eps


def fused_adapt_rwmh_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    warmup: int,
    thin: int = 1,
    initial_step_size: float = 1.0,
    target_accept: float = 0.234,
    t0: float = 10.0,
    kappa: float = 0.75,
    gamma: float = 0.05,
    mu: float = None,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
    resume: bool = False,
):
    """Build the fused dual-averaging RWMH engine.

    Returns ``fn(x_T (d, C), lp (1, C), seed) -> (samples (n_samples, d, C),
    lps (n_samples, 1, C), accepted (n_samples, 1, C), eps_final (1, C))``.
    ``warmup`` adaptation steps run first and are discarded (the HG14
    contract: post-warmup draws use the frozen averaged step size).

    ``resume=True`` builds the frozen-continuation variant instead (fused
    chunked resume, VERDICT r3 #4): no warmup runs; the call signature
    gains a per-chain frozen step size — ``fn(x_T, lp, eps_bar (1, C),
    seed)`` — staged from a prior run's adapted state by the launcher.
    """
    if mu is None:
        mu = math.log(10.0 * initial_step_size)
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _adapt_rwmh_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        warmup=warmup,
        thin=thin,
        n_groups=n_groups,
        target=float(target_accept),
        t0=float(t0),
        kappa=float(kappa),
        gamma=float(gamma),
        mu=float(mu),
        log_eps0=math.log(initial_step_size),
        resume=resume,
    )

    @jax.jit
    def run(params_t: jax.Array, lp: jax.Array, *rest):
        *extra, seed = rest
        c = params_t.shape[1]
        if c % tile_chains != 0:
            raise ValueError(
                f"chains={c} must be a multiple of tile_chains={tile_chains}"
            )
        grid = (c // tile_chains, n_groups)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        whole = lambda arr: pl.BlockSpec(
            arr.shape, lambda i, g: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        )
        tiled_in = lambda rows: pl.BlockSpec(
            (rows, tile_chains), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        tiled_out = lambda rows: pl.BlockSpec(
            (E, rows, tile_chains), lambda i, g: (g, 0, i),
            memory_space=pltpu.VMEM,
        )
        samples, lps, accs, eps = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[whole(cst) for cst in consts],
                tiled_in(d),
                tiled_in(1),
                *([tiled_in(1)] if resume else []),
            ],
            out_specs=[
                tiled_out(d), tiled_out(1), tiled_out(1),
                pl.BlockSpec(
                    (1, tile_chains), lambda i, g: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
            ],
        )(seed_arr, *consts, params_t, lp, *extra)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples], eps

    return run

"""Fused preconditioned-Crank-Nicolson sampling engine (Pallas/TPU).

Companion to samplers/pcn.py: the pCN step is the RWMH step with the
current state contracted toward the prior mean,

    x' = m + √(1−β²)·(x − m) + β·(ν − m),    ν − m = L z  (or σ ⊙ z)

so the kernel is ops/pallas_mh.py's sampling engine plus one FMA per
dimension; the acceptance is the pure likelihood difference. One likelihood
evaluation per step — the throughput workhorse for GP/latent-field targets
(ESS trades ~10-20 evals/step for rejection-freeness).
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _perturb_fn, _scale_block, _uniform_from_bits


def _pcn_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    scale_ref,  # (d, 1) f32 prior std column, or (d, d) lower Cholesky
    mean_ref,  # (d, 1) f32 prior mean column
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    beta: float,
    burn: int,
    thin: int,
    n_groups: int,
    tril: bool,
):
    const_refs = rest[:n_consts]
    (params_ref, lp_ref, out_params_ref, out_lp_ref, out_acc_ref,
     sp_ref, slp_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    d, tc = params_ref.shape
    E = out_params_ref.shape[0]
    perturb = _perturb_fn(scale_ref, tril, exact=True)
    consts = tuple(c[:] for c in const_refs)
    mean = mean_ref[:]
    rho = jnp.float32(math.sqrt(1.0 - beta * beta))
    beta_f = jnp.float32(beta)

    pltpu.prng_seed(seed_ref[0, 0] + i * n_groups + g)

    def one_step(carry, z):
        params, lp, _acc = carry
        candidate = mean + rho * (params - mean) + beta_f * perturb(z)
        lp_cand = logdensity_tile_fn(candidate, *consts)  # likelihood only
        u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        accept = jnp.log(u) < lp_cand - lp
        return (
            jnp.where(accept, candidate, params),
            jnp.where(accept, lp_cand, lp),
            accept.astype(jnp.float32),
        )

    def pair(_, carry):
        z1, z2 = _normal_pair((d, tc))
        carry = one_step(carry, z1)
        return one_step(carry, z2)

    def sweep(carry, n):  # n static
        if n % 2 == 1:
            z, _ = _normal_pair((d, tc))
            carry = one_step(carry, z)
        return jax.lax.fori_loop(0, n // 2, pair, carry)

    zero_acc = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g == 0)
    def _():
        carry = sweep((params_ref[:], lp_ref[:], zero_acc), burn)
        sp_ref[:] = carry[0]
        slp_ref[:] = carry[1]

    def store(e, carry):
        out_params_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[2][None]

    carry0 = (sp_ref[:], slp_ref[:], zero_acc)
    if thin == 1:
        def emit2(k, carry):
            z1, z2 = _normal_pair((d, tc))
            carry = one_step(carry, z1)
            store(2 * k, carry)
            carry = one_step(carry, z2)
            store(2 * k + 1, carry)
            return carry

        carry = jax.lax.fori_loop(0, E // 2, emit2, carry0)
        if E % 2:
            z, _ = _normal_pair((d, tc))
            carry = one_step(carry, z)
            store(E - 1, carry)
    else:
        def emit(e, carry):
            carry = sweep(carry, thin)
            store(e, carry)
            return carry

        carry = jax.lax.fori_loop(0, E, emit, carry0)
    sp_ref[:] = carry[0]
    slp_ref[:] = carry[1]


def fused_pcn_sample(
    logdensity_tile_fn: Callable,
    d: int,
    loc,
    scale,
    beta: float,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused pCN engine: ``fn(params_T (d, C), lp (1, C), seed) ->
    (samples, lps, accepted)``. ``loc``/``scale`` are the Gaussian prior's
    mean and per-dim std (or ``(d, d)`` lower Cholesky)."""
    scale_arr, tril = _scale_block(scale, d)
    mean_arr = jnp.broadcast_to(
        jnp.asarray(loc, jnp.float32).reshape(-1, 1), (d, 1)
    ) * jnp.ones((d, 1), jnp.float32)
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _pcn_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        beta=float(beta),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
        tril=tril,
    )

    @jax.jit
    def run(params_t, lp, seed):
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
        tin = lambda rows: pl.BlockSpec(
            (rows, tile_chains), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        tout = lambda rows: pl.BlockSpec(
            (E, rows, tile_chains), lambda i, g: (g, 0, i),
            memory_space=pltpu.VMEM,
        )
        samples, lps, accs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                whole(scale_arr),
                whole(mean_arr),
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
            ],
            out_specs=[tout(d), tout(1), tout(1)],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
            ],
        )(seed_arr, scale_arr, mean_arr, *consts, params_t, lp)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

"""Fused Barker-proposal kernel (Pallas/TPU).

Beyond-parity engine (see samplers/barker.py for the algorithm; Livingstone
& Zanella 2022). Per coordinate the increment z ~ N(0, σ²) is applied with
gradient-informed sign — +z with logistic probability σ(z·∂ᵢ log π(x)) —
and accepted with the coordinatewise softplus Hastings correction

    log α = Δlog π + Σᵢ [ softplus(−δᵢ·gᵢ(x)) − softplus(δᵢ·gᵢ(y)) ].

Structure is identical to ops/pallas_mala.py: the tile density's gradient
comes from tracing ``jax.vjp`` inside the kernel (one fused value+gradient
evaluation per step, gradient carried in scratch between steps), chains on
lanes, (chain-tile × sample-group) grid, thinned draws streamed to HBM.
Softplus is computed in the overflow-stable max/log1p form with raw
jnp.exp/log ops (Mosaic has no dedicated softplus/logaddexp lowering).
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _uniform_from_bits


def _softplus(t):
    """max(t, 0) + log(1 + exp(−|t|)) — stable for any t."""
    return jnp.maximum(t, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(t)))


def _barker_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    sigma: float,
    burn: int,
    thin: int,
    n_groups: int,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, g_ref, out_x_ref, out_lp_ref, out_acc_ref,
     sx_ref, slp_ref, sg_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    sig = jnp.float32(sigma)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def value_and_grad(y):
        lp, pullback = jax.vjp(
            lambda ym: logdensity_tile_fn(ym, *consts), y
        )
        (grad,) = pullback(jnp.ones_like(lp))
        return lp, grad

    def step(x, lp, grad):
        z, _ = _normal_pair((d, tc))
        z = sig * z
        u = _uniform_from_bits(pltpu.prng_random_bits((d, tc)))
        # sign flip with logistic probability σ(z·g): u < σ(t) ⟺
        # log(u/(1−u)) < t — the logit form needs one log, no division
        # by a possibly-saturated sigmoid.
        keep = jnp.log(u) - jnp.log(1.0 - u) < z * grad
        delta = jnp.where(keep, z, -z)
        y = x + delta
        lp_y, grad_y = value_and_grad(y)
        logratio = jnp.sum(
            _softplus(-delta * grad) - _softplus(delta * grad_y),
            axis=0, keepdims=True,
        )
        logalpha = lp_y - lp + logratio
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        mask = jnp.broadcast_to(accept, (d, tc))
        x = jnp.where(mask, y, x)
        lp = jnp.where(accept, lp_y, lp)
        grad = jnp.where(mask, grad_y, grad)
        # f32 accept carry: i1 vectors through nested fori_loops fail Mosaic
        return x, lp, grad, accept.astype(jnp.float32)

    def sweep(carry, n):
        def body(_, c):
            return step(c[0], c[1], c[2])

        return jax.lax.fori_loop(0, n, body, carry)

    zero_acc = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g_id == 0)
    def _():
        carry = (x_ref[:], lp_ref[:], g_ref[:], zero_acc)
        carry = sweep(carry, burn)
        sx_ref[:] = carry[0]
        slp_ref[:] = carry[1]
        sg_ref[:] = carry[2]

    def emit(e, carry):
        carry = sweep(carry, thin)
        out_x_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[3][None]
        return carry

    carry = (sx_ref[:], slp_ref[:], sg_ref[:], zero_acc)
    carry = jax.lax.fori_loop(0, E, emit, carry)
    sx_ref[:] = carry[0]
    slp_ref[:] = carry[1]
    sg_ref[:] = carry[2]


def fused_barker_sample(
    logdensity_tile_fn: Callable,
    d: int,
    step_size: float,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 2048,
    samples_per_block: int = 32,
):
    """Build the fused Barker engine.

    Returns ``fn(x_T (d, C), lp (1, C), grad (d, C), seed) -> (samples
    (n_samples, d, C), lps, accepted)``.
    """
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _barker_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        sigma=float(step_size),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
    )

    @jax.jit
    def run(x_t, lp, grad, seed):
        c = x_t.shape[1]
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
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
                tin(d),
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
                pltpu.VMEM((d, tile_chains), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp, grad)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

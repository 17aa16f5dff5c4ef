"""Fused delayed-rejection MH sampling engine (Pallas/TPU).

Companion to samplers/dr.py (Mira 2001): both stages are evaluated
unconditionally — exactly two density evaluations and two Gaussian draws per
step for every chain, all in VMEM — and the stage-2 result is masked in
branchlessly. The q₁ cross-density terms reduce to two scaled squared
distances (sublane reductions) because both are densities of the *same*
Gaussian kernel, so the normalizations cancel:

    log q₁(y₁|y₂) − log q₁(y₁|x) = −½(‖(y₁−y₂)/σ₁‖² − ‖(y₁−x)/σ₁‖²)

The 1−α₁ factors are floored at −1e30 (never −inf) so masked lanes cannot
produce inf − inf = NaN, mirroring samplers/dr.py::_log1m_exp.

Scope: zero-mean Gaussian random-walk stages with scalar/per-dim scales
(diagonal); full-covariance stages need an in-kernel triangular solve for
the q₁ distance — use the XLA engine for those.
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


def _log1m_exp_f32(a: jax.Array) -> jax.Array:
    """log(1 − eᵃ) with a −1e30 floor; exact-zero for a ≥ 0 lanes.

    In-kernel variant of samplers/dr.py::_log1m_exp using exp/log only
    (Mosaic has no expm1 lowering); the 1−eᵃ cancellation near a→0⁻ only
    loses precision where stage 1 accepts almost surely — lanes that are
    masked out of the stage-2 ratio anyway.
    """
    neg = a < 0.0
    em = jnp.maximum(1.0 - jnp.exp(jnp.minimum(a, 0.0)), jnp.float32(1e-38))
    return jnp.where(neg, jnp.maximum(jnp.log(em), -1e30), jnp.float32(-1e30))


def _dr_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    s1_ref,  # (d, 1) f32 stage-1 per-dim std
    s2_ref,  # (d, 1) f32 stage-2 per-dim std
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    burn: int,
    thin: int,
    n_groups: int,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, out_x_ref, out_lp_ref, out_acc_ref,
     sx_ref, slp_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    inv_s1 = 1.0 / s1

    pltpu.prng_seed(seed_ref[0, 0] + i * n_groups + g)

    def one_step(carry):
        x, lp0, _ = carry
        z1, z2 = _normal_pair((d, tc))
        # Stage 1: bold symmetric Gaussian try.
        y1 = x + s1 * z1
        lp1 = logdensity_tile_fn(y1, *consts)  # (1, TC)
        la1 = lp1 - lp0
        u1 = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        acc1 = jnp.log(u1) < la1
        # Stage 2: timid retry, always evaluated, masked in.
        y2 = x + s2 * z2
        lp2 = logdensity_tile_fn(y2, *consts)
        la1_rev = lp1 - lp2
        d12 = (y1 - y2) * inv_s1
        # ‖(y1−x)/s1‖² = ‖z1‖² — reuse the draw instead of re-dividing.
        dq = -0.5 * (
            jnp.sum(d12 * d12, axis=0, keepdims=True)
            - jnp.sum(z1 * z1, axis=0, keepdims=True)
        )
        la2 = lp2 - lp0 + dq + _log1m_exp_f32(la1_rev) - _log1m_exp_f32(la1)
        u2 = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        acc2 = (jnp.log(u2) < la2) & (~acc1)
        x = jnp.where(jnp.broadcast_to(acc1, (d, tc)), y1,
                      jnp.where(jnp.broadcast_to(acc2, (d, tc)), y2, x))
        lp = jnp.where(acc1, lp1, jnp.where(acc2, lp2, lp0))
        # f32 accept flag: i1 vectors through nested fori_loops fail Mosaic
        # legalization (see pallas_emcee.py).
        return x, lp, (acc1 | acc2).astype(jnp.float32)

    def sweep(carry, n):
        return jax.lax.fori_loop(0, n, lambda _, c: one_step(c), carry)

    zero_acc = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g == 0)
    def _():
        carry = sweep((x_ref[:], lp_ref[:], zero_acc), burn)
        sx_ref[:] = carry[0]
        slp_ref[:] = carry[1]

    def emit(e, carry):
        carry = sweep(carry, thin)
        out_x_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[2][None]
        return carry

    carry = jax.lax.fori_loop(0, E, emit, (sx_ref[:], slp_ref[:], zero_acc))
    sx_ref[:] = carry[0]
    slp_ref[:] = carry[1]


def fused_dr_sample(
    logdensity_tile_fn: Callable,
    d: int,
    scale1,
    scale2,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused DR engine: ``fn(params_T (d, C), lp (1, C), seed) ->
    (samples (n_samples, d, C), lps, accepted)``. ``scale1``/``scale2`` are
    scalar or length-d per-dim std-devs of the bold/timid stages."""
    col = lambda s: jnp.broadcast_to(
        jnp.asarray(s, jnp.float32).reshape(-1, 1), (d, 1)
    ) * jnp.ones((d, 1), jnp.float32)
    s1_arr, s2_arr = col(scale1), col(scale2)
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _dr_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
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
                whole(s1_arr),
                whole(s2_arr),
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
        )(seed_arr, s1_arr, s2_arr, *consts, params_t, lp)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

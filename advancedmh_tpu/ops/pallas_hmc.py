"""Fused HMC engine (Pallas/TPU).

Whole HMC trajectories in VMEM: per MH step the kernel draws momenta from
the hardware PRNG, runs ``n_leapfrog`` leapfrog steps with in-kernel
``jax.vjp`` gradients (the tile density decouples over lanes, exactly as
ops/pallas_mala.py), and applies the exact energy-error accept — state
(x, lp, ∇lp) persists in scratch between sample emissions, so a full
``n_samples × thin + burn`` run is one kernel launch per (chain-tile ×
sample-group) grid cell.

Diagonal mass preconditioning: the ``(d, 1)`` inverse-mass column scales
the drift (``x += ε·M⁻¹·p``), the kinetic energy (``½·Σ p²·M⁻¹``), and the
momentum draw (``p = z/√M⁻¹``) — ≙ samplers/hmc.py semantics.

Leapfrog trip count is static (compiler-friendly control flow; keep step
counts static per CLAUDE.md Pallas gotchas).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _uniform_from_bits


def _hmc_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    minv_ref,  # (d, 1) f32 diagonal inverse mass
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    eps: float,
    n_leapfrog: int,
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
    minv = minv_ref[:]  # (d, 1)
    inv_sqrt_minv = jax.lax.rsqrt(minv)
    epsf = jnp.float32(eps)
    half_eps = jnp.float32(0.5 * eps)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def value_and_grad(y):
        lp, pullback = jax.vjp(
            lambda ym: logdensity_tile_fn(ym, *consts), y
        )
        (grad,) = pullback(jnp.ones_like(lp))
        return lp, grad

    def kinetic(p):
        return 0.5 * jnp.sum(p * p * minv, axis=0, keepdims=True)  # (1, TC)

    def step(x, lp, grad):
        z, _ = _normal_pair((d, tc))
        p0 = z * inv_sqrt_minv  # p ~ N(0, M)
        k0 = kinetic(p0)

        def lf(_, c):
            x, p, lp, grad = c
            p = p + half_eps * grad
            x = x + epsf * minv * p
            lp, grad = value_and_grad(x)
            p = p + half_eps * grad
            return x, p, lp, grad

        y, p1, lp_y, grad_y = jax.lax.fori_loop(
            0, n_leapfrog, lf, (x, p0, lp, grad)
        )
        logalpha = (lp_y - kinetic(p1)) - (lp - k0)
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        mask = jnp.broadcast_to(accept, (d, tc))
        x = jnp.where(mask, y, x)
        lp = jnp.where(accept, lp_y, lp)
        grad = jnp.where(mask, grad_y, grad)
        # accept as f32: i1 carried through nested fori_loops fails Mosaic
        # legalization (CLAUDE.md gotcha).
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


def fused_hmc_sample(
    logdensity_tile_fn: Callable,
    d: int,
    step_size: float,
    n_leapfrog: int,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    inverse_mass: Optional[jax.Array] = None,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 2048,
    samples_per_block: int = 32,
):
    """Build the fused HMC engine.

    Returns ``fn(x_T (d, C), lp (1, C), grad (d, C), seed) -> (samples
    (n_samples, d, C), lps (n_samples, 1, C), accepted)``. ``inverse_mass``
    is a scalar or length-d diagonal (None = identity).
    """
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    if inverse_mass is None:
        minv = jnp.ones((d, 1), jnp.float32)
    else:
        minv = jnp.broadcast_to(
            jnp.asarray(inverse_mass, jnp.float32).reshape(-1, 1), (d, 1)
        ) * jnp.ones((d, 1), jnp.float32)
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _hmc_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        eps=float(step_size),
        n_leapfrog=int(n_leapfrog),
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
                whole(minv),
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
        )(seed_arr, minv, *consts, x_t, lp, grad)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

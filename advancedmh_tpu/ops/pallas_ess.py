"""Fused elliptical-slice-sampling kernel (Pallas/TPU).

Beyond-parity engine (see samplers/ess.py; Murray-Adams-MacKay 2010 — ≙ the
reference's commented-out elliptical-slice moves, src/emcee.jl:104-214).
Per step, in VMEM:

    ν−μ = scale · z            (z hardware-PRNG normals; diag column mul or
                                a (d,d) lower-Cholesky matvec on the MXU)
    log y = ℓ(x) + log u       (slice height)
    θ ~ U(0, 2π), bracket [θ−2π, θ]
    MAX_SHRINK masked trips:   cand = μ + (x−μ)cos θ + (ν−μ)sin θ
                               accept iff ℓ(cand) > log y, else shrink

The reference's data-dependent ``while true`` becomes a **statically
unrolled masked loop**: every trip evaluates the tile density for the whole
chain tile and updates only not-yet-done lanes. Mosaic runs data-dependent
trip counts poorly (CLAUDE.md: traced fori bounds compile but run slow), so
the fused engine spends exactly ``max_shrink`` density evals per step; the
XLA path's ``lax.while_loop`` exits at the slowest chain of the *whole
batch*, which for ≥4k chains is empirically 10-20 trips — so the static
bound costs little and keeps the chain state VMEM-resident across steps.
P(exhausting the bracket) decays geometrically in trips (the bracket halves
toward θ=0, which reproduces x and always accepts); exhausted lanes keep
their state and report accepted=0, the same bounded-loop contract as the
XLA path's ``max_shrink``.

Done flags are carried as f32 masks (i1 vectors through nested fori_loops
fail Mosaic legalization, see ops/pallas_mh.py history).
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import (
    _normal_pair,
    _perturb_fn,
    _scale_block,
    _uniform_from_bits,
)

_TWO_PI = 6.283185307179586


def _ess_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    loc_ref,  # (d, 1) f32 prior mean
    scale_ref,  # (d, 1) f32 prior std-devs, or (d, d) lower Cholesky
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    burn: int,
    thin: int,
    n_groups: int,
    max_shrink: int,
    tril: bool,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, out_x_ref, out_lp_ref, out_acc_ref,
     sx_ref, slp_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    loc = loc_ref[:]
    apply_scale = _perturb_fn(scale_ref, tril, exact=True)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def step(x, lp, _acc):
        z, _ = _normal_pair((d, tc))
        nu_c = apply_scale(z)  # ν − μ
        x_c = x - loc
        u_y = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        logy = lp + jnp.log(u_y)  # ℓ(x) − Exp(1)
        u_t = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        theta0 = _TWO_PI * u_t

        def trip(k, c):
            done, theta, tmin, tmax, res_x, res_lp = c
            cth = jnp.cos(theta)
            sth = jnp.sin(theta)
            cand = loc + x_c * cth + nu_c * sth
            lp_c = logdensity_tile_fn(cand, *consts)  # (1, tc)
            newly = jnp.where(lp_c > logy, 1.0, 0.0) * (1.0 - done)
            mask_d = jnp.broadcast_to(newly, (d, tc)) > 0.5
            res_x = jnp.where(mask_d, cand, res_x)
            res_lp = jnp.where(newly > 0.5, lp_c, res_lp)
            done = done + newly
            # shrink the bracket toward θ=0 for still-running lanes
            running = done < 0.5
            neg = theta < 0.0
            tmin = jnp.where(jnp.logical_and(running, neg), theta, tmin)
            tmax = jnp.where(
                jnp.logical_and(running, jnp.logical_not(neg)), theta, tmax
            )
            u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
            theta = tmin + u * (tmax - tmin)
            return done, theta, tmin, tmax, res_x, res_lp

        carry = (
            jnp.zeros((1, tc), jnp.float32),
            theta0,
            theta0 - _TWO_PI,
            theta0,
            x,
            lp,
        )
        done, _, _, _, res_x, res_lp = jax.lax.fori_loop(
            0, max_shrink, trip, carry
        )
        return res_x, res_lp, done

    def sweep(carry, n):
        def body(_, c):
            return step(c[0], c[1], c[2])

        return jax.lax.fori_loop(0, n, body, carry)

    zero_acc = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g_id == 0)
    def _():
        carry = (x_ref[:], lp_ref[:], zero_acc)
        carry = sweep(carry, burn)
        sx_ref[:] = carry[0]
        slp_ref[:] = carry[1]

    def emit(e, carry):
        carry = sweep(carry, thin)
        out_x_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[2][None]
        return carry

    carry = (sx_ref[:], slp_ref[:], zero_acc)
    carry = jax.lax.fori_loop(0, E, emit, carry)
    sx_ref[:] = carry[0]
    slp_ref[:] = carry[1]


def fused_ess_sample(
    logdensity_tile_fn: Callable,
    d: int,
    loc,
    scale,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    max_shrink: int = 16,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused ESS engine.

    ``loc``/``scale`` parameterize the Gaussian prior: scalar or length-d
    loc; scalar / length-d (diagonal) / ``(d, d)`` lower-Cholesky scale.
    ``logdensity_tile_fn`` is the **log-likelihood** tile density.

    Returns ``fn(x_T (d, C), lp (1, C), seed) -> (samples (n_samples, d, C),
    lps, accepted)`` where ``lp`` carries log-likelihood values and
    ``accepted`` is 1.0 unless a lane exhausted ``max_shrink`` trips.
    """
    scale_arr, tril = _scale_block(scale, d)
    loc_col = jnp.broadcast_to(
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
        _ess_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
        max_shrink=max_shrink,
        tril=tril,
    )

    @jax.jit
    def run(x_t, lp, seed):
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
                whole(loc_col),
                whole(scale_arr),
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
        )(seed_arr, loc_col, scale_arr, *consts, x_t, lp)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

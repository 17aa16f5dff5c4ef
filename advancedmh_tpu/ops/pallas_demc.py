"""Fused differential-evolution MCMC (DE-MC) kernel (Pallas/TPU).

Companion to the fused emcee engine (pallas_emcee.py): the population lives
on vector lanes and the red-black cross-member reads become MXU matmuls.
DE-MC needs the *difference* of two random members of the frozen half,
x_{r1} − x_{r2}, which collapses into a **single one-hot-difference matmul**:

    diff = other @ (P1 − P2),   P1[k,l] = 1{r1_l == k},  P2[k,l] = 1{r2_l == k}

— one (H×H) f32 matmul per half-move instead of emcee's one-hot gather,
with r2 bumped past r1 so the pair is always distinct.

Snooker updates (ter Braak-Vrugt 2008) cost one more one-hot matmul (the z
gather) plus two sublane reductions, compiled in only when
``snooker_probability > 0`` so the default kernel is unchanged.

Each chain tile of ``tile_members`` members is an independent population
(set ``tile_members = n_members`` for exact single-population semantics);
γ=1 mode-jump moves are taken stochastically per member with probability
``jump_probability`` (see samplers/demc.py for why a mixture kernel
replaces ter Braak's every-10th-step schedule).
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


def _demc_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    d: int,
    gamma: float,
    noise_scale: float,
    jump_probability: float,
    snooker_probability: float,
    snooker_gamma: float,
    burn: int,
    thin: int,
    n_groups: int,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, out_x_ref, out_lp_ref, out_acc_ref,
     sx_ref, slp_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    tc = x_ref.shape[1]
    H = tc // 2
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    gamma_f = jnp.float32(gamma)
    noise_f = jnp.float32(noise_scale)
    pjump_f = jnp.float32(jump_probability)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)

    def half_move(active, active_lp, other, other_lp):
        """active/other: (d, H); returns updated (active, active_lp, accept)."""
        # Distinct pair (r1, r2) from the frozen half; the difference gather
        # is one matmul: other @ (P1 − P2).
        u1 = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
        r1 = jnp.floor(u1 * H).astype(jnp.int32)  # (1, H) in [0, H)
        u2 = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
        r2 = jnp.floor(u2 * (H - 1)).astype(jnp.int32)  # in [0, H-1)
        r2 = r2 + (r2 >= r1).astype(jnp.int32)
        pdiff = (rows_iota == r1).astype(jnp.float32) - (
            rows_iota == r2
        ).astype(jnp.float32)
        diff = jax.lax.dot_general(
            other, pdiff, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, H) = x_{r1} − x_{r2}
        # γ per member: mode-jump (γ=1) with probability jump_probability.
        uj = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
        gm = jnp.where(uj < pjump_f, jnp.float32(1.0), gamma_f)  # (1, H)
        z1, _ = _normal_pair((d, H))
        y = active + gm * diff + noise_f * z1
        log_ratio = jnp.zeros((1, H), jnp.float32)

        if snooker_probability > 0.0:
            # Snooker update (ter Braak-Vrugt 2008): y = x + γ_s(diff·ê)ê
            # along ê = (x − x_z)/‖x − x_z‖, Hastings ‖y−z‖^{d−1}/‖x−z‖^{d−1}.
            # One extra one-hot matmul gathers x_z; the projection is a pair
            # of axis-0 (sublane) reductions.
            uz = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
            rz = jnp.floor(uz * (H - 2)).astype(jnp.int32)  # in [0, H-2)
            lo, hi = jnp.minimum(r1, r2), jnp.maximum(r1, r2)
            rz = rz + (rz >= lo).astype(jnp.int32)
            rz = rz + (rz >= hi).astype(jnp.int32)
            pz = (rows_iota == rz).astype(jnp.float32)
            xz = jax.lax.dot_general(
                other, pz, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, H)
            e = active - xz
            ee = jnp.sum(e * e, axis=0, keepdims=True)  # (1, H)
            de = jnp.sum(diff * e, axis=0, keepdims=True)
            safe = ee > jnp.float32(1e-30)
            coef = jnp.float32(snooker_gamma) * de * jnp.where(
                safe, 1.0 / jnp.maximum(ee, jnp.float32(1e-30)), 0.0
            )
            y_s = active + coef * e
            ey = y_s - xz
            ee_y = jnp.sum(ey * ey, axis=0, keepdims=True)
            log_j = jnp.where(
                safe & (ee_y > jnp.float32(1e-30)),
                jnp.float32(0.5 * (d - 1))
                * (jnp.log(jnp.maximum(ee_y, jnp.float32(1e-30)))
                   - jnp.log(jnp.maximum(ee, jnp.float32(1e-30)))),
                jnp.float32(-1e30),  # not -inf: keeps streaming sums NaN-free
            )
            us = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
            snooker = us < jnp.float32(snooker_probability)
            y = jnp.where(jnp.broadcast_to(snooker, (d, H)), y_s, y)
            log_ratio = jnp.where(snooker, log_j, log_ratio)

        lp_y = logdensity_tile_fn(y, *consts)  # (1, H)
        # Symmetric given the frozen half (+ snooker Hastings term).
        u = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
        accept = jnp.log(u) < lp_y - active_lp + log_ratio
        mask = jnp.broadcast_to(accept, (d, H))
        return (
            jnp.where(mask, y, active),
            jnp.where(accept, lp_y, active_lp),
            # f32, not bool: an i1 vector carried through nested fori_loops
            # fails Mosaic legalization (see pallas_emcee.py).
            accept.astype(jnp.float32),
        )

    def step(x, lp):
        xa, xb = x[:, :H], x[:, H:]
        la, lb = lp[:, :H], lp[:, H:]
        xa, la, acc_a = half_move(xa, la, xb, lb)
        xb, lb, acc_b = half_move(xb, lb, xa, la)
        return (
            jnp.concatenate([xa, xb], axis=1),
            jnp.concatenate([la, lb], axis=1),
            jnp.concatenate([acc_a, acc_b], axis=1),
        )

    def sweep(carry, n):
        def body(_, c):
            x, lp, _a = step(c[0], c[1])
            return x, lp, _a

        return jax.lax.fori_loop(0, n, body, carry)

    zero_acc = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g == 0)
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


def fused_demc_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    gamma: float,
    noise_scale: float = 1e-4,
    jump_probability: float = 0.1,
    snooker_probability: float = 0.0,
    snooker_gamma: float = 1.683,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_members: int = 1024,
    samples_per_block: int = 16,
):
    """Build the fused DE-MC engine.

    Returns ``fn(x_T (d, M), lp (1, M), seed) -> (samples (n_samples, d, M),
    lps, accepted)``. ``M`` must be a multiple of ``tile_members`` (each tile
    is an independent population; use ``tile_members == M`` for one
    population).
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
        _demc_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        d=d,
        gamma=float(gamma),
        noise_scale=float(noise_scale),
        jump_probability=float(jump_probability),
        snooker_probability=float(snooker_probability),
        snooker_gamma=float(snooker_gamma),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
    )

    @jax.jit
    def run(x_t, lp, seed):
        m = x_t.shape[1]
        if m % tile_members != 0:
            raise ValueError(
                f"members={m} must be a multiple of tile_members={tile_members}"
            )
        grid = (m // tile_members, n_groups)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        whole = lambda arr: pl.BlockSpec(
            arr.shape, lambda i, g: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        )
        tin = lambda rows: pl.BlockSpec(
            (rows, tile_members), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        tout = lambda rows: pl.BlockSpec(
            (E, rows, tile_members), lambda i, g: (g, 0, i),
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
            ],
            out_specs=[tout(d), tout(1), tout(1)],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, m), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, m), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, m), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_members), jnp.float32),
                pltpu.VMEM((1, tile_members), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

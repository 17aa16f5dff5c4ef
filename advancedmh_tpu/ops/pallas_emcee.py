"""Fused affine-invariant ensemble (emcee) kernel (Pallas/TPU).

The red-black stretch move's only awkward op on TPU is the *partner gather*:
each active walker stretches against a random walker of the frozen half, and
walkers live on vector lanes — arbitrary cross-lane gathers are slow on the
VPU. Here the gather is reformulated as a **one-hot matmul on the MXU**:

    partner = other @ P,   P[k, l] = 1{j_l == k}

with ``P`` built from random indices by an iota comparison — a (H×H) f32
matmul per half-move, which the MXU does for free at ensemble sizes that fit
VMEM.

Each chain tile of ``tile_walkers`` walkers is an *independent ensemble*
(the reference's 1000-walker test ensemble fits in one tile); multiple tiles
run multiple ensembles targeting the same posterior — set
``tile_walkers = n_walkers`` for exact single-ensemble semantics.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _uniform_from_bits


def _emcee_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    d: int,
    a: float,
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
    a_f = jnp.float32(a)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)

    def half_move(active, active_lp, other, other_lp):
        """active/other: (d, H); returns updated (active, active_lp, accept)."""
        # random partner index per active walker → one-hot (H, H)
        u_j = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
        j = jnp.floor(u_j * H).astype(jnp.int32)  # (1, H) in [0, H)
        onehot = (rows_iota == j).astype(jnp.float32)  # (H, H): P[k,l]=1{j_l==k}
        partner = jax.lax.dot_general(
            other, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, H)
        # z = ((a-1)u + 1)^2 / a
        u_z = _uniform_from_bits(pltpu.prng_random_bits((1, H)))
        z = jnp.square((a_f - 1.0) * u_z + 1.0) / a_f  # (1, H)
        y = partner + z * (active - partner)  # broadcast over d rows
        lp_y = logdensity_tile_fn(y, *consts)  # (1, H)
        logalpha = (d - 1) * jnp.log(z) + lp_y - active_lp
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, H))))
        accept = -e <= logalpha
        mask = jnp.broadcast_to(accept, (d, H))
        return (
            jnp.where(mask, y, active),
            jnp.where(accept, lp_y, active_lp),
            # f32, not bool: an i1 vector carried through *nested* fori_loops
            # fails Mosaic legalization (tpu.roll_vectors on vector<i1>).
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


def fused_emcee_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    stretch_length: float = 2.0,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_walkers: int = 1024,
    samples_per_block: int = 16,
):
    """Build the fused emcee engine.

    Returns ``fn(x_T (d, W), lp (1, W), seed) -> (samples (n_samples, d, W),
    lps, accepted)``. ``W`` must be a multiple of ``tile_walkers`` (each tile
    is an independent ensemble; use ``tile_walkers == W`` for one ensemble).
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
        _emcee_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        d=d,
        a=float(stretch_length),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
    )

    @jax.jit
    def run(x_t, lp, seed):
        w = x_t.shape[1]
        if w % tile_walkers != 0:
            raise ValueError(
                f"walkers={w} must be a multiple of tile_walkers={tile_walkers}"
            )
        grid = (w // tile_walkers, n_groups)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        whole = lambda arr: pl.BlockSpec(
            arr.shape, lambda i, g: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        )
        tin = lambda rows: pl.BlockSpec(
            (rows, tile_walkers), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        tout = lambda rows: pl.BlockSpec(
            (E, rows, tile_walkers), lambda i, g: (g, 0, i),
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
                jax.ShapeDtypeStruct((n_padded, d, w), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, w), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, w), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_walkers), jnp.float32),
                pltpu.VMEM((1, tile_walkers), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

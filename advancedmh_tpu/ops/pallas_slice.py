"""Fused slice-sampling kernel (Pallas/TPU).

Beyond-parity engine (see samplers/slice.py; Neal 2003). Per step, in VMEM:

    u  = z / ‖z‖            random unit direction (hardware-PRNG normals,
                             global norm over the d rows)
    log y = ℓ(x) + log U     slice height
    stepping out:  [L, R] = [−w·U₀, L + w], Neal's budget m split J/K
                   between the ends; ``max_stepout − 1`` static trips, each
                   evaluating BOTH bracket ends for the whole tile
    shrinkage:     ``max_shrink`` static masked trips (t ~ U(L, R), accept
                   iff ℓ(x + t·u) > log y, else the rejected t becomes the
                   bracket end toward 0)

Both data-dependent loops are statically unrolled masked loops, the same
Mosaic rationale as ops/pallas_ess.py (traced trip counts run slow; lanes
that exhaust the shrink budget keep their state and report accepted=0).
Density cost per step: ``2·(max_stepout−1) + max_shrink`` tile evaluations.
Done flags carried as f32 (i1 through nested fori_loops fails Mosaic).
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


def _slice_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    width: float,
    burn: int,
    thin: int,
    n_groups: int,
    max_stepout: int,
    max_shrink: int,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, out_x_ref, out_lp_ref, out_acc_ref,
     sx_ref, slp_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    w = jnp.float32(width)
    m = max_stepout

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def step(x, lp, _acc):
        z, _ = _normal_pair((d, tc))
        inv = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(z * z, axis=0, keepdims=True), 1e-30)
        )
        u_dir = z * inv  # (d, tc) unit direction

        def ld_at(t):  # t (1, tc) line coordinate
            return logdensity_tile_fn(x + t * u_dir, *consts)

        u_y = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        logy = lp + jnp.log(u_y)

        u0 = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        L = -w * u0
        R = L + w
        v = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        J = jnp.floor(m * v)
        K = (m - 1.0) - J

        def expand(k, c):
            L, R, J, K = c
            grow_l = jnp.where(
                jnp.logical_and(J > 0.5, ld_at(L) > logy), 1.0, 0.0
            )
            L = L - grow_l * w
            J = J - grow_l
            grow_r = jnp.where(
                jnp.logical_and(K > 0.5, ld_at(R) > logy), 1.0, 0.0
            )
            R = R + grow_r * w
            K = K - grow_r
            return L, R, J, K

        if m > 1:
            L, R, _, _ = jax.lax.fori_loop(0, m - 1, expand, (L, R, J, K))

        def shrink(k, c):
            done, L, R, res_x, res_lp = c
            u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
            t = L + u * (R - L)
            cand = x + t * u_dir
            lp_c = logdensity_tile_fn(cand, *consts)
            newly = jnp.where(lp_c > logy, 1.0, 0.0) * (1.0 - done)
            mask_d = jnp.broadcast_to(newly, (d, tc)) > 0.5
            res_x = jnp.where(mask_d, cand, res_x)
            res_lp = jnp.where(newly > 0.5, lp_c, res_lp)
            done = done + newly
            running = done < 0.5
            neg = t < 0.0
            L = jnp.where(jnp.logical_and(running, neg), t, L)
            R = jnp.where(
                jnp.logical_and(running, jnp.logical_not(neg)), t, R
            )
            return done, L, R, res_x, res_lp

        carry = (jnp.zeros((1, tc), jnp.float32), L, R, x, lp)
        done, _, _, res_x, res_lp = jax.lax.fori_loop(
            0, max_shrink, shrink, carry
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


def fused_slice_sample(
    logdensity_tile_fn: Callable,
    d: int,
    width: float,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    max_stepout: int = 8,
    max_shrink: int = 16,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused slice-sampling engine.

    Returns ``fn(x_T (d, C), lp (1, C), seed) -> (samples (n_samples, d, C),
    lps, accepted)``; ``accepted`` is 1.0 unless a lane exhausted the
    shrink budget.
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
        _slice_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        width=float(width),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
        max_stepout=int(max_stepout),
        max_shrink=int(max_shrink),
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
        )(seed_arr, *consts, x_t, lp)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

"""Fused power-posterior kernel (Pallas/TPU) for evidence estimation.

The evidence stack (runtime/evidence.py) runs K ladder rungs × C chains as
ONE flat batch against ``π_β(x) ∝ p(x)·L(x)^β`` with a per-chain β — shape-
identical to the fused dual-averaging RWMH engine (ops/pallas_adapt.py)
plus two twists:

- the target factorizes: the kernel carries ``(log p(x), log L(x))``
  separately — β enters only the acceptance ratio, and the *emissions* are
  the log-likelihood values (what the stepping-stone/TI estimators consume;
  12 bytes/chain/draw → the whole estimation phase streams ll + accept
  flags, never positions);
- β and the initial step size are per-chain ``(1, TC)`` runtime rows, and
  the prior is an elementwise Gaussian evaluated in-kernel from ``(loc,
  scale)`` columns (kernels cannot close over arrays — they ride in as
  whole blocks, ≙ ops/pallas_mh.py consts).

Burn-in runs the HG14 per-chain dual averaging toward the target acceptance
(``adapt=True``, ≙ ``proposal_scale="auto"``) or a fixed per-chain scale;
the frozen per-chain ε̄ is returned for the rung diagnostics.

Layout, PRNG, and gotchas follow ops/pallas_mh.py (chains on lanes,
``t^(−κ)`` as exp(−κ·ln t), accept flags as f32).
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

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _power_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    loc_ref,  # (d, 1) prior mean column
    scale_ref,  # (d, 1) prior std column
    *rest,
    loglik_tile_fn: Callable,
    n_consts: int,
    burn: int,
    thin: int,
    n_groups: int,
    adapt: bool,
    target: float,
    t0: float,
    kappa: float,
    gamma: float,
):
    const_refs = rest[:n_consts]
    (x_ref, ll_ref, plp_ref, beta_ref, eps0_ref,
     out_ll_ref, out_acc_ref, out_eps_ref,
     sx, sll, splp, seps) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_ll_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    loc = loc_ref[:]
    scale = scale_ref[:]
    beta = beta_ref[:]  # (1, TC) per-chain temperature

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    def prior_lp(x):  # elementwise Gaussian prior, summed over rows
        z = (x - loc) / scale
        return jnp.sum(
            -0.5 * z * z - jnp.log(scale) - _HALF_LOG_2PI,
            axis=0, keepdims=True,
        )

    def mh_step(x, ll, plp, eps, z):
        cand = x + eps * z  # per-chain ε broadcasts over the d rows
        ll_c = loglik_tile_fn(cand, *consts)
        plp_c = prior_lp(cand)
        logalpha = (plp_c + beta * ll_c) - (plp + beta * ll)
        u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        acc = jnp.log(u) < logalpha
        return (
            jnp.where(jnp.broadcast_to(acc, (d, tc)), cand, x),
            jnp.where(acc, ll_c, ll),
            jnp.where(acc, plp_c, plp),
            acc.astype(jnp.float32),
        )

    # Group 0: burn-in sweep (with per-chain dual averaging when adapt).
    @pl.when(g == 0)
    def _():
        def da_update(t_i32, a, log_eps, leb, h_bar, mu_row):
            t = t_i32.astype(jnp.float32)
            w = 1.0 / (t + t0)
            h_bar = (1.0 - w) * h_bar + w * (target - a)
            log_eps = mu_row - jnp.sqrt(t) / gamma * h_bar
            eta = jnp.exp(-kappa * jnp.log(t))  # t^(−κ), no powf
            leb = eta * log_eps + (1.0 - eta) * leb
            return log_eps, leb, h_bar

        le0 = jnp.log(eps0_ref[:])
        mu_row = le0 + math.log(10.0)  # HG14 μ = log(10·ε₀), per chain

        def one(t_i32, z, carry):
            x, ll, plp, log_eps, leb, h_bar = carry
            x, ll, plp, a = mh_step(x, ll, plp, jnp.exp(log_eps), z)
            if adapt:
                log_eps, leb, h_bar = da_update(
                    t_i32, a, log_eps, leb, h_bar, mu_row
                )
            return x, ll, plp, log_eps, leb, h_bar

        def pair(j, carry):
            z1, z2 = _normal_pair((d, tc))
            carry = one(2 * j + 1, z1, carry)
            return one(2 * j + 2, z2, carry)

        carry = (x_ref[:], ll_ref[:], plp_ref[:], le0, le0,
                 jnp.zeros((1, tc), jnp.float32))
        carry = jax.lax.fori_loop(0, burn // 2, pair, carry)
        if burn % 2:
            z, _ = _normal_pair((d, tc))
            carry = one(jnp.int32(burn), z, carry)
        x, ll, plp, _, leb, _ = carry
        sx[:] = x
        sll[:] = ll
        splp[:] = plp
        seps[:] = jnp.exp(leb) if adapt else eps0_ref[:]

    # Emission: E thinned steps per grid group; stream (ll, accept) only.
    eps = seps[:]

    def store(e, ll, acc):
        out_ll_ref[pl.ds(e, 1)] = ll[None]
        out_acc_ref[pl.ds(e, 1)] = acc[None]

    def emit(e, flat):
        x, ll, plp, acc = flat
        n = thin
        if n % 2:
            z, _ = _normal_pair((d, tc))
            x, ll, plp, acc = mh_step(x, ll, plp, eps, z)
            n -= 1

        def tp(_, fl):
            x2, ll2, plp2, _a = fl
            z1, z2 = _normal_pair((d, tc))
            x2, ll2, plp2, a2 = mh_step(x2, ll2, plp2, eps, z1)
            x2, ll2, plp2, a2 = mh_step(x2, ll2, plp2, eps, z2)
            return (x2, ll2, plp2, a2)

        x, ll, plp, acc = jax.lax.fori_loop(0, n // 2, tp, (x, ll, plp, acc))
        store(e, ll, acc)
        return (x, ll, plp, acc)

    flat = (sx[:], sll[:], splp[:], jnp.zeros((1, tc), jnp.float32))
    flat = jax.lax.fori_loop(0, E, emit, flat)
    sx[:], sll[:], splp[:] = flat[0], flat[1], flat[2]
    out_eps_ref[:] = eps


def fused_power_rwmh(
    loglik_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    burn: int,
    thin: int = 1,
    adapt: bool = True,
    target_accept: float = 0.234,
    t0: float = 10.0,
    kappa: float = 0.75,
    gamma: float = 0.05,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused power-posterior engine.

    Returns ``fn(x_T (d, B), ll (1, B), plp (1, B), beta (1, B),
    eps0 (1, B), loc (d, 1), scale (d, 1), seed) -> (lls (n_samples, 1, B),
    accepted (n_samples, 1, B), eps_final (1, B))`` — the log-likelihood
    draws the stepping-stone/TI estimators consume, for the whole K·C flat
    ladder batch in one launch."""
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _power_kernel,
        loglik_tile_fn=loglik_tile_fn,
        n_consts=len(consts),
        burn=int(burn),
        thin=int(thin),
        n_groups=n_groups,
        adapt=bool(adapt),
        target=float(target_accept),
        t0=float(t0),
        kappa=float(kappa),
        gamma=float(gamma),
    )

    @jax.jit
    def run(x_t, ll, plp, beta, eps0, loc, scale, seed):
        c = x_t.shape[1]
        if c % tile_chains != 0:
            raise ValueError(
                f"chains={c} must be a multiple of tile_chains={tile_chains}"
            )
        grid = (c // tile_chains, n_groups)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        loc_col = jnp.asarray(loc, jnp.float32).reshape(d, 1)
        scale_col = jnp.asarray(scale, jnp.float32).reshape(d, 1)
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
        lls, accs, eps = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                whole(loc_col),
                whole(scale_col),
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
                tin(1),
                tin(1),
                tin(1),
            ],
            out_specs=[
                tout(1), tout(1),
                pl.BlockSpec(
                    (1, tile_chains), lambda i, g: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
            ],
        )(seed_arr, loc_col, scale_col, *consts, x_t, ll, plp, beta, eps0)
        return lls[:n_samples], accs[:n_samples], eps

    return run

"""Fused AdaptiveHMC engine (Pallas/TPU).

The full :class:`samplers.hmc_adapt.AdaptiveHMC` schedule in one
VMEM-resident launch: ``warmup`` jointly-adapting HMC steps — per-chain
dual-averaged ε (HG14 §3.2, ``(1, TC)`` lane vectors like
ops/pallas_adapt.py) + per-chain diagonal-mass Welford moments
(``(d, TC)`` running mean / M2 in the warmup carry, Stan-regularized) —
followed by frozen-(ε̄, M⁻¹) trajectory sampling with every thinned draw
emitted. Each trajectory runs ``n_leapfrog`` leapfrog steps with in-kernel
``jax.vjp`` gradients (≙ ops/pallas_hmc.py).

Per-chain adaptation only: the pooled cross-chain Welford merge reduces
over the whole chain axis, which spans grid tiles — that path stays on the
XLA engine (``AdaptiveHMC(pooled=True)``).

The acceptance signal for dual averaging is the accept *indicator* (the
XLA kernel's choice, samplers/hmc_adapt.py::_dual_avg) so the two engines
share the same Robbins-Monro fixed point and variance profile.

Gotchas honored (CLAUDE.md): static trip counts everywhere; accept flags
carried as f32; ``t^(−κ)`` as ``exp(−κ·ln t)`` (no powf lowering).
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


def _adaptive_hmc_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    warmup: int,
    n_leapfrog: int,
    thin: int,
    n_groups: int,
    target: float,
    t0: float,
    kappa: float,
    gamma: float,
    mu: float,
    log_eps0: float,
    mass_reg: float,
    mass_warm_start: int,
    resume: bool = False,
):
    const_refs = rest[:n_consts]
    if resume:
        (x_ref, lp_ref, g_ref, eps_in_ref, minv_in_ref,
         out_x_ref, out_lp_ref, out_acc_ref, out_eps_ref, out_minv_ref,
         sx_ref, slp_ref, sg_ref, seps_ref, sminv_ref) = rest[n_consts:]
    else:
        eps_in_ref = minv_in_ref = None
        (x_ref, lp_ref, g_ref, out_x_ref, out_lp_ref, out_acc_ref,
         out_eps_ref, out_minv_ref,
         sx_ref, slp_ref, sg_ref, seps_ref, sminv_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def value_and_grad(y):
        lp, pullback = jax.vjp(
            lambda ym: logdensity_tile_fn(ym, *consts), y
        )
        (grad,) = pullback(jnp.ones_like(lp))
        return lp, grad

    def kinetic(p, minv):
        return 0.5 * jnp.sum(p * p * minv, axis=0, keepdims=True)  # (1, TC)

    def hmc_step(x, lp, grad, eps, minv):
        """One trajectory + MH accept; eps (1, TC), minv (d, TC)."""
        z, _ = _normal_pair((d, tc))
        p0 = z * jax.lax.rsqrt(minv)  # p ~ N(0, M)
        k0 = kinetic(p0, minv)
        half_eps = 0.5 * eps

        def lf(_, c):
            x, p, lp, grad = c
            p = p + half_eps * grad
            x = x + eps * minv * p
            lp, grad = value_and_grad(x)
            p = p + half_eps * grad
            return x, p, lp, grad

        y, p1, lp_y, grad_y = jax.lax.fori_loop(
            0, n_leapfrog, lf, (x, p0, lp, grad)
        )
        logalpha = (lp_y - kinetic(p1, minv)) - (lp - k0)
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        mask = jnp.broadcast_to(accept, (d, tc))
        x = jnp.where(mask, y, x)
        lp = jnp.where(accept, lp_y, lp)
        grad = jnp.where(mask, grad_y, grad)
        return x, lp, grad, accept.astype(jnp.float32)

    def reg_minv(m2, n):
        """Stan-shrunk variance estimate from (M2, count); identity until
        ``mass_warm_start`` observations (≙ samplers/hmc_adapt.py)."""
        nn = jnp.maximum(n, 1.0)
        var = m2 / jnp.maximum(nn - 1.0, 1.0)
        est = (nn / (nn + mass_reg)) * var + 1e-3 * (mass_reg / (nn + mass_reg))
        return jnp.where(n >= float(mass_warm_start), est, jnp.ones_like(m2))

    # Group 0 (resume): no warmup — frozen per-chain (ε̄, M⁻¹) arrive as
    # inputs (a prior run's adapted values, staged by the launcher).
    if resume:
        @pl.when(g_id == 0)
        def _():
            sx_ref[:] = x_ref[:]
            slp_ref[:] = lp_ref[:]
            sg_ref[:] = g_ref[:]
            seps_ref[:] = eps_in_ref[:]
            sminv_ref[:] = minv_in_ref[:]

    # Group 0 (fresh): joint (ε, M⁻¹) warmup; freeze (exp(log ε̄),
    # regularized M⁻¹).
    if not resume:
        @pl.when(g_id == 0)
        def _():
            def one(t_i32, carry):
                x, lp, grad, log_eps, leb, h_bar, mean, m2 = carry
                t = t_i32.astype(jnp.float32)  # 1-indexed warmup step
                minv = reg_minv(m2, t - 1.0)  # observations consumed so far
                x, lp, grad, a = hmc_step(x, lp, grad, jnp.exp(log_eps), minv)
                # HG14 dual averaging on the accept indicator.
                w = 1.0 / (t + t0)
                h_bar = (1.0 - w) * h_bar + w * (target - a)
                log_eps = mu - jnp.sqrt(t) / gamma * h_bar
                eta = jnp.exp(-kappa * jnp.log(t))  # t^(−κ), no powf
                leb = eta * log_eps + (1.0 - eta) * leb
                # Welford advance with the post-step state (count becomes t).
                delta = x - mean
                mean = mean + delta / t
                m2 = m2 + delta * (x - mean)
                return x, lp, grad, log_eps, leb, h_bar, mean, m2

            le0 = jnp.full((1, tc), log_eps0, jnp.float32)
            carry = (
                x_ref[:], lp_ref[:], g_ref[:], le0, le0,
                jnp.zeros((1, tc), jnp.float32),
                x_ref[:], jnp.zeros((d, tc), jnp.float32),
            )
            carry = jax.lax.fori_loop(
                1, warmup + 1, one, carry
            )
            x, lp, grad, _, leb, _, _, m2 = carry
            sx_ref[:] = x
            slp_ref[:] = lp
            sg_ref[:] = grad
            seps_ref[:] = jnp.exp(leb)
            sminv_ref[:] = reg_minv(m2, jnp.float32(warmup))

    # Emission groups: frozen (ε̄, M⁻¹) trajectories, E thinned draws each.
    eps = seps_ref[:]
    minv = sminv_ref[:]

    def sweep(carry, n):
        def body(_, c):
            x, lp, grad, _a = c
            return hmc_step(x, lp, grad, eps, minv)

        return jax.lax.fori_loop(0, n, body, carry)

    def emit(e, carry):
        carry = sweep(carry, thin)
        out_x_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[3][None]
        return carry

    zero_acc = jnp.zeros((1, tc), jnp.float32)
    carry = (sx_ref[:], slp_ref[:], sg_ref[:], zero_acc)
    carry = jax.lax.fori_loop(0, E, emit, carry)
    sx_ref[:] = carry[0]
    slp_ref[:] = carry[1]
    sg_ref[:] = carry[2]
    out_eps_ref[:] = eps
    out_minv_ref[:] = minv


def fused_adaptive_hmc_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    warmup: int,
    n_leapfrog: int,
    thin: int = 1,
    initial_step_size: float = 0.1,
    target_accept: float = 0.65,
    t0: float = 10.0,
    kappa: float = 0.75,
    gamma: float = 0.05,
    mu: float = None,
    mass_regularization: float = 5.0,
    mass_warm_start: int = 10,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 16,
    resume: bool = False,
):
    """Build the fused AdaptiveHMC engine (per-chain ε + diagonal-mass
    adaptation in VMEM).

    ``resume=True`` builds the frozen-continuation variant (fused chunked
    resume, VERDICT r3 #4): no warmup runs; the call signature gains the
    frozen per-chain values — ``fn(x_T, lp, grad, eps_bar (1, C),
    minv (d, C), seed)`` — staged from a prior run's adapted state.

    Returns ``fn(x_T (d, C), lp (1, C), grad (d, C), seed) -> (samples
    (n_samples, d, C), lps (n_samples, 1, C), accepted (n_samples, 1, C),
    eps_final (1, C), minv_final (d, C))``. ``warmup`` adaptation steps run
    first and are discarded (the HG14 contract).

    Schedule note: sample 1 is the state after ``warmup + thin`` steps
    (warmup, then a thinning sweep before the first emission), whereas the
    XLA engine and ``fused_hmc_sample`` (via ``burn = max(discard_initial
    - thinning, 0)``) emit sample 1 after ``discard_initial`` steps — a
    deliberate one-draw offset shared with ``fused_adapt_rwmh_sample``.
    Statistically immaterial (both draw from the frozen-(ε̄, M⁻¹) chain's
    stationary regime); don't chase it as a bit-compat bug.
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
        _adaptive_hmc_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        warmup=int(warmup),
        n_leapfrog=int(n_leapfrog),
        thin=thin,
        n_groups=n_groups,
        target=float(target_accept),
        t0=float(t0),
        kappa=float(kappa),
        gamma=float(gamma),
        mu=float(mu),
        log_eps0=math.log(initial_step_size),
        mass_reg=float(mass_regularization),
        mass_warm_start=int(mass_warm_start),
        resume=resume,
    )

    @jax.jit
    def run(x_t, lp, grad, *rest):
        *extra, seed = rest
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
        lane_out = lambda rows: pl.BlockSpec(
            (rows, tile_chains), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        samples, lps, accs, eps, minv = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
                tin(d),
                *([tin(1), tin(d)] if resume else []),
            ],
            out_specs=[
                tout(d), tout(1), tout(1), lane_out(1), lane_out(d),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((d, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((d, tile_chains), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp, grad, *extra)
        return (
            samples[:n_samples], lps[:n_samples], accs[:n_samples], eps, minv
        )

    return run

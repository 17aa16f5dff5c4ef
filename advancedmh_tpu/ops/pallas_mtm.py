"""Fused Multiple-Try Metropolis kernel (Pallas/TPU).

The MTM step (samplers/mtm.py — k candidates, density-proportional
selection, logsumexp acceptance) is the most TPU-shaped sampler in the
framework, and this kernel runs it entirely in VMEM: all ``2k − 1`` density
evaluations per step happen on-chip with the hardware PRNG, statically
unrolled over the (small) ``k`` axis.

Memory discipline: the kernel never holds the k candidates at once —
selection is a *streaming Gumbel-argmax* (running best candidate/score) and
both acceptance sums are *streaming logsumexp* (running (max, scaled-sum)
pairs), so VMEM usage is O(1) in ``k``.

-inf handling: support-guarded densities return −inf outside the support;
streaming logsumexp on an all-(−inf) prefix would produce NaN (−inf − −inf).
Densities are clamped to ``−1e30`` inside the kernel — clamped candidates
contribute exactly 0 to any sum containing a finite term (exp underflow) and
produce a certainly-rejected −inf-like logα when everything is clamped, which
is the correct MH behavior in both cases.

Same grid/emission structure as ops/pallas_mh.py: chains on lanes,
(chain-tile × sample-group) grid, state persisted in scratch, thinned draws
streamed to HBM.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _perturb_fn, _scale_block, _uniform_from_bits

_NEG_CLAMP = -1.0e30  # f32-safe "effectively -inf" (see module docstring)


def _make_normal_stream(d: int, tc: int):
    """One (d, TC) standard-normal block per call; Box-Muller halves are
    cached at trace time so no draw is wasted within a step."""
    buf = []

    def next_z():
        if not buf:
            a, b = _normal_pair((d, tc))
            buf.append(b)
            return a
        return buf.pop()

    return next_z


def _mtm_step_fn(logdensity_tile_fn, consts, perturb, k: int, d: int, tc: int):
    """Build one MTM step: (x, lp) → (x', lp', accept_f32)."""

    def density(y):
        return jnp.maximum(logdensity_tile_fn(y, *consts), _NEG_CLAMP)

    def gumbel():
        u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        return -jnp.log(-jnp.log(u))

    def step(x, lp):
        z = _make_normal_stream(d, tc)
        # --- k candidates: streaming argmax(lp+gumbel) + logsumexp(lp) ---
        best_y = best_lp = best_score = None
        m = s = None
        for j in range(k):
            y = x + perturb(z())
            lp_y = density(y)
            score = lp_y + gumbel()
            if j == 0:
                best_y, best_lp, best_score = y, lp_y, score
                m, s = lp_y, jnp.ones_like(lp_y)
            else:
                sel = score > best_score
                best_score = jnp.where(sel, score, best_score)
                best_lp = jnp.where(sel, lp_y, best_lp)
                best_y = jnp.where(jnp.broadcast_to(sel, (d, tc)), y, best_y)
                m_new = jnp.maximum(m, lp_y)
                s = s * jnp.exp(m - m_new) + jnp.exp(lp_y - m_new)
                m = m_new
        lse_num = m + jnp.log(s)

        # --- k−1 references around the winner; current state is the k-th ---
        m2, s2 = jnp.maximum(lp, _NEG_CLAMP), jnp.ones_like(lp)
        for _ in range(k - 1):
            lp_r = density(best_y + perturb(z()))
            m2_new = jnp.maximum(m2, lp_r)
            s2 = s2 * jnp.exp(m2 - m2_new) + jnp.exp(lp_r - m2_new)
            m2 = m2_new
        logalpha = lse_num - (m2 + jnp.log(s2))

        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        x = jnp.where(jnp.broadcast_to(accept, (d, tc)), best_y, x)
        lp = jnp.where(accept, best_lp, lp)
        # f32 carry: i1 vectors through nested fori_loops fail Mosaic
        # legalization (see pallas_mala.py).
        return x, lp, accept.astype(jnp.float32)

    return step


def _mtm_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    scale_ref,  # (d, 1) f32 or (d, d) lower Cholesky
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    k: int,
    n_steps: int,
    tril: bool,
):
    const_refs = rest[:n_consts]
    params_ref, lp_ref, out_params_ref, out_lp_ref, accepts_ref = rest[n_consts:]
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    d, tc = params_ref.shape
    step = _mtm_step_fn(
        logdensity_tile_fn, tuple(c[:] for c in const_refs),
        _perturb_fn(scale_ref, tril), k, d, tc,
    )

    def body(_, carry):
        x, lp, acc = carry
        x, lp, a = step(x, lp)
        return x, lp, acc + a

    x, lp, acc = jax.lax.fori_loop(
        0, n_steps, body,
        (params_ref[:], lp_ref[:], jnp.zeros((1, tc), jnp.float32)),
    )
    out_params_ref[:] = x
    out_lp_ref[:] = lp
    accepts_ref[:] = acc


def fused_mtm(
    logdensity_tile_fn: Callable,
    d: int,
    scale,
    k: int,
    n_steps: int,
    *,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
):
    """Throughput variant: ``fn(params_T (d, C), lp (1, C), seed) ->
    (params_T, lp, accept_counts)`` running ``n_steps`` MTM steps (k tries
    each) in one launch."""
    scale_arr, tril = _scale_block(scale, d)
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    kernel = functools.partial(
        _mtm_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        k=int(k),
        n_steps=n_steps,
        tril=tril,
    )

    @jax.jit
    def run(params_t, lp, seed):
        c = params_t.shape[1]
        if c % tile_chains != 0:
            raise ValueError(
                f"chains={c} must be a multiple of tile_chains={tile_chains}"
            )
        grid = (c // tile_chains,)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        whole = lambda arr: pl.BlockSpec(
            arr.shape, lambda i: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        )
        tiled = lambda rows: pl.BlockSpec(
            (rows, tile_chains), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                whole(scale_arr),
                *[whole(cst) for cst in consts],
                tiled(d),
                tiled(1),
            ],
            out_specs=[tiled(d), tiled(1), tiled(1)],
            out_shape=[
                jax.ShapeDtypeStruct((d, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
        )(seed_arr, scale_arr, *consts, params_t, lp)

    return run


def _mtm_sampling_kernel(
    seed_ref,
    scale_ref,
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    k: int,
    burn: int,
    thin: int,
    n_groups: int,
    tril: bool,
):
    const_refs = rest[:n_consts]
    (params_ref, lp_ref, out_params_ref, out_lp_ref, out_acc_ref,
     sp_ref, slp_ref) = rest[n_consts:]
    i = pl.program_id(0)  # chain tile
    g = pl.program_id(1)  # sample group
    d, tc = params_ref.shape
    E = out_params_ref.shape[0]
    step = _mtm_step_fn(
        logdensity_tile_fn, tuple(c[:] for c in const_refs),
        _perturb_fn(scale_ref, tril), k, d, tc,
    )
    pltpu.prng_seed(seed_ref[0, 0] + i * n_groups + g)

    def sweep_body(_, carry):
        x, lp, _a = carry
        return step(x, lp)

    def sweep(carry, n):
        if n <= 0:
            return carry
        return jax.lax.fori_loop(0, n, sweep_body, carry)

    zero_acc = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g == 0)
    def _():
        carry = sweep((params_ref[:], lp_ref[:], zero_acc), burn)
        sp_ref[:] = carry[0]
        slp_ref[:] = carry[1]

    def emit(e, carry):
        carry = sweep(carry, thin)
        out_params_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[2][None]
        return carry

    carry = jax.lax.fori_loop(0, E, emit, (sp_ref[:], slp_ref[:], zero_acc))
    sp_ref[:] = carry[0]
    slp_ref[:] = carry[1]


def fused_mtm_sample(
    logdensity_tile_fn: Callable,
    d: int,
    scale,
    k: int,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Full fused MTM sampling engine: emits ``n_samples`` thinned draws.

    Returns ``fn(params_T (d, C), lp (1, C), seed) -> (samples (n_samples,
    d, C), lps (n_samples, 1, C), accepted (n_samples, 1, C))``; sample j is
    the state after ``burn + (j+1)·thin`` MTM steps.
    """
    scale_arr, tril = _scale_block(scale, d)
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _mtm_sampling_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        k=int(k),
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
        )(seed_arr, scale_arr, *consts, params_t, lp)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

"""Fused MEADS kernel (Pallas/TPU): the whole warmup-free sampler in VMEM.

MEADS (samplers/meads.py) is the ideal fused shape: there is NO warmup /
frozen split to stage — one kernel runs the entire schedule, with every
per-step quantity (fold statistics, max-eigenvalue estimates, GHMC move)
computed tile-locally. Each chain tile is an independent MEADS ensemble of
``n_folds`` contiguous 128-aligned lane blocks (≙ the fused ChEES warmup's
tile-local pooling stance: a ≥256-lane fold gives far lower-variance
statistics than the paper's ~32-chain folds, and cross-tile coupling buys
nothing once folds are this large).

Per iteration, folds update SEQUENTIALLY (fold k tuned by fold k−1's
current state — the validity composition of samplers/meads.py): K
quarter-width density-gradient evaluations per step, same total gradient
work as one full-width step. The max-eigenvalue estimator λ̂ = tr(A²)/tr(A)
needs the fold Gram matrix: for d ≤ 16 it is an unrolled row sweep of
cross-lane reductions (exact f32, fast Mosaic compiles — ≙ the
ops/pallas_mh.py matvec crossover); above that one (d,F)·(F,d) MXU dot
(bf16 operand truncation gives ~0.4% jitter on λ̂ — a soft scale for ε,
harmless, unlike the near-identity pooled-RAM case).

The persistent momentum p, slice variable u, and gradient live in VMEM
scratch across the tile's whole sweep. The iteration counter enters as a
runtime SMEM scalar (``t0``) so chunked resume never recompiles.

Layout, PRNG, and gotchas follow ops/pallas_mh.py (chains on lanes,
in-kernel ``jax.vjp`` gradients, accept flags carried as f32, static loop
bounds everywhere; the slice-drift wrap is a select, not ``mod``).
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _uniform_from_bits

_TINY = 1e-30
_UNROLL_GRAM_MAX_DIM = 16


def _max_eig_cols(v: jax.Array) -> jax.Array:
    """Soft max eigenvalue of A = E[v vᵀ] over the F columns of ``v``
    (d, F): tr(A²)/tr(A) with the unbiased i≠j pair estimate
    (Hoffman-Sountsov 2022 §3.1; ≙ samplers/meads.py::_max_eig on rows)."""
    d, F = v.shape
    colnorm2 = jnp.sum(v * v, axis=0, keepdims=True)  # (1, F)
    tr_a = jnp.sum(colnorm2) / F
    if d <= _UNROLL_GRAM_MAX_DIM:
        s_gg = jnp.zeros((), jnp.float32)
        for r in range(d):
            gr = jnp.sum(v[r : r + 1] * v, axis=1, keepdims=True)  # (d, 1)
            s_gg = s_gg + jnp.sum(gr * gr)
    else:
        G = jax.lax.dot_general(
            v, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_gg = jnp.sum(G * G)
    tr_a2 = (s_gg - jnp.sum(colnorm2 * colnorm2)) / (F * (F - 1.0))
    return tr_a2 / jnp.maximum(tr_a, _TINY)


def _meads_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    t0_ref,  # (1, 1) f32 SMEM — absolute steps already taken (resume)
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    n_folds: int,
    burn: int,
    thin: int,
    n_groups: int,
    mult: float,
    clip: float,
    slowdown: float,
    precond: bool,
    accept_nr: bool,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, g_ref, p_ref, u_ref,
     out_x_ref, out_lp_ref, out_acc_ref,
     out_xf_ref, out_lpf_ref, out_gf_ref, out_pf_ref, out_uf_ref,
     sx, slp, sg, sp, su) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    K = n_folds
    F = tc // K
    consts = tuple(c[:] for c in const_refs)
    t0 = t0_ref[0, 0]

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def value_and_grad(y):
        lp, pullback = jax.vjp(
            lambda ym: logdensity_tile_fn(ym, *consts), y
        )
        (grad,) = pullback(jnp.ones_like(lp))
        return lp, grad

    def fold_parameters(xb, gb, t):
        """(σ (d,1), ε/α/δ as (1,F) rows) from the complementary fold.
        Rows, not (1,1) scalars: Mosaic cannot broadcast (1,1) into (d,F)
        in one op (≙ ops/pallas_chees.py eps_row note)."""
        mu = jnp.sum(xb, axis=1, keepdims=True) / F
        xc = xb - mu
        if precond:
            var = jnp.sum(xc * xc, axis=1, keepdims=True) / F
            sigma = jnp.maximum(jnp.sqrt(var), 1e-10)  # (d, 1)
        else:
            sigma = jnp.ones((d, 1), jnp.float32)
        lam_g = _max_eig_cols(sigma * gb)
        eps = mult * jax.lax.rsqrt(jnp.maximum(lam_g, _TINY))
        eps = jnp.minimum(eps, clip)
        lam_x = _max_eig_cols(xc / sigma)
        gamma = jax.lax.rsqrt(jnp.maximum(lam_x, 1.0))
        gamma = jnp.maximum(gamma, slowdown / (eps * (t + 1.0)))
        alpha = 1.0 - jnp.exp(-2.0 * eps * gamma)
        row = lambda s: jnp.broadcast_to(s.reshape(1, 1), (1, F))
        return sigma, row(eps), row(alpha), row(0.5 * alpha)

    def ghmc_fold(xk, lpk, gk, pk, uk, sigma, eps_row, alpha_row, delta_row):
        z, _ = _normal_pair((d, F))
        p1 = jnp.sqrt(1.0 - alpha_row) * pk + jnp.sqrt(alpha_row) * z
        half = 0.5 * eps_row
        ph = p1 + half * (sigma * gk)
        y = xk + eps_row * (sigma * ph)
        lp_y, g_y = value_and_grad(y)
        p2 = ph + half * (sigma * g_y)
        ke1 = 0.5 * jnp.sum(p1 * p1, axis=0, keepdims=True)
        ke2 = 0.5 * jnp.sum(p2 * p2, axis=0, keepdims=True)
        logalpha = (lp_y - ke2) - (lpk - ke1)
        a = jnp.where(
            jnp.abs(logalpha) < 1e30,
            jnp.exp(jnp.minimum(logalpha, 0.0)),
            0.0,
        )
        if accept_nr:
            acc = uk < a
            u_new = jnp.where(
                acc,
                uk / jnp.maximum(a, _TINY),
                (uk - a) / jnp.maximum(1.0 - a, _TINY),
            )
            v = u_new + delta_row
            u_next = jnp.where(v >= 1.0, v - 1.0, v)  # wrap, no mod op
        else:
            e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, F))))
            acc = e > -logalpha
            u_next = uk
        maskd = jnp.broadcast_to(acc, (d, F))
        return (
            jnp.where(maskd, y, xk),
            jnp.where(acc, lp_y, lpk),
            jnp.where(maskd, g_y, gk),
            jnp.where(maskd, p2, -p1),  # negate on rejection (GHMC)
            u_next,
            acc.astype(jnp.float32),
        )

    def iteration(flat, t):
        """One MEADS step: sequential fold sweep (k tuned by k−1 current).
        ``flat`` = (xs, lps, gs, ps, us) as 5 K-tuples + acc row."""
        xs, lps, gs, ps, us = (list(flat[j * K:(j + 1) * K])
                               for j in range(5))
        accs = [None] * K
        for k in range(K):
            b = (k - 1) % K
            sigma, eps_row, alpha_row, delta_row = fold_parameters(
                xs[b], gs[b], t
            )
            xs[k], lps[k], gs[k], ps[k], us[k], accs[k] = ghmc_fold(
                xs[k], lps[k], gs[k], ps[k], us[k],
                sigma, eps_row, alpha_row, delta_row,
            )
        acc = jnp.concatenate(accs, axis=1)  # (1, TC)
        return tuple(xs) + tuple(lps) + tuple(gs) + tuple(ps) + tuple(us), acc

    def split(a):
        return tuple(a[:, k * F:(k + 1) * F] for k in range(K))

    def fuse(flat):
        return tuple(
            jnp.concatenate(flat[j * K:(j + 1) * K], axis=1)
            for j in range(5)
        )

    # Group 0: initialize scratch from the inputs and run the burn sweep.
    @pl.when(g_id == 0)
    def _():
        flat = (split(x_ref[:]) + split(lp_ref[:]) + split(g_ref[:])
                + split(p_ref[:]) + split(u_ref[:]))

        def bbody(j, fl):
            fl, _ = iteration(fl, t0 + j.astype(jnp.float32))
            return fl

        flat = jax.lax.fori_loop(0, burn, bbody, flat)
        x, lp, g, p, u = fuse(flat)
        sx[:], slp[:], sg[:], sp[:], su[:] = x, lp, g, p, u

    flat = (split(sx[:]) + split(slp[:]) + split(sg[:])
            + split(sp[:]) + split(su[:]))
    t_base = t0 + burn + (g_id * (E * thin)).astype(jnp.float32)

    def emit(e, carry):
        fl = carry
        acc = None
        for s in range(thin):  # static
            fl, acc = iteration(
                fl, t_base + e.astype(jnp.float32) * thin + s
            )
        x, lp, _, _, _ = fuse(fl)
        out_x_ref[pl.ds(e, 1)] = x[None]
        out_lp_ref[pl.ds(e, 1)] = lp[None]
        out_acc_ref[pl.ds(e, 1)] = acc[None]
        return fl

    flat = jax.lax.fori_loop(0, E, emit, flat)
    x, lp, g, p, u = fuse(flat)
    sx[:], slp[:], sg[:], sp[:], su[:] = x, lp, g, p, u
    # Final persistent state (last group's write wins): chunked resume
    # needs (grad, p, u) back to continue the non-reversible chain exactly.
    out_xf_ref[:] = x
    out_lpf_ref[:] = lp
    out_gf_ref[:] = g
    out_pf_ref[:] = p
    out_uf_ref[:] = u


def fused_meads_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    n_folds: int = 4,
    burn: int = 0,
    thin: int = 1,
    step_size_multiplier: float = 0.5,
    step_size_clip: float = 1.0,
    damping_slowdown: float = 1.0,
    diagonal_preconditioning: bool = True,
    accept: str = "nonreversible",
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused MEADS engine.

    Returns ``fn(x_T (d, C), lp (1, C), grad (d, C), p (d, C), u (1, C),
    t0, seed) -> (samples (n_samples, d, C), lps, accepted, x_f, lp_f,
    grad_f, p_f, u_f)`` where sample k is the state after ``burn +
    (k+1)·thin`` MEADS iterations; ``p``/``u`` are the persistent momentum
    and Neal slice variables (their final values are returned so chunked
    runs resume the non-reversible state exactly) and ``t0`` is the
    absolute iteration count already taken (runtime scalar — resume never
    recompiles). ``tile_chains`` must be a multiple of ``128·n_folds``
    (each fold is a 128-aligned lane block)."""
    if tile_chains % (128 * n_folds) != 0:
        raise ValueError(
            f"tile_chains ({tile_chains}) must be a multiple of "
            f"128*n_folds ({128 * n_folds}) - each fold is a 128-aligned "
            "lane block."
        )
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _meads_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        n_folds=int(n_folds),
        burn=int(burn),
        thin=int(thin),
        n_groups=n_groups,
        mult=float(step_size_multiplier),
        clip=float(step_size_clip),
        slowdown=float(damping_slowdown),
        precond=bool(diagonal_preconditioning),
        accept_nr=(accept == "nonreversible"),
    )

    @jax.jit
    def run(x_t, lp, grad, p, u, t0, seed):
        c = x_t.shape[1]
        if c % tile_chains != 0:
            raise ValueError(
                f"chains={c} must be a multiple of tile_chains={tile_chains}"
            )
        grid = (c // tile_chains, n_groups)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        t0_arr = jnp.asarray(t0, jnp.float32).reshape(1, 1)
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
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
                tin(d),
                tin(d),
                tin(1),
            ],
            out_specs=[
                tout(d), tout(1), tout(1),
                tin(d), tin(1), tin(d), tin(d), tin(1),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((d, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((d, c), jnp.float32),
                jax.ShapeDtypeStruct((d, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
            ],
        )(seed_arr, t0_arr, *consts, x_t, lp, grad, p, u)
        samples, lps, accs = outs[0], outs[1], outs[2]
        return (
            samples[:n_samples], lps[:n_samples], accs[:n_samples],
            *outs[3:],
        )

    return run

"""Fused Robust-Adaptive-Metropolis kernel (Pallas/TPU).

SURVEY.md §7 calls RAM's per-step rank-1 Cholesky adaptation "the hard part":
an O(d²) sequential column sweep batched over ≥10k chains. The XLA path
(samplers/ram.py step_warmup_batched) reaches ~1e8 chain-steps/s; this kernel
runs the *entire* RAM loop — propose (S·U), log-density, accept, rank-1
update/downdate with per-chain traced sign, eigenvalue clamp — in VMEM with
the hardware PRNG, for small static ``d`` with everything unrolled.

Layout: chains on lanes. ``x`` is ``(d, TC)``, ``S`` is stored row-major as
``(d*d, TC)`` so every Cholesky-sweep quantity is a ``(1, TC)`` vector op on
the VPU; the update/downdate sign enters as a per-chain ``(1, TC)`` vector
(the hyperbolic/Givens formulas are elementwise in the sign, so no branching
is needed — same trick as ops/cholesky.py).

Scope: the standard RAM schedule — ``warmup`` adaptation steps (discarded),
then ``n_samples × thin`` frozen-S sampling steps with every thinned draw
emitted. Runs that keep warmup draws (e.g. the eigenvalue-clamp test) use
the XLA path.
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _uniform_from_bits


def _ram_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    d: int,
    warmup: int,
    thin: int,
    n_groups: int,
    alpha: float,
    gamma: float,
    eig_lo: float,
    eig_hi: float,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, S_ref, out_x_ref, out_lp_ref, out_acc_ref, out_S_ref,
     sx_ref, slp_ref, sS_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    tc = x_ref.shape[1]
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    tiny = jnp.float32(np.finfo(np.float32).tiny)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    def normals(n_rows):
        """n_rows (1, TC) standard normals (Box-Muller, ceil to pairs)."""
        out = []
        for _ in range((n_rows + 1) // 2):
            z1, z2 = _normal_pair((1, tc))
            out.extend([z1, z2])
        return out[:n_rows]

    def matvec(S_rows, U):  # S·U, unrolled: d² FMAs on (1, TC) rows
        return [
            sum(S_rows[r * d + c] * U[c] for c in range(d)) for r in range(d)
        ]

    def chol_update(S_rows, v, sgn):
        """Rank-1 update/downdate, per-chain vector sign; returns (rows, ok)."""
        L = list(S_rows)
        v = list(v)
        ok = jnp.ones((1, tc), jnp.float32) > 0
        for k in range(d):
            Lkk = L[k * d + k]
            vk = v[k]
            r2 = Lkk * Lkk + sgn * vk * vk
            ok = ok & (r2 > 0)
            r = jnp.sqrt(jnp.maximum(r2, tiny))
            c = r / Lkk
            s = vk / Lkk
            L[k * d + k] = r
            for row in range(k + 1, d):
                Lik = (L[row * d + k] + sgn * s * v[row]) / c
                v[row] = c * v[row] - s * Lik
                L[row * d + k] = Lik
        return L, ok

    def step(x, lp, S_rows, it, adapt):
        """One RAM step; ``it`` is the (traced scalar) 1-based iteration for
        η = it^(−γ); ``adapt`` is static."""
        U = normals(d)
        SU = matvec(S_rows, U)
        y = [x[r] + SU[r] for r in range(d)]
        y_mat = jnp.concatenate(y, axis=0)  # (d, TC)
        lp_new = logdensity_tile_fn(y_mat, *consts)
        logalpha = jnp.minimum(lp_new - lp, 0.0)
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        x = [jnp.where(accept, y[r], x[r]) for r in range(d)]
        lp = jnp.where(accept, lp_new, lp)
        if adapt:
            dalpha = jnp.exp(logalpha) - alpha
            # it^(−γ) as exp(−γ·ln it): Mosaic has no powf lowering.
            eta = jnp.exp(-gamma * jnp.log(it.astype(jnp.float32)))
            norm_u = jnp.sqrt(sum(u * u for u in U))
            coeff = jnp.sqrt(eta * jnp.abs(dalpha)) / jnp.maximum(norm_u, tiny)
            v = [coeff * SU[r] for r in range(d)]
            sgn = jnp.sign(dalpha)
            S_new, ok = chol_update(S_rows, v, sgn)
            valid = ok
            if not (eig_lo == 0.0 and math.isinf(eig_hi)):
                for k in range(d):
                    diag = S_new[k * d + k]
                    valid = valid & (diag >= eig_lo) & (diag <= eig_hi)
            S_rows = [
                jnp.where(valid, S_new[r], S_rows[r]) for r in range(d * d)
            ]
        return x, lp, S_rows, accept

    def load_state():
        x = [sx_ref[r : r + 1] for r in range(d)]
        lp = slp_ref[:]
        S_rows = [sS_ref[r : r + 1] for r in range(d * d)]
        return x, lp, S_rows

    def store_state(x, lp, S_rows):
        for r in range(d):
            sx_ref[r : r + 1] = x[r]
        slp_ref[:] = lp
        for r in range(d * d):
            sS_ref[r : r + 1] = S_rows[r]

    # Group 0: initialize scratch from inputs and run the warmup sweep.
    @pl.when(g == 0)
    def _():
        x = [x_ref[r : r + 1] for r in range(d)]
        lp = lp_ref[:]
        S_rows = [S_ref[r : r + 1] for r in range(d * d)]

        def wbody(t, carry):
            x, lp, S = carry
            x, lp, S, _ = step(x, lp, S, t + 1, adapt=True)
            return x, lp, S

        # rolled loop over warmup steps; state flattened to a tuple of rows
        def wbody_flat(t, flat):
            x = list(flat[:d])
            lp = flat[d]
            S = list(flat[d + 1 :])
            x, lp, S = wbody(t, (x, lp, S))
            return tuple(x) + (lp,) + tuple(S)

        flat = tuple(x) + (lp,) + tuple(S_rows)
        flat = jax.lax.fori_loop(0, warmup, wbody_flat, flat)
        store_state(list(flat[:d]), flat[d], list(flat[d + 1 :]))

    # Emission: E thinned post-warmup samples per grid step (S frozen).
    x, lp, S_rows = load_state()

    def ebody(e, flat):
        x = list(flat[:d])
        lp = flat[d]
        acc = flat[d + 1]
        for _ in range(thin):  # static
            x, lp, S2, accept = step(x, lp, S_rows, jnp.int32(1), adapt=False)
            acc = accept.astype(jnp.float32)  # f32 carry: i1 fori carries are fragile in Mosaic
        out_x_ref[pl.ds(e, 1)] = jnp.concatenate(x, axis=0)[None]
        out_lp_ref[pl.ds(e, 1)] = lp[None]
        out_acc_ref[pl.ds(e, 1)] = acc[None]
        return tuple(x) + (lp, acc)

    flat = tuple(x) + (lp, jnp.zeros((1, tc), jnp.float32))
    flat = jax.lax.fori_loop(0, E, ebody, flat)
    store_state(list(flat[:d]), flat[d], S_rows)
    out_S_ref[:] = jnp.concatenate(S_rows, axis=0)


def fused_ram_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    warmup: int,
    thin: int = 1,
    alpha: float = 0.234,
    gamma: float = 0.6,
    eigenvalue_lower_bound: float = 0.0,
    eigenvalue_upper_bound: float = math.inf,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused RAM engine.

    Returns ``fn(x_T (d, C), lp (1, C), S (d*d, C), seed) -> (samples
    (n_samples, d, C), lps (n_samples, 1, C), accepted (n_samples, 1, C),
    S_final (d*d, C))``. ``warmup`` adaptation steps run first and are
    discarded (≙ RAM's default ``discard_initial = num_warmup``).
    """
    if d > 8:
        raise ValueError(
            "fused_ram_sample statically unrolls the d×d sweep; supported "
            f"for d <= 8 (got {d}). Use the XLA path for larger d."
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
        _ram_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        d=d,
        warmup=warmup,
        thin=thin,
        n_groups=n_groups,
        alpha=alpha,
        gamma=gamma,
        eig_lo=eigenvalue_lower_bound,
        eig_hi=eigenvalue_upper_bound,
    )

    @jax.jit
    def run(x_t, lp, S, seed):
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
        samples, lps, accs, S_final = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
                tin(d * d),
            ],
            out_specs=[
                tout(d),
                tout(1),
                tout(1),
                tin(d * d),  # final S, written once per tile
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((d * d, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((d * d, tile_chains), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp, S)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples], S_final

    return run

"""Fused Adaptive-Metropolis kernel (Pallas/TPU).

Beyond-parity engine (no reference equivalent; complements ops/pallas_ram.py
the way samplers/am.py complements samplers/ram.py). The entire
Haario/Roberts-Rosenthal AM loop — mixture proposal (fixed N(0, 0.1²/d·I)
component vs adapted N(0, 2.38²/d·Σₙ) component), log-density, accept, and
the exact Welford covariance recurrence — runs VMEM-resident with the
hardware PRNG.

The covariance Σₙ is carried as its Cholesky factor L (samplers/am.py
docstring derivation): the Welford step is the *always-positive* rank-1
update

    L_{n+1} = rank1_update( √(n/(n+1))·L,  (√n/(n+1))·δ ),  δ = x_{n+1} − μₙ,

so unlike RAM's hyperbolic downdates no validity flag is needed — the sweep
is a pure sequence of Givens rotations. Proposing from the adapted component
is one d×d triangular matvec (unrolled FMAs on (1, TC) lane rows).

Layout mirrors ops/pallas_ram.py: chains on the 128-wide lane axis, ``x``/
``mean`` as ``(d, TC)`` row stacks, ``L`` row-major ``(d², TC)``, and the
per-chain observation count ``n`` as an f32 ``(1, TC)`` row (exact for
n < 2²⁴; AM adaptation continues through *all* steps, including emission —
the 1/n diminishing weight is what preserves ergodicity, so unlike RAM there
is no frozen phase).
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


def _am_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    d: int,
    burn: int,
    thin: int,
    n_samples: int,
    n_groups: int,
    beta: float,
    fixed_scale: float,
    opt_scale: float,
    adapt_start: int,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, mean_ref, L_ref, n_ref,
     out_x_ref, out_lp_ref, out_acc_ref,
     out_mean_ref, out_L_ref, out_n_ref,
     sx_ref, slp_ref, smean_ref, sL_ref, sn_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    tc = x_ref.shape[1]
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    fs = jnp.float32(fixed_scale / np.sqrt(d))
    os_ = jnp.float32(opt_scale / np.sqrt(d))

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    def normals(n_rows):
        out = []
        for _ in range((n_rows + 1) // 2):
            z1, z2 = _normal_pair((1, tc))
            out.extend([z1, z2])
        return out[:n_rows]

    def matvec(L_rows, z):  # L·z (lower-triangular), unrolled FMAs
        return [
            sum(L_rows[r * d + c] * z[c] for c in range(r + 1))
            for r in range(d)
        ]

    def chol_update_pos(L_rows, v):
        """Always-positive rank-1 update (pure Givens sweep, no downdate)."""
        L = list(L_rows)
        v = list(v)
        for k in range(d):
            Lkk = L[k * d + k]
            vk = v[k]
            r = jnp.sqrt(Lkk * Lkk + vk * vk)
            c = r / Lkk
            s = vk / Lkk
            L[k * d + k] = r
            for row in range(k + 1, d):
                Lik = (L[row * d + k] + s * v[row]) / c
                v[row] = c * v[row] - s * Lik
                L[row * d + k] = Lik
        return L

    def step(x, lp, mean, L_rows, n):
        """One AM step; ``n`` is the per-chain f32 count of chain states
        consumed so far (≥ 1)."""
        z = normals(d)
        Lz = matvec(L_rows, z)
        u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        use_fixed = (u < beta) | (n <= jnp.float32(adapt_start))
        y = [
            x[r] + jnp.where(use_fixed, fs * z[r], os_ * Lz[r])
            for r in range(d)
        ]
        y_mat = jnp.concatenate(y, axis=0)  # (d, TC)
        lp_new = logdensity_tile_fn(y_mat, *consts)
        logalpha = lp_new - lp  # mixture proposal is symmetric
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        x = [jnp.where(accept, y[r], x[r]) for r in range(d)]
        lp = jnp.where(accept, lp_new, lp)
        # Welford moment advance with the realized state (accepted or not)
        n1 = n + 1.0
        inv_n1 = 1.0 / n1
        delta = [x[r] - mean[r] for r in range(d)]
        mean = [mean[r] + delta[r] * inv_n1 for r in range(d)]
        shrink = jnp.sqrt(n * inv_n1)
        coeff = jnp.sqrt(n) * inv_n1
        v = [coeff * delta[r] for r in range(d)]
        L_rows = chol_update_pos(
            [shrink * L_rows[r] for r in range(d * d)], v
        )
        return x, lp, mean, L_rows, n1, accept

    nx, nm, nl = d, d, d * d

    def pack(x, lp, mean, L_rows, n, acc):
        return tuple(x) + (lp,) + tuple(mean) + tuple(L_rows) + (n, acc)

    def unpack(flat):
        x = list(flat[:nx])
        lp = flat[nx]
        mean = list(flat[nx + 1 : nx + 1 + nm])
        L_rows = list(flat[nx + 1 + nm : nx + 1 + nm + nl])
        n = flat[nx + 1 + nm + nl]
        acc = flat[nx + 2 + nm + nl]
        return x, lp, mean, L_rows, n, acc

    def load_state():
        x = [sx_ref[r : r + 1] for r in range(d)]
        lp = slp_ref[:]
        mean = [smean_ref[r : r + 1] for r in range(d)]
        L_rows = [sL_ref[r : r + 1] for r in range(d * d)]
        n = sn_ref[:]
        return x, lp, mean, L_rows, n

    def store_state(x, lp, mean, L_rows, n):
        for r in range(d):
            sx_ref[r : r + 1] = x[r]
        slp_ref[:] = lp
        for r in range(d):
            smean_ref[r : r + 1] = mean[r]
        for r in range(d * d):
            sL_ref[r : r + 1] = L_rows[r]
        sn_ref[:] = n

    # Group 0: initialize scratch from inputs and run the burn-in sweep
    # (adaptation on, nothing emitted).
    @pl.when(g == 0)
    def _():
        x = [x_ref[r : r + 1] for r in range(d)]
        lp = lp_ref[:]
        mean = [mean_ref[r : r + 1] for r in range(d)]
        L_rows = [L_ref[r : r + 1] for r in range(d * d)]
        n = n_ref[:]

        def bbody(_, flat):
            x, lp, mean, L_rows, n, acc = unpack(flat)
            x, lp, mean, L_rows, n, accept = step(x, lp, mean, L_rows, n)
            return pack(x, lp, mean, L_rows, n, accept.astype(jnp.float32))

        flat = pack(x, lp, mean, L_rows, n, jnp.zeros((1, tc), jnp.float32))
        flat = jax.lax.fori_loop(0, burn, bbody, flat)
        x, lp, mean, L_rows, n, _ = unpack(flat)
        store_state(x, lp, mean, L_rows, n)

    # Emission: E thinned samples per grid step, adaptation continuing.
    x, lp, mean, L_rows, n = load_state()

    def ebody(e, flat):
        old = flat
        x, lp, mean, L_rows, n, acc = unpack(flat)
        for _ in range(thin):  # static
            x, lp, mean, L_rows, n, accept = step(x, lp, mean, L_rows, n)
            acc = accept.astype(jnp.float32)  # f32: i1 fori carries are fragile
        # Padded emission slots (the last group rounds n_samples up to E)
        # must not advance the chain: the final state IS the last emitted
        # sample's state, so resume counts stay exact. f32 blend, not an
        # i1 select — scalar-pred vector selects are fragile in Mosaic.
        m = (g * E + e < n_samples).astype(jnp.float32)
        new = pack(x, lp, mean, L_rows, n, acc)
        flat = tuple(m * a + (1.0 - m) * b for a, b in zip(new, old))
        x, lp, mean, L_rows, n, acc = unpack(flat)
        out_x_ref[pl.ds(e, 1)] = jnp.concatenate(x, axis=0)[None]
        out_lp_ref[pl.ds(e, 1)] = lp[None]
        out_acc_ref[pl.ds(e, 1)] = acc[None]
        return flat

    flat = pack(x, lp, mean, L_rows, n, jnp.zeros((1, tc), jnp.float32))
    flat = jax.lax.fori_loop(0, E, ebody, flat)
    x, lp, mean, L_rows, n, _ = unpack(flat)
    store_state(x, lp, mean, L_rows, n)
    out_mean_ref[:] = jnp.concatenate(mean, axis=0)
    out_L_ref[:] = jnp.concatenate(L_rows, axis=0)
    out_n_ref[:] = n


def fused_am_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    burn: int,
    thin: int = 1,
    beta: float = 0.05,
    fixed_scale: float = 0.1,
    opt_scale: float = 2.38,
    adapt_start: int = None,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused AM engine.

    Returns ``fn(x_T (d, C), lp (1, C), mean (d, C), L (d*d, C), n (1, C),
    seed) -> (samples (n_samples, d, C), lps (n_samples, 1, C), accepted
    (n_samples, 1, C), mean_final (d, C), L_final (d*d, C), n_final (1, C))``.
    ``burn`` adaptation steps run first and are discarded; adaptation then
    continues through every emitted step (the AM contract — diminishing 1/n
    weights keep it ergodic, samplers/am.py docstring).
    """
    if d > 8:
        raise ValueError(
            "fused_am_sample statically unrolls the d×d sweep; supported "
            f"for d <= 8 (got {d}). Use the XLA path for larger d."
        )
    if adapt_start is None:
        adapt_start = 2 * d
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _am_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        d=d,
        burn=burn,
        thin=thin,
        n_samples=n_samples,
        n_groups=n_groups,
        beta=beta,
        fixed_scale=fixed_scale,
        opt_scale=opt_scale,
        adapt_start=int(adapt_start),
    )

    @jax.jit
    def run(x_t, lp, mean, L, n, seed):
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
        samples, lps, accs, mean_f, L_f, n_f = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
                tin(d),
                tin(d * d),
                tin(1),
            ],
            out_specs=[
                tout(d),
                tout(1),
                tout(1),
                tin(d),  # final mean
                tin(d * d),  # final L
                tin(1),  # final n
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((d, c), jnp.float32),
                jax.ShapeDtypeStruct((d * d, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((d * d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp, mean, L, n)
        return (
            samples[:n_samples], lps[:n_samples], accs[:n_samples],
            mean_f, L_f, n_f,
        )

    return run

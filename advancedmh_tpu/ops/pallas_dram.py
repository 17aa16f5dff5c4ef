"""Fused DRAM kernel (Pallas/TPU) — delayed rejection × adaptive Metropolis.

Companion to samplers/dram.py (Haario et al. 2006): per step, two adapted
Gaussian stages (the second shrunk by γ), the Mira stage-2 acceptance, and
the exact Welford Cholesky advance — all VMEM-resident. Because both stages
share the same L, the q₁ cross term lives in z-space (samplers/dram.py
docstring): dq = −½(‖z₁ − γz₂‖² − ‖z₁‖²) — no triangular solve.

State layout and engine structure mirror ops/pallas_am.py (x/mean as (d, TC)
row stacks, L row-major (d², TC), counts as f32 rows; adaptation continues
through emission).
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_am import _row_normals, _tri_matvec_rows, _welford_advance
from .pallas_dr import _log1m_exp_f32
from .pallas_mh import _uniform_from_bits


def _dram_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    d: int,
    burn: int,
    thin: int,
    n_samples: int,
    n_groups: int,
    opt_scale: float,
    gamma: float,
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
    os_ = jnp.float32(opt_scale / np.sqrt(d))
    gm = jnp.float32(gamma)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    def step(x, lp, mean, L_rows, n):
        z1 = _row_normals(d, tc)
        z2 = _row_normals(d, tc)
        Lz1 = _tri_matvec_rows(L_rows, z1, d)
        Lz2 = _tri_matvec_rows(L_rows, z2, d)
        # Stage 1: bold adapted Gaussian (symmetric → α₁ = Δlp).
        y1 = [x[r] + os_ * Lz1[r] for r in range(d)]
        lp1 = logdensity_tile_fn(jnp.concatenate(y1, axis=0), *consts)
        la1 = lp1 - lp
        u1 = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        acc1 = jnp.log(u1) < la1
        # Stage 2: γ-shrunk, evaluated unconditionally, masked in.
        y2 = [x[r] + (gm * os_) * Lz2[r] for r in range(d)]
        lp2 = logdensity_tile_fn(jnp.concatenate(y2, axis=0), *consts)
        la1_rev = lp1 - lp2
        dq = sum(
            -0.5 * ((z1[r] - gm * z2[r]) ** 2 - z1[r] ** 2) for r in range(d)
        )
        la2 = (lp2 - lp + dq
               + _log1m_exp_f32(la1_rev) - _log1m_exp_f32(la1))
        u2 = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        acc2 = (jnp.log(u2) < la2) & (~acc1)
        x = [
            jnp.where(acc1, y1[r], jnp.where(acc2, y2[r], x[r]))
            for r in range(d)
        ]
        lp = jnp.where(acc1, lp1, jnp.where(acc2, lp2, lp))
        mean, L_rows, n1 = _welford_advance(x, mean, L_rows, n, d)
        return x, lp, mean, L_rows, n1, acc1 | acc2

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

    @pl.when(g == 0)
    def _():
        x = [x_ref[r : r + 1] for r in range(d)]
        lp = lp_ref[:]
        mean = [mean_ref[r : r + 1] for r in range(d)]
        L_rows = [L_ref[r : r + 1] for r in range(d * d)]
        n = n_ref[:]

        def bbody(_, flat):
            x, lp, mean, L_rows, n, _a = unpack(flat)
            x, lp, mean, L_rows, n, accept = step(x, lp, mean, L_rows, n)
            return pack(x, lp, mean, L_rows, n, accept.astype(jnp.float32))

        flat = pack(x, lp, mean, L_rows, n, jnp.zeros((1, tc), jnp.float32))
        flat = jax.lax.fori_loop(0, burn, bbody, flat)
        x, lp, mean, L_rows, n, _ = unpack(flat)
        store_state(x, lp, mean, L_rows, n)

    x, lp, mean, L_rows, n = load_state()

    def ebody(e, flat):
        old = flat
        x, lp, mean, L_rows, n, acc = unpack(flat)
        for _ in range(thin):  # static
            x, lp, mean, L_rows, n, accept = step(x, lp, mean, L_rows, n)
            acc = accept.astype(jnp.float32)
        # Padded slots must not advance the chain (≙ pallas_am.py ebody).
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


def fused_dram_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    burn: int,
    thin: int = 1,
    opt_scale: float = 2.38,
    gamma: float = 0.2,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused DRAM engine — same I/O contract as fused_am_sample:
    ``fn(x_T, lp, mean, L, n, seed) -> (samples, lps, accepted, mean_f, L_f,
    n_f)``; adaptation runs through burn and emission alike."""
    if d > 8:
        raise ValueError(
            "fused_dram_sample statically unrolls the d×d sweep; supported "
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
        _dram_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        d=d,
        burn=burn,
        thin=thin,
        n_samples=n_samples,
        n_groups=n_groups,
        opt_scale=opt_scale,
        gamma=gamma,
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
                tin(d),
                tin(d * d),
                tin(1),
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

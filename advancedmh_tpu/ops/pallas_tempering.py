"""Fused replica-exchange (parallel tempering) kernel (Pallas/TPU).

Beyond-parity engine (see samplers/tempering.py for the algorithm). One
kernel launch runs, for every chain, K tempered RWMH replicas targeting
β_k·logπ plus the even-odd adjacent-swap sweep — entirely VMEM-resident
with the hardware PRNG. Tempering is *the* mode-hopping workhorse and its
cost is K densities per step, so keeping the whole ladder in VMEM matters
more here than for any single-temperature sampler.

Layout: chains on lanes. Replica k's position occupies rows
``x[k*d : (k+1)*d]`` of a ``(K*d, TC)`` stack; the kernel carries the *raw*
log density ℓ_k per replica (one ``(1, TC)`` row each) and tempers on use
(the swap acceptance ``(β_k − β_{k+1})(ℓ_{k+1} − ℓ_k)`` then needs no
division). Even-odd parity makes accepted swaps disjoint, so a swap is a
per-chain f32 blend of the two row blocks. Each pair (k, k+1) is proposed
exactly once per step (in the sweep matching k's parity), so swap proposal
counts are deterministic (= steps taken) and only acceptances are tracked.

``replica_scales`` scales the proposal per temperature (hotter replicas
take larger steps — the standard β^{-1/2} choice); the XLA path uses one
shared sampler, so pass all-ones for distribution parity with it.
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _uniform_from_bits


def _tempering_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    d: int,
    K: int,
    betas: Tuple[float, ...],
    scales: Tuple[Tuple[float, ...], ...],  # per replica, per dim
    burn: int,
    thin: int,
    n_samples: int,
    n_groups: int,
):
    const_refs = rest[:n_consts]
    (x_ref, ell_ref, out_x_ref, out_lp_ref, out_acc_ref, out_xf_ref,
     out_ellf_ref, out_sw_ref, sx_ref, sell_ref, ssw_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g = pl.program_id(1)
    tc = x_ref.shape[1]
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g)

    def normals(n_rows):
        out = []
        for _ in range((n_rows + 1) // 2):
            z1, z2 = _normal_pair((1, tc))
            out.extend([z1, z2])
        return out[:n_rows]

    nx, nl, ns = K * d, K, K - 1

    def step(x, ell, sw):
        """K independent tempered RWMH steps + one even-odd swap sweep.
        ``x`` is a list of K·d rows, ``ell`` of K raw-logdensity rows,
        ``sw`` of K−1 swap-acceptance counters."""
        cold_acc = None
        for k in range(K):
            z = normals(d)
            y = [
                x[k * d + r] + jnp.float32(scales[k][r]) * z[r]
                for r in range(d)
            ]
            ell_y = logdensity_tile_fn(jnp.concatenate(y, axis=0), *consts)
            logalpha = jnp.float32(betas[k]) * (ell_y - ell[k])
            e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
            accept = e > -logalpha
            for r in range(d):
                x[k * d + r] = jnp.where(accept, y[r], x[k * d + r])
            ell[k] = jnp.where(accept, ell_y, ell[k])
            if k == 0:
                cold_acc = accept.astype(jnp.float32)
        for parity in (0, 1):
            for k in range(parity, K - 1, 2):
                logalpha = jnp.float32(betas[k] - betas[k + 1]) * (
                    ell[k + 1] - ell[k]
                )
                u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
                m = (jnp.log(u) < logalpha).astype(jnp.float32)
                mi = 1.0 - m
                for r in range(d):
                    a, b = x[k * d + r], x[(k + 1) * d + r]
                    x[k * d + r] = m * b + mi * a
                    x[(k + 1) * d + r] = m * a + mi * b
                ea, eb = ell[k], ell[k + 1]
                ell[k] = m * eb + mi * ea
                ell[k + 1] = m * ea + mi * eb
                sw[k] = sw[k] + m
        return x, ell, sw, cold_acc

    def pack(x, ell, sw, acc):
        return tuple(x) + tuple(ell) + tuple(sw) + (acc,)

    def unpack(flat):
        return (
            list(flat[:nx]),
            list(flat[nx : nx + nl]),
            list(flat[nx + nl : nx + nl + ns]),
            flat[nx + nl + ns],
        )

    def load_state():
        x = [sx_ref[r : r + 1] for r in range(nx)]
        ell = [sell_ref[r : r + 1] for r in range(nl)]
        sw = [ssw_ref[r : r + 1] for r in range(ns)]
        return x, ell, sw

    def store_state(x, ell, sw):
        for r in range(nx):
            sx_ref[r : r + 1] = x[r]
        for r in range(nl):
            sell_ref[r : r + 1] = ell[r]
        for r in range(ns):
            ssw_ref[r : r + 1] = sw[r]

    zero = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g == 0)
    def _():
        x = [x_ref[r : r + 1] for r in range(nx)]
        ell = [ell_ref[r : r + 1] for r in range(nl)]
        sw = [zero for _ in range(ns)]

        def bbody(_, flat):
            x, ell, sw, _a = unpack(flat)
            x, ell, sw, acc = step(x, ell, sw)
            return pack(x, ell, sw, acc)

        flat = jax.lax.fori_loop(0, burn, bbody, pack(x, ell, sw, zero))
        x, ell, sw, _ = unpack(flat)
        store_state(x, ell, sw)

    x, ell, sw = load_state()

    def ebody(e, flat):
        old = flat
        x, ell, sw, acc = unpack(flat)
        for _ in range(thin):  # static
            x, ell, sw, acc = step(x, ell, sw)
        # padded emission slots must not advance the chain (exact resume)
        m = (g * E + e < n_samples).astype(jnp.float32)
        flat = tuple(
            m * a + (1.0 - m) * b
            for a, b in zip(pack(x, ell, sw, acc), old)
        )
        x, ell, sw, acc = unpack(flat)
        # emit the cold replica (β = 1, so lp = ℓ₀)
        out_x_ref[pl.ds(e, 1)] = jnp.concatenate(x[:d], axis=0)[None]
        out_lp_ref[pl.ds(e, 1)] = ell[0][None]
        out_acc_ref[pl.ds(e, 1)] = acc[None]
        return flat

    flat = jax.lax.fori_loop(0, E, ebody, pack(x, ell, sw, zero))
    x, ell, sw, _ = unpack(flat)
    store_state(x, ell, sw)
    out_xf_ref[:] = jnp.concatenate(x, axis=0)
    out_ellf_ref[:] = jnp.concatenate(ell, axis=0)
    out_sw_ref[:] = jnp.concatenate(sw, axis=0) if ns else zero


def fused_tempering_sample(
    logdensity_tile_fn: Callable,
    d: int,
    betas: Sequence[float],
    scale,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    replica_scales: Sequence[float] = None,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Build the fused replica-exchange engine (RWMH inner kernel).

    ``scale`` is the base proposal scale — scalar or per-dimension ``(d,)``;
    ``replica_scales`` multiplies it per temperature (default all-ones,
    matching the XLA path's shared inner sampler). Returns
    ``fn(x_T (K*d, C), ell (K, C), seed) -> (samples (n_samples, d, C),
    lps (n_samples, 1, C), accepted (n_samples, 1, C), x_final (K*d, C),
    ell_final (K, C), swap_accepts (K-1, C))`` — emissions are the cold
    replica; the final ladder state supports chunked resume; swap proposal
    counts are deterministic (= total steps, one per adjacent pair per
    step).
    """
    K = len(betas)
    if K < 2:
        raise ValueError("tempering needs at least 2 temperatures")
    if K * d > 64:
        raise ValueError(
            f"fused tempering unrolls K·d rows; K*d={K*d} > 64 — use the "
            "XLA path for larger ladders/dimensions."
        )
    base = np.broadcast_to(np.asarray(scale, np.float32), (d,))
    rs = (
        np.ones((K,), np.float32)
        if replica_scales is None
        else np.asarray(replica_scales, np.float32)
    )
    if rs.shape != (K,):
        raise ValueError(f"replica_scales must have shape ({K},)")
    scales = tuple(tuple(float(rs[k] * base[r]) for r in range(d)) for k in range(K))
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _tempering_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        d=d,
        K=K,
        betas=tuple(float(b) for b in betas),
        scales=scales,
        burn=burn,
        thin=thin,
        n_samples=n_samples,
        n_groups=n_groups,
    )

    @jax.jit
    def run(x_t, ell, seed):
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
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[whole(cst) for cst in consts],
                tin(K * d),
                tin(K),
            ],
            out_specs=[
                tout(d),
                tout(1),
                tout(1),
                tin(K * d),
                tin(K),
                tin(max(K - 1, 1)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_padded, d, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((n_padded, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((K * d, c), jnp.float32),
                jax.ShapeDtypeStruct((K, c), jnp.float32),
                jax.ShapeDtypeStruct((max(K - 1, 1), c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((K * d, tile_chains), jnp.float32),
                pltpu.VMEM((K, tile_chains), jnp.float32),
                pltpu.VMEM((max(K - 1, 1), tile_chains), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, ell)
        samples, lps, accs, x_f, ell_f, sw = outs
        return (
            samples[:n_samples], lps[:n_samples], accs[:n_samples],
            x_f, ell_f, sw,
        )

    return run

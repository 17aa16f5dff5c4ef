"""Fused Langevin-MALA kernel (Pallas/TPU).

The canonical MALA proposal — ``y = x + (σ²/2)∇logπ(x) + σ·z`` with the
gradient-dependent asymmetric Hastings correction (≙ reference src/MALA.jl
with ``MALA(g -> MvNormal(σ²/2 g, σ² I))``) — runs entirely in VMEM. The
gradient of the *tile* log-density is obtained by tracing
``jax.value_and_grad`` inside the kernel body (the tile density decouples
over chains, so grad of the chain-sum is the per-chain gradient), and is
carried in scratch between steps so each step costs exactly one fused
value+gradient evaluation (the reference's contract, src/MALA.jl:73-75).

Same grid/emission structure as ops/pallas_mh.py: chains on lanes,
(chain-tile × sample-group) grid, state persisted in scratch, thinned draws
streamed to HBM.
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


def _mala_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    s2: float,
    burn: int,
    thin: int,
    n_groups: int,
):
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, g_ref, out_x_ref, out_lp_ref, out_acc_ref,
     sx_ref, slp_ref, sg_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    sigma = jnp.float32(np.sqrt(s2))
    half_s2 = jnp.float32(0.5 * s2)
    inv_2s2 = jnp.float32(1.0 / (2.0 * s2))

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def value_and_grad(y):
        # Tile density decouples over chains (lanes), so pulling back a
        # ones-cotangent through vjp yields the per-chain gradient — and the
        # per-chain lp comes from the same single forward pass (no reliance
        # on the compiler CSE-ing a duplicated forward).
        lp, pullback = jax.vjp(
            lambda ym: logdensity_tile_fn(ym, *consts), y
        )
        (grad,) = pullback(jnp.ones_like(lp))
        return lp, grad

    def normals():
        z, _ = _normal_pair((d, tc))
        return z  # (d, TC)

    def step(x, lp, grad):
        z = normals()
        drift_x = x + half_s2 * grad
        y = drift_x + sigma * z
        lp_y, grad_y = value_and_grad(y)
        drift_y = y + half_s2 * grad_y
        # log q(x|y) − log q(y|x); Gaussian kernels, constants cancel.
        fwd = jnp.sum(jnp.square(y - drift_x), axis=0, keepdims=True)
        bwd = jnp.sum(jnp.square(x - drift_y), axis=0, keepdims=True)
        logalpha = lp_y - lp + (fwd - bwd) * inv_2s2
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        mask = jnp.broadcast_to(accept, (d, tc))
        x = jnp.where(mask, y, x)
        lp = jnp.where(accept, lp_y, lp)
        grad = jnp.where(mask, grad_y, grad)
        # f32, not bool: an i1 vector carried through nested fori_loops
        # (emit×thin) fails Mosaic legalization (tpu.roll_vectors on i1).
        return x, lp, grad, accept.astype(jnp.float32)

    def sweep(carry, n):
        def body(_, c):
            x, lp, grad, _a = step(c[0], c[1], c[2])
            return x, lp, grad, _a

        return jax.lax.fori_loop(0, n, body, carry)

    zero_acc = jnp.zeros((1, tc), jnp.float32)

    @pl.when(g_id == 0)
    def _():
        carry = (x_ref[:], lp_ref[:], g_ref[:], zero_acc)
        carry = sweep(carry, burn)
        sx_ref[:] = carry[0]
        slp_ref[:] = carry[1]
        sg_ref[:] = carry[2]

    def emit(e, carry):
        carry = sweep(carry, thin)
        out_x_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[3][None]
        return carry

    carry = (sx_ref[:], slp_ref[:], sg_ref[:], zero_acc)
    carry = jax.lax.fori_loop(0, E, emit, carry)
    sx_ref[:] = carry[0]
    slp_ref[:] = carry[1]
    sg_ref[:] = carry[2]


def fused_mala_sample(
    logdensity_tile_fn: Callable,
    d: int,
    step_size_sq: float,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 2048,
    samples_per_block: int = 32,
):
    """Build the fused Langevin-MALA engine.

    Returns ``fn(x_T (d, C), lp (1, C), grad (d, C), seed) -> (samples
    (n_samples, d, C), lps, accepted)``.
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
        _mala_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        s2=float(step_size_sq),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
    )

    @jax.jit
    def run(x_t, lp, grad, seed):
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
                tin(d),
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
                pltpu.VMEM((d, tile_chains), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp, grad)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

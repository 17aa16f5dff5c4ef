"""Fused multi-step random-walk Metropolis kernel (Pallas/TPU).

The XLA path (samplers/mh.py step_batched under lax.scan) is already ~1000×
the reference's sequential throughput, but each step is a chain of separate
HBM-roundtripping ops (threefry bits → normal → density → select). This
kernel runs the *entire propose→logdensity→accept loop in VMEM*: chain state
never leaves on-chip memory between steps, random bits come from the per-core
hardware PRNG (`pltpu.prng_random_bits`), and N steps execute in one kernel
launch.

Layout: chains live on the **lane** axis — params are stored transposed as
``(d, C)`` so the d≪128 parameter axis sits on sublanes and the chain batch
fills the 128-wide lanes (SURVEY.md §7 'speed-of-light' requirement; cf.
pallas_guide.md tiling constraints).

Scope: symmetric Gaussian random-walk proposals (isotropic or per-dim scale)
— the reference's flagship ``RWMH(MvNormal(Zeros(d), I))`` family — against a
model that provides a *tile* log-density ``f((d, TC)) -> (1, TC)`` built from
jnp ops (any elementwise/broadcast/reduce density works; supply it via
``DensityModel(logdensity_tile_fn=...)`` or let ``tile_fn_from_batched``
adapt a chain-batched density).

RNG note: uses the TPU hardware PRNG (per-tile seeded), not threefry — the
stream differs from the XLA path; equality with the reference is in
distribution either way (SURVEY.md §7).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _uniform_from_bits(bits: jax.Array) -> jax.Array:
    """random bits → float32 uniform in (0, 1).

    ``prng_random_bits`` yields (possibly signed) 32-bit words; masking the
    low 23 bits is sign-safe in int32 and feeds the full float32 mantissa.
    """
    return (bits & 0x7FFFFF).astype(jnp.float32) * jnp.float32(
        2**-23
    ) + jnp.float32(2**-24)


def _normal_pair(shape) -> Tuple[jax.Array, jax.Array]:
    """Box-Muller from two uniform draws of the hardware PRNG."""
    u1 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


_UNROLL_MATVEC_MAX_DIM = 16  # ≙ ops/cholesky.py UNROLL_MAX_DIM crossover


def _perturb_fn(scale_ref, tril: bool, exact: bool = False):
    """Proposal perturbation from the scale block: per-dim column multiply
    (diagonal) or an L @ z triangular matvec (full covariance,
    ``scale_tril``). Symmetry of the random walk is unaffected either way.

    ``exact=True`` guarantees full-f32 matvec arithmetic — required by
    samplers whose correctness depends on the proposal matching a reference
    measure *exactly* (pCN prior-reversibility, the ESS prior ellipse): the
    MXU's default precision truncates L and z to bf16, which is harmless
    for symmetric random walks but produced a measured 2-4% posterior-mean
    bias for fused pCN on the d=16 GP target. For d ≤ 16 the matvec is
    statically unrolled into VPU row FMAs (exact AND the fast path — same
    crossover as ops/cholesky.py); above that, exact=True falls back to
    ``Precision.HIGHEST`` on the MXU, whose Mosaic compile is slow (~7 min
    through the tunnel) — prefer the XLA engine for d > 16 exact samplers.
    """
    scale = scale_ref[:]
    if not tril:
        return lambda z: scale * z
    d = scale_ref.shape[0]
    if d <= _UNROLL_MATVEC_MAX_DIM:
        # Column accumulation: d broadcast FMAs of (d, TC) — 8× fewer ops to
        # lower than a row-by-row triangular sweep (compile time through the
        # Mosaic tunnel is the binding constraint), upper-triangle zero
        # multiplies are VPU-free by comparison.
        def unrolled(z):
            acc = scale[:, 0:1] * z[0:1]
            for c in range(1, d):
                acc = acc + scale[:, c : c + 1] * z[c : c + 1]
            return acc

        return unrolled
    precision = jax.lax.Precision.HIGHEST if exact else None
    return lambda z: jax.lax.dot_general(
        scale, z, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _rwmh_kernel(
    seed_ref,  # (1, 1) int32 in SMEM
    scale_ref,  # (d, 1) f32 per-dim std-dev, or (d, d) lower Cholesky
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    n_steps: int,
    tril: bool = False,
):
    const_refs = rest[:n_consts]
    params_ref, lp_ref, out_params_ref, out_lp_ref, accepts_ref = rest[n_consts:]
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    d, tc = params_ref.shape
    perturb = _perturb_fn(scale_ref, tril)
    consts = tuple(c[:] for c in const_refs)

    def one_step(params, lp, acc, z):
        candidate = params + perturb(z)
        lp_cand = logdensity_tile_fn(candidate, *consts)  # (1, TC)
        # accept iff log(U) < logα  ⟺  -randexp < logα (symmetric proposal)
        u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        accept = jnp.log(u) < lp_cand - lp  # (1, TC)
        params = jnp.where(accept, candidate, params)
        lp = jnp.where(accept, lp_cand, lp)
        return params, lp, acc + accept.astype(jnp.float32)

    def body(_, carry):
        params, lp, acc = carry
        # Box-Muller yields two independent normals per bits-pair — run two
        # MH steps per iteration so neither half is wasted.
        z1, z2 = _normal_pair((d, tc))
        params, lp, acc = one_step(params, lp, acc, z1)
        params, lp, acc = one_step(params, lp, acc, z2)
        return params, lp, acc

    assert n_steps % 2 == 0, "n_steps must be even (two MH steps per iteration)"
    params, lp, acc = jax.lax.fori_loop(
        0,
        n_steps // 2,
        body,
        (params_ref[:], lp_ref[:], jnp.zeros((1, tc), jnp.float32)),
    )
    out_params_ref[:] = params
    out_lp_ref[:] = lp
    accepts_ref[:] = acc


def fused_rwmh(
    logdensity_tile_fn: Callable,
    d: int,
    scale,
    n_steps: int,
    *,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    interpret: bool = False,
):
    """Build the fused kernel: ``fn(params_T (d, C), lp (1, C), seed) ->
    (params_T, lp, accept_counts)`` running ``n_steps`` in one launch.

    ``scale`` is a scalar or length-d per-dimension proposal std-dev, or a
    ``(d, d)`` lower-triangular Cholesky factor for a full-covariance
    proposal. ``consts`` are model constant arrays (e.g. observed data, ≥2-D
    each); they are broadcast to every tile and passed to
    ``logdensity_tile_fn`` after the candidate params (Pallas kernels cannot
    close over arrays). ``C`` must be a multiple of ``tile_chains`` (pick a
    multiple of 128).
    """
    scale_arr, tril = _scale_block(scale, d)
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    kernel = functools.partial(
        _rwmh_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        n_steps=n_steps,
        tril=tril,
    )

    @jax.jit
    def run(params_t: jax.Array, lp: jax.Array, seed) -> Tuple[jax.Array, ...]:
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
            interpret=interpret,
        )(seed_arr, scale_arr, *consts, params_t, lp)

    return run


def _scale_block(scale, d: int) -> Tuple[jax.Array, bool]:
    """Normalize a user scale to the kernel's block: (d, 1) per-dim std-dev
    column, or (d, d) lower Cholesky (tril=True)."""
    arr = jnp.asarray(scale, jnp.float32)
    if arr.ndim == 2:
        if arr.shape != (d, d):
            raise ValueError(f"matrix scale must be ({d}, {d}), got {arr.shape}")
        return jnp.tril(arr), True
    col = jnp.broadcast_to(arr.reshape(-1, 1), (d, 1)) * jnp.ones(
        (d, 1), jnp.float32
    )
    return col, False


def _rwmh_sampling_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    scale_ref,  # (d, 1) f32, or (d, d) lower Cholesky
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    burn: int,
    thin: int,
    n_groups: int,
    tril: bool = False,
):
    const_refs = rest[:n_consts]
    (params_ref, lp_ref, out_params_ref, out_lp_ref, out_acc_ref,
     sp_ref, slp_ref) = rest[n_consts:]
    i = pl.program_id(0)  # chain tile (outer)
    g = pl.program_id(1)  # sample group (inner); emits E samples per step
    d, tc = params_ref.shape
    E = out_params_ref.shape[0]
    perturb = _perturb_fn(scale_ref, tril)
    consts = tuple(c[:] for c in const_refs)

    # Distinct deterministic seed per (tile, group): PRNG state need not
    # persist across grid steps.
    pltpu.prng_seed(seed_ref[0, 0] + i * n_groups + g)

    def one_step(carry, z):
        params, lp, acc = carry
        candidate = params + perturb(z)
        lp_cand = logdensity_tile_fn(candidate, *consts)
        u = _uniform_from_bits(pltpu.prng_random_bits((1, tc)))
        accept = jnp.log(u) < lp_cand - lp
        return (
            jnp.where(accept, candidate, params),
            jnp.where(accept, lp_cand, lp),
            accept.astype(jnp.float32),
        )

    def pair(k, carry):
        z1, z2 = _normal_pair((d, tc))
        carry = one_step(carry, z1)
        return one_step(carry, z2)

    def sweep(carry, n):  # n static
        if n % 2 == 1:
            z, _ = _normal_pair((d, tc))
            carry = one_step(carry, z)
        return jax.lax.fori_loop(0, n // 2, pair, carry)

    # Fresh state + burn at the start of each tile's sweep (all static).
    @pl.when(g == 0)
    def _():
        carry = (params_ref[:], lp_ref[:], jnp.zeros((1, tc), jnp.float32))
        carry = sweep(carry, burn)
        sp_ref[:] = carry[0]
        slp_ref[:] = carry[1]

    def store(e, carry):
        out_params_ref[pl.ds(e, 1)] = carry[0][None]
        out_lp_ref[pl.ds(e, 1)] = carry[1][None]
        out_acc_ref[pl.ds(e, 1)] = carry[2][None]

    carry0 = (sp_ref[:], slp_ref[:], jnp.zeros((1, tc), jnp.float32))
    if thin == 1:
        # Two samples per Box-Muller pair: neither normal half is wasted.
        def emit2(k, carry):
            z1, z2 = _normal_pair((d, tc))
            carry = one_step(carry, z1)
            store(2 * k, carry)
            carry = one_step(carry, z2)
            store(2 * k + 1, carry)
            return carry

        carry = jax.lax.fori_loop(0, E // 2, emit2, carry0)
        if E % 2:  # odd block: one unpaired trailing step
            z, _ = _normal_pair((d, tc))
            carry = one_step(carry, z)
            store(E - 1, carry)
    else:

        def emit(e, carry):
            carry = sweep(carry, thin)
            store(e, carry)
            return carry

        carry = jax.lax.fori_loop(0, E, emit, carry0)
    sp_ref[:] = carry[0]
    slp_ref[:] = carry[1]


def fused_rwmh_sample(
    logdensity_tile_fn: Callable,
    d: int,
    scale,
    n_samples: int,
    *,
    burn: int = 0,
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 32,
):
    """Full fused *sampling* engine: emits ``n_samples`` thinned draws.

    Returns ``fn(params_T (d, C), lp (1, C), seed) -> (samples (n_samples, d,
    C), lps (n_samples, 1, C), accepted (n_samples, 1, C))`` where sample ``k``
    is the state after ``burn + (k+1)*thin`` MH steps. The grid iterates
    (chain-tile, group); each group statically unrolls ``samples_per_block``
    thinned samples (amortizing per-grid-step overhead), chain state persists
    in VMEM scratch across a tile's sweep, and output blocks stream to HBM —
    ~12 bytes/chain/kept-sample against ~800 GB/s HBM, invisible next to
    compute. ``scale`` may be scalar/length-d (diagonal) or a ``(d, d)``
    lower Cholesky factor (full-covariance proposal via MXU matvec).
    """
    scale_arr, tril = _scale_block(scale, d)
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    n_groups = -(-n_samples // E)  # ceil; trailing overshoot trimmed below
    n_padded = n_groups * E
    kernel = functools.partial(
        _rwmh_sampling_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        burn=burn,
        thin=thin,
        n_groups=n_groups,
        tril=tril,
    )

    @jax.jit
    def run(params_t: jax.Array, lp: jax.Array, seed):
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
        tiled_in = lambda rows: pl.BlockSpec(
            (rows, tile_chains), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        tiled_out = lambda rows: pl.BlockSpec(
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
                tiled_in(d),
                tiled_in(1),
            ],
            out_specs=[tiled_out(d), tiled_out(1), tiled_out(1)],
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


def tile_fn_from_batched(logdensity_batched_fn: Callable) -> Callable:
    """Adapt a chain-batched density ``(C, d) -> (C,)`` to the kernel's
    transposed tile layout ``(d, TC) -> (1, TC)``. The function must consist
    of Pallas-supported jnp ops."""

    def tile_fn(params_t):
        return logdensity_batched_fn(params_t.T)[None, :]

    return tile_fn

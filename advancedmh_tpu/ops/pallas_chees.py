"""Fused ChEES-HMC frozen-phase engine (Pallas/TPU).

The post-warmup half of :class:`samplers.chees.ChEESHMC` — frozen shared
(ε̄, T̄, diag M⁻¹), jittered trajectory length per draw — as a VMEM-resident
kernel. The warmup half stays on the XLA engine on purpose: its cross-chain
pooled statistics (ChEES gradient, mean acceptance, pooled Welford) reduce
over the *whole* chain batch, which spans grid tiles; the frozen phase has
no cross-chain coupling at all, so it fuses cleanly.

**Host-staged static trajectory schedule** (the TPU-native move): the XLA
path draws the trajectory jitter ``u ~ U(0,1)`` per iteration and runs a
traced-bound ``while_loop`` of ``clip(round(u·T̄/ε̄), 1, max_leapfrog)``
leapfrog trips — measured 1.6x slower than static loops, and the only
dynamic control flow left in the sampler. Here the launcher instead pulls
the two adapted *scalars* (ε̄, T̄) to the host after warmup (~ms), quantizes
the ratio ``R = round(T̄/ε̄)`` to an integer, and bakes a deterministic
van-der-Corput (Halton base-2) jitter schedule

    L_e = clip(round(u_e · R), 1, R),   u_e = vdc(e+1) ∈ (0, 1)

into the kernel as *static* loop bounds — zero dynamic control flow, zero
masked-step waste. Deterministic low-discrepancy jitter is exactly TFP's
ChEES choice; statistically the draw sequence is a cyclic composition of
fixed-length HMC kernels, each of which leaves the target invariant, and
the schedule's spread serves the same anti-resonance purpose as uniform
jitter (Neal 2011 §5.4.1.3). Kernel variants are keyed by the small integer
``R`` (+ block geometry), so recompiles happen only when the adapted ratio
itself moves.

ε̄ stays a *runtime* SMEM scalar and M⁻¹ a runtime ``(d, 1)`` column —
continuous changes in the adapted values never recompile; only ``R`` does.

Layout, PRNG, and gotchas follow ops/pallas_hmc.py (chains on lanes,
in-kernel ``jax.vjp`` gradients, accept flags as f32, static trip counts).
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mh import _normal_pair, _uniform_from_bits


def vdc(i: int) -> float:
    """Van der Corput base-2 radical inverse of ``i ≥ 1`` (in (0, 1))."""
    u, f = 0.0, 0.5
    while i:
        u += f * (i & 1)
        i >>= 1
        f *= 0.5
    return u


def halton_trips(ratio: int, n: int, max_leapfrog: int) -> Tuple[int, ...]:
    """Static leapfrog-trip schedule: vdc-jittered fractions of ``ratio``
    (= round(T̄/ε̄)), clipped to [1, min(ratio, max_leapfrog)]."""
    hi = max(1, min(int(ratio), int(max_leapfrog)))
    return tuple(
        max(1, min(hi, round(vdc(e + 1) * ratio))) for e in range(n)
    )


def _chees_frozen_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    trips: Tuple[int, ...],  # static; length E·thin
    thin: int,
    n_groups: int,
):
    const_refs = rest[:n_consts]
    (minv_ref, eps_ref, x_ref, lp_ref, g_ref, out_x_ref, out_lp_ref,
     out_acc_ref, sx_ref, slp_ref, sg_ref) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = out_x_ref.shape[0]
    consts = tuple(c[:] for c in const_refs)
    minv = minv_ref[:]  # (d, 1) shared diagonal inverse mass
    inv_sqrt_minv = jax.lax.rsqrt(minv)
    # Frozen ε̄ as a (1, TC) lane vector (runtime value): shared for ChEES
    # (a broadcast column), per-chain for pooled AdaptiveHMC (whose dual
    # averaging is per-chain even when the mass is pooled).
    eps = eps_ref[:]
    half_eps = 0.5 * eps

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def value_and_grad(y):
        lp, pullback = jax.vjp(
            lambda ym: logdensity_tile_fn(ym, *consts), y
        )
        (grad,) = pullback(jnp.ones_like(lp))
        return lp, grad

    def kinetic(p):
        return 0.5 * jnp.sum(p * p * minv, axis=0, keepdims=True)  # (1, TC)

    def trajectory(x, lp, grad, n_leapfrog: int):
        """One fixed-length trajectory + MH accept (static trip count)."""
        z, _ = _normal_pair((d, tc))
        p0 = z * inv_sqrt_minv  # p ~ N(0, M)
        k0 = kinetic(p0)

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
        logalpha = (lp_y - kinetic(p1)) - (lp - k0)
        e = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
        accept = e > -logalpha
        mask = jnp.broadcast_to(accept, (d, tc))
        x = jnp.where(mask, y, x)
        lp = jnp.where(accept, lp_y, lp)
        grad = jnp.where(mask, grad_y, grad)
        # accept as f32 (i1 fori-loop carries are fragile in Mosaic).
        return x, lp, grad, accept.astype(jnp.float32)

    @pl.when(g_id == 0)
    def _():
        sx_ref[:] = x_ref[:]
        slp_ref[:] = lp_ref[:]
        sg_ref[:] = g_ref[:]

    x, lp, grad = sx_ref[:], slp_ref[:], sg_ref[:]
    acc = jnp.zeros((1, tc), jnp.float32)
    # Python-unrolled over emissions: each trajectory's trip count is a
    # distinct static constant from the Halton schedule.
    for e in range(E):
        for t in range(thin):
            x, lp, grad, acc = trajectory(x, lp, grad, trips[e * thin + t])
        out_x_ref[pl.ds(e, 1)] = x[None]
        out_lp_ref[pl.ds(e, 1)] = lp[None]
        out_acc_ref[pl.ds(e, 1)] = acc[None]
    sx_ref[:] = x
    slp_ref[:] = lp
    sg_ref[:] = grad


def fused_chees_frozen_sample(
    logdensity_tile_fn: Callable,
    d: int,
    n_samples: int,
    *,
    trips: Sequence[int],
    thin: int = 1,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 1024,
    samples_per_block: int = 16,
):
    """Build the fused frozen-phase ChEES engine.

    ``trips`` is the static per-trajectory leapfrog schedule for one
    emission block (length ``samples_per_block·thin``, from
    :func:`halton_trips`); it repeats across blocks (period-E jitter).
    Returns ``fn(x_T (d, C), lp (1, C), grad (d, C), eps, minv (d, 1),
    seed) -> (samples (n_samples, d, C), lps, accepted)``. ``eps`` may be
    a scalar (shared, the ChEES shape) or per-chain ``(C,)``/``(1, C)``
    (pooled AdaptiveHMC, whose dual averaging is per-chain); both are
    runtime values — only ``trips`` changes recompile (``minv`` too).
    """
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    E = min(samples_per_block, n_samples)
    trips = tuple(int(t) for t in trips)
    if len(trips) != E * thin:
        raise ValueError(
            f"len(trips)={len(trips)} must equal samples_per_block·thin="
            f"{E * thin}"
        )
    if any(t < 1 for t in trips):
        raise ValueError("every trip count must be >= 1")
    n_groups = -(-n_samples // E)
    n_padded = n_groups * E
    kernel = functools.partial(
        _chees_frozen_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        trips=trips,
        thin=int(thin),
        n_groups=n_groups,
    )

    @jax.jit
    def run(x_t, lp, grad, eps, minv, seed):
        c = x_t.shape[1]
        if c % tile_chains != 0:
            raise ValueError(
                f"chains={c} must be a multiple of tile_chains={tile_chains}"
            )
        grid = (c // tile_chains, n_groups)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        eps_arr = jnp.broadcast_to(
            jnp.asarray(eps, jnp.float32).reshape(1, -1), (1, c)
        )
        minv_arr = jnp.asarray(minv, jnp.float32).reshape(d, 1)
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
                whole(minv_arr),
                tin(1),
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
        )(seed_arr, *consts, minv_arr, eps_arr, x_t, lp, grad)
        return samples[:n_samples], lps[:n_samples], accs[:n_samples]

    return run

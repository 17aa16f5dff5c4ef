"""Fused ChEES-HMC engines (Pallas/TPU): warmup + frozen phase.

Both halves of :class:`samplers.chees.ChEESHMC` as VMEM-resident kernels:

- **Warmup** (r4, ``_chees_warmup_kernel``): per-STEP live adaptation —
  dual-averaged ε, Adam on log T, pooled Welford mass — with every
  cross-chain statistic computed exactly over each ≥1024-chain tile
  (tile-local pooling; the launcher merges tiles afterwards). One launch
  for the whole warmup: each kernel launch costs ~24 ms of fixed dispatch
  through the axon tunnel, which dominates any multi-launch scheme.
- **Frozen phase** (``_chees_frozen_kernel``): frozen shared (ε̄, T̄,
  diag M⁻¹), jittered trajectory length per draw.

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
import math
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


def _chees_adapt_step(
    value_and_grad, L, u, carry, *,
    target, t0, kappa, gamma, mu, lr, b1, b2, log_b1, log_b2,
    max_leapfrog, welford, mass_reg, mass_warm_start,
    mask=None, cv=None,
):
    """One ChEES warmup step on a chain tile: jittered trajectory (static
    ``L`` trips), MH accept, then per-step live adaptation — dual-averaged
    ε, Adam on log T (tile-exact acceptance-weighted ChEES gradient), and
    (``welford=True``, i.e. ``adapt_mass``) per-tile pooled Welford mass.
    Carry layout: ``(x, lp, grad, le, leb, hb, lT, lTb, am, av, t, n,
    mean, m2, minv, sum1, sum2, acc_f)``.

    ``mask``/``cv`` (a ``(1, tc)`` 0/1 lane row and its ``(1, 1)`` sum) are
    set on the last tile of a ragged chain count: the launcher edge-pads
    the batch to the tile multiple, and without the mask the cloned lanes
    would enter every pooled reduction with double weight (VERDICT r4 #5).
    Padded lanes still step (their draws are trimmed later) but contribute
    ZERO to the adaptation statistics, and every count divides by ``cv``
    instead of the tile width."""
    (x, lp, grad, le, leb, hb, lT, lTb, am, av, t, n,
     mean, m2, minv, sum1, sum2, acc_f) = carry
    d, tc = x.shape
    C = float(tc)
    # Mosaic can't broadcast (1,1) into (d, TC) in one op ("broadcast in
    # both sublanes and lanes") — and a bare broadcast_to gets folded
    # away. Broadcasting BEFORE the exp materializes ε as a genuine
    # (1, TC) lane row, so every leapfrog op broadcasts along one axis
    # only.
    eps_row = jnp.exp(jnp.broadcast_to(le, (1, tc)))
    half_eps_row = 0.5 * eps_row
    z, _ = _normal_pair((d, tc))
    p0 = z * jax.lax.rsqrt(minv)
    kin0 = 0.5 * jnp.sum(p0 * p0 * minv, axis=0, keepdims=True)

    def lf(_, c):
        x_, p_, lp_, g_ = c
        p_ = p_ + half_eps_row * g_
        x_ = x_ + eps_row * (minv * p_)
        lp_, g_ = value_and_grad(x_)
        p_ = p_ + half_eps_row * g_
        return x_, p_, lp_, g_

    y, p1, lp_y, g_y = jax.lax.fori_loop(0, L, lf, (x, p0, lp, grad))
    logalpha = (
        lp_y - 0.5 * jnp.sum(p1 * p1 * minv, axis=0, keepdims=True)
    ) - (lp - kin0)
    evar = -jnp.log(_uniform_from_bits(pltpu.prng_random_bits((1, tc))))
    accept = evar > -logalpha
    maskd = jnp.broadcast_to(accept, (d, tc))
    x_new = jnp.where(maskd, y, x)
    lp_new = jnp.where(accept, lp_y, lp)
    g_new = jnp.where(maskd, g_y, grad)
    acc_f = accept.astype(jnp.float32)

    # Acceptance probability; non-finite logα (divergence) counts as 0
    # (|nan| < 1e30 and |−inf| < 1e30 are both False — ≙ the XLA engine's
    # isfinite guard, samplers/chees.py).
    w = jnp.where(
        jnp.abs(logalpha) < 1e30,
        jnp.exp(jnp.minimum(logalpha, 0.0)),
        0.0,
    )
    # Healthy mask (≙ samplers/chees.py::_chees_grad): exclude diverged/
    # astronomical endpoints before the centering means.
    healthy = (
        jnp.max(
            jnp.abs(jnp.concatenate([y, p1], axis=0)),
            axis=0, keepdims=True,
        ) < 1e10
    )
    hf = healthy.astype(jnp.float32)
    xh = jnp.where(healthy, x, 0.0)
    yh = jnp.where(healthy, y, 0.0)
    if mask is not None:
        w_r, hf_r, xh, yh = w * mask, hf * mask, xh * mask, yh * mask
        Cn = cv
    else:
        w_r, hf_r, Cn = w, hf, C
    # ---- merged cross-lane reductions, round 1 ----
    cat1 = jnp.concatenate([w_r, hf_r, xh, yh], axis=0)  # (2 + 2d, tc)
    s1 = jnp.sum(cat1, axis=1, keepdims=True)
    w_mean = s1[0:1] / Cn
    cnt = jnp.maximum(s1[1:2], 1.0)
    mean0c = s1[2:2 + d] / cnt
    mean1c = s1[2 + d:2 + 2 * d] / cnt
    # ε: dual averaging on the tile's mean acceptance.
    wgt = 1.0 / (t + t0)
    hb = (1.0 - wgt) * hb + wgt * (target - w_mean)
    le = mu - jnp.sqrt(t) / gamma * hb
    eta = jnp.exp(-kappa * jnp.log(t))  # t^(−κ), no powf
    leb = eta * le + (1.0 - eta) * leb
    # T: Adam ascent on the acceptance-weighted ChEES gradient.
    x0c = x - mean0c
    x1c = y - mean1c
    delta = jnp.sum(x1c * x1c, axis=0, keepdims=True) - jnp.sum(
        x0c * x0c, axis=0, keepdims=True
    )
    dot = jnp.sum(x1c * (p1 * minv), axis=0, keepdims=True)
    contrib = w * delta * dot * hf_r  # hf_r carries the lane mask
    contrib = jnp.where(jnp.abs(contrib) < 1e30, contrib, 0.0)
    x_r = x_new * mask if mask is not None else x_new
    # ---- merged cross-lane reductions, round 2: ChEES gradient pieces +
    # this step's raw position moments ----
    cat2 = jnp.concatenate(
        [contrib, w * hf_r, x_r, x_r * x_r], axis=0
    )  # (2 + 2d, tc)
    s2 = jnp.sum(cat2, axis=1, keepdims=True)
    num = s2[0:1]
    den = jnp.maximum(s2[1:2], 1e-6)
    step_sx = s2[2:2 + d]
    step_sx2 = s2[2 + d:2 + 2 * d]
    sum1 = sum1 + step_sx
    sum2 = sum2 + step_sx2
    traj_len = u * jnp.exp(lT)
    gT = jnp.clip(traj_len * num / den, -1e6, 1e6)
    am = b1 * am + (1.0 - b1) * gT
    av = b2 * av + (1.0 - b2) * gT * gT
    m_hat = am / (1.0 - jnp.exp(t * log_b1))
    v_hat = av / (1.0 - jnp.exp(t * log_b2))
    eps_now = jnp.exp(le)
    lT = lT + lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
    lT = jnp.clip(
        lT,
        jnp.log(eps_now),
        math.log(float(max_leapfrog)) + jnp.log(eps_now),
    )
    lTb = eta * lT + (1.0 - eta) * lTb
    if welford:
        # Per-tile pooled Welford advance from this step's batch moments
        # (Chan–Golub–LeVeque; ≙ samplers/chees.py::_welford_pooled).
        b_mean = step_sx / Cn
        m2_b = step_sx2 - step_sx * step_sx / Cn
        n_new = n + Cn
        dlt = b_mean - mean
        mean = mean + (Cn / n_new) * dlt
        m2 = m2 + m2_b + (n * Cn / n_new) * dlt * dlt
        n = n_new
        var = m2 / jnp.maximum(n - 1.0, 1.0)
        est = (n / (n + mass_reg)) * var + 1e-3 * (
            mass_reg / (n + mass_reg)
        )
        minv = jnp.where(n >= mass_warm_start, est, minv)
    t = t + 1.0
    return (x_new, lp_new, g_new, le, leb, hb, lT, lTb, am, av, t, n,
            mean, m2, minv, sum1, sum2, acc_f)


def _chees_warmup_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    *rest,
    logdensity_tile_fn: Callable,
    n_consts: int,
    trips: Tuple[int, ...],  # static per-group trip schedule, length E
    us: Tuple[float, ...],  # static jitter fractions behind ``trips``
    n_groups: int,
    target: float,
    t0: float,
    kappa: float,
    gamma: float,
    mu: float,
    lr: float,
    b1: float,
    b2: float,
    max_leapfrog: int,
    adapt_mass: bool,
    mass_reg: float,
    mass_warm_start: float,
    valid_chains=None,
):
    """Fused ChEES warmup kernel: E·n_groups adaptation steps per chain
    tile — normally the WHOLE warmup in one launch (every launch costs
    ~24 ms of fixed tunnel dispatch). Every adaptation statistic — mean
    acceptance, ChEES centering means, Welford mass — updates per STEP
    with live values, computed exactly over the tile's chains (tile-local
    pooling; a ≥1024-chain tile gives far lower-variance statistics than
    the ChEES paper's ~100-chain batches). Tiles adapt independently
    within the launch; the launcher combines them afterwards (averaged
    scalars + exact cross-tile Welford merge from the emitted batch
    moments). Only the leapfrog trip counts are static (staged by the
    launcher from the launch-start T/ε ratio, with a consistency re-run
    for pathological inits — the one quantization this design trades for
    fully static control flow). Tile width is VMEM-bound by the DENSITY's
    per-eval intermediates (e.g. an (n_obs, TC) broadcast), not by the
    state: a single-tile variant at C = 16384 on the 30-obs README model
    overflowed the 16 MiB scoped-VMEM limit."""
    const_refs = rest[:n_consts]
    (x_ref, lp_ref, g_ref, sv_ref, minv_ref,
     out_x_ref, out_lp_ref, out_g_ref, out_acc_ref, out_sv_ref,
     out_sum_ref, out_sum2_ref,
     sx, slp, sg, ssv, ssum, ssum2, smean, sm2, sminv) = rest[n_consts:]
    i = pl.program_id(0)
    g_id = pl.program_id(1)
    d, tc = x_ref.shape
    E = len(trips)
    consts = tuple(c[:] for c in const_refs)

    pltpu.prng_seed(seed_ref[0, 0] + i * (n_groups + 1) + g_id)

    def value_and_grad(y):
        lp, pullback = jax.vjp(
            lambda ym: logdensity_tile_fn(ym, *consts), y
        )
        (grad,) = pullback(jnp.ones_like(lp))
        return lp, grad

    @pl.when(g_id == 0)
    def _():
        sx[:] = x_ref[:]
        slp[:] = lp_ref[:]
        sg[:] = g_ref[:]
        ssv[:] = sv_ref[:]
        ssum[:] = jnp.zeros_like(ssum)
        ssum2[:] = jnp.zeros_like(ssum2)
        smean[:] = jnp.zeros_like(smean)
        sm2[:] = jnp.zeros_like(sm2)
        sminv[:] = minv_ref[:]

    x, lp, grad = sx[:], slp[:], sg[:]
    sv = ssv[:]  # (9, 1): le, leb, hb, lT, lTb, adam_m, adam_v, t, n
    le, leb, hb = sv[0:1], sv[1:2], sv[2:3]
    lT, lTb = sv[3:4], sv[4:5]
    am, av = sv[5:6], sv[6:7]
    t, n = sv[7:8], sv[8:9]
    # Live per-tile Welford mass (``adapt_mass``): the in-kernel M⁻¹
    # tracks the tile's own pooled moments per step (seeded from the
    # input M⁻¹ through the warm-start guard); the launcher's boundary
    # combine replaces it with the exact cross-tile global estimate.
    sum1, sum2 = ssum[:], ssum2[:]
    acc_f = jnp.zeros((1, tc), jnp.float32)
    if valid_chains is None:
        mask = cv = None
    else:
        # Ragged chain count (VERDICT r4 #5): zero the edge-padded clone
        # lanes out of every pooled reduction. Only the last tile has any.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1) + i * tc
        mask = (lane < valid_chains).astype(jnp.float32)
        cv = jnp.sum(mask, axis=1, keepdims=True)
    statics = dict(
        mask=mask, cv=cv,
        target=target, t0=t0, kappa=kappa, gamma=gamma, mu=mu, lr=lr,
        b1=b1, b2=b2,
        log_b1=math.log(b1) if b1 > 0.0 else -1e30,
        log_b2=math.log(b2) if b2 > 0.0 else -1e30,
        max_leapfrog=max_leapfrog, welford=bool(adapt_mass),
        mass_reg=mass_reg, mass_warm_start=mass_warm_start,
    )
    carry = (x, lp, grad, le, leb, hb, lT, lTb, am, av, t, n,
             smean[:], sm2[:], sminv[:], sum1, sum2, acc_f)
    for e in range(E):
        carry = _chees_adapt_step(
            value_and_grad, trips[e], us[e], carry, **statics
        )
    (x, lp, grad, le, leb, hb, lT, lTb, am, av, t, n,
     mean_w, m2_w, minv, sum1, sum2, acc_f) = carry

    def store_sv(ref):
        ref[pl.ds(0, 1)] = le
        ref[pl.ds(1, 1)] = leb
        ref[pl.ds(2, 1)] = hb
        ref[pl.ds(3, 1)] = lT
        ref[pl.ds(4, 1)] = lTb
        ref[pl.ds(5, 1)] = am
        ref[pl.ds(6, 1)] = av
        ref[pl.ds(7, 1)] = t
        ref[pl.ds(8, 1)] = n

    sx[:] = x
    slp[:] = lp
    sg[:] = grad
    store_sv(ssv)
    ssum[:] = sum1
    ssum2[:] = sum2
    smean[:] = mean_w
    sm2[:] = m2_w
    sminv[:] = minv

    @pl.when(g_id == n_groups - 1)
    def _():
        out_x_ref[:] = x
        out_lp_ref[:] = lp
        out_g_ref[:] = grad
        out_acc_ref[:] = acc_f
        # Per-tile stat blocks must be 128 lanes wide (Pallas TPU block
        # constraint) — each value is replicated across its tile's lane
        # block; the launcher reads column 0 of each.
        out_sv_ref[pl.ds(0, 1)] = jnp.broadcast_to(le, (1, 128))
        out_sv_ref[pl.ds(1, 1)] = jnp.broadcast_to(leb, (1, 128))
        out_sv_ref[pl.ds(2, 1)] = jnp.broadcast_to(hb, (1, 128))
        out_sv_ref[pl.ds(3, 1)] = jnp.broadcast_to(lT, (1, 128))
        out_sv_ref[pl.ds(4, 1)] = jnp.broadcast_to(lTb, (1, 128))
        out_sv_ref[pl.ds(5, 1)] = jnp.broadcast_to(am, (1, 128))
        out_sv_ref[pl.ds(6, 1)] = jnp.broadcast_to(av, (1, 128))
        out_sv_ref[pl.ds(7, 1)] = jnp.broadcast_to(t, (1, 128))
        out_sv_ref[pl.ds(8, 1)] = jnp.broadcast_to(n, (1, 128))
        out_sum_ref[:] = jnp.broadcast_to(sum1, (sum1.shape[0], 128))
        out_sum2_ref[:] = jnp.broadcast_to(sum2, (sum2.shape[0], 128))


def fused_chees_warmup_block(
    logdensity_tile_fn: Callable,
    d: int,
    *,
    trips: Sequence[int],
    us: Sequence[float],
    n_groups: int,
    target_accept: float,
    t0: float,
    kappa: float,
    gamma: float,
    mu: float,
    learning_rate: float,
    adam_b1: float,
    adam_b2: float,
    max_leapfrog: int,
    adapt_mass: bool,
    mass_regularization: float,
    mass_warm_start: int,
    consts: Tuple[jax.Array, ...] = (),
    tile_chains: int = 2048,
    valid_chains=None,
):
    """Build one fused ChEES warmup launch (``len(trips)·n_groups`` steps
    per chain tile — normally the whole warmup).

    ``valid_chains`` (static, default None = all lanes real) marks a
    ragged batch: lanes with global index ≥ ``valid_chains`` are
    edge-padding clones and are masked out of every pooled adaptation
    statistic (their draws still step and are trimmed by the launcher).

    Call as ``run(x_T (d, C), lp (1, C), grad (d, C), sv (9, 1),
    minv (d, 1), seed)`` where ``sv`` packs the shared adaptation scalars
    ``[log_eps, log_eps_bar, h_bar, log_T, log_T_bar, adam_m, adam_v, t,
    n]`` and ``minv`` seeds the in-kernel per-tile Welford mass through
    the warm-start guard. Returns ``(x, lp, grad, acc,
    sv_tiles (9, n_tiles·128), sum_x (d, n_tiles·128), sum_x2
    (d, n_tiles·128))`` — per-TILE adapted scalars and raw batch position
    moments (each tile's values replicated over its 128-lane stat block;
    read every 128th column), which the launcher combines across tiles
    (averaged scalars + exact Welford merge).

    Kernel variants are keyed by ``(trips, us, n_groups)`` — the launcher
    quantizes launch-start T/ε into the static schedule, so only genuinely
    new ratios recompile (≙ the frozen kernel's R keying)."""
    consts = tuple(
        jnp.asarray(c, jnp.float32).reshape(-1, 1) if jnp.ndim(c) < 2 else
        jnp.asarray(c, jnp.float32)
        for c in consts
    )
    trips = tuple(int(v) for v in trips)
    us = tuple(float(v) for v in us)
    if len(trips) != len(us):
        raise ValueError("trips and us must be the same length")
    if any(v < 1 for v in trips):
        raise ValueError("every trip count must be >= 1")
    kernel = functools.partial(
        _chees_warmup_kernel,
        logdensity_tile_fn=logdensity_tile_fn,
        n_consts=len(consts),
        trips=trips,
        us=us,
        n_groups=int(n_groups),
        target=float(target_accept),
        t0=float(t0),
        kappa=float(kappa),
        gamma=float(gamma),
        mu=float(mu),
        lr=float(learning_rate),
        b1=float(adam_b1),
        b2=float(adam_b2),
        max_leapfrog=int(max_leapfrog),
        adapt_mass=bool(adapt_mass),
        mass_reg=float(mass_regularization),
        mass_warm_start=float(mass_warm_start),
        valid_chains=(
            None if valid_chains is None else int(valid_chains)
        ),
    )

    @jax.jit
    def run(x_t, lp, grad, sv, minv, seed):
        c = x_t.shape[1]
        if c % tile_chains != 0:
            raise ValueError(
                f"chains={c} must be a multiple of tile_chains={tile_chains}"
            )
        n_tiles = c // tile_chains
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        whole = lambda arr: pl.BlockSpec(
            arr.shape, lambda i, g: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        )
        tin = lambda rows: pl.BlockSpec(
            (rows, tile_chains), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        per_tile = lambda rows: pl.BlockSpec(
            (rows, 128), lambda i, g: (0, i), memory_space=pltpu.VMEM
        )
        small = (
            jnp.asarray(sv, jnp.float32).reshape(9, 1),
            jnp.asarray(minv, jnp.float32).reshape(d, 1),
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles, int(n_groups)),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[whole(cst) for cst in consts],
                tin(d),
                tin(1),
                tin(d),
                *[whole(a) for a in small],
            ],
            out_specs=[
                tin(d), tin(1), tin(d), tin(1),
                per_tile(9), per_tile(d), per_tile(d),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((d, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((d, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((9, n_tiles * 128), jnp.float32),
                jax.ShapeDtypeStruct((d, n_tiles * 128), jnp.float32),
                jax.ShapeDtypeStruct((d, n_tiles * 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((1, tile_chains), jnp.float32),
                pltpu.VMEM((d, tile_chains), jnp.float32),
                pltpu.VMEM((9, 1), jnp.float32),
                pltpu.VMEM((d, 1), jnp.float32),
                pltpu.VMEM((d, 1), jnp.float32),
                pltpu.VMEM((d, 1), jnp.float32),
                pltpu.VMEM((d, 1), jnp.float32),
                pltpu.VMEM((d, 1), jnp.float32),
            ],
        )(seed_arr, *consts, x_t, lp, grad, *small)
        return outs

    return run


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

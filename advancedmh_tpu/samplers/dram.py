"""DRAM: Delayed Rejection + Adaptive Metropolis (Haario et al. 2006).

Beyond-parity sampler — the named composition of this framework's
:class:`DelayedRejection` (samplers/dr.py) and the covariance-learning
machinery of :class:`AdaptiveMetropolis` (samplers/am.py): both proposal
stages use the *running empirical covariance* of the chain, the second
scaled down by ``gamma``:

    stage 1:  y₁ = x + (s/√d)·L_n z₁          s = opt_scale (2.38)
    stage 2:  y₂ = x + γ(s/√d)·L_n z₂          γ = gamma    (0.2)

with the Mira (2001) stage-2 acceptance. Because the two stages share the
same L_n, the q₁ cross-density distance collapses into **z-space** — no
triangular solve in the hot loop:

    log q₁(y₁|y₂) − log q₁(y₁|x) = −½(‖z₁ − γz₂‖² − ‖z₁‖²)

Adaptation is the exact Welford rank-1 Cholesky recurrence of AM
(ops/cholesky.py), fed every chain state and diminishing as 1/n — the
Haario-2006 ergodicity argument. L is seeded with C₀ = (fixed_scale²/d)·I
as one pseudo-observation, so early proposals are the classic
pre-adaptation Gaussian and the seed washes out as 1/n.

DR gives AM exactly what it lacks at startup: while L is still wrong, the
bold stage fails but the timid γ-stage keeps the chain moving, so the
covariance estimate keeps improving instead of stalling (the motivation in
Haario et al. 2006, §1).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.density import as_model, logdensity, logdensity_batched
from ..utils import KeyArray
from .am import AdaptiveMetropolis, AdaptiveMetropolisState
from .base import Sampler, Transition
from .dr import _log1m_exp


@dataclasses.dataclass(frozen=True)
class DRAM(Sampler):
    """``DRAM(opt_scale=2.38, gamma=0.2, fixed_scale=0.1)``.

    ``opt_scale`` is the Roberts-Rosenthal stage-1 multiplier (applied as
    ``opt_scale/√d`` on the covariance factor), ``gamma`` the stage-2
    shrink, ``fixed_scale`` the C₀ seed scale (≙ AdaptiveMetropolis).
    """

    opt_scale: float = 2.38
    gamma: float = 0.2
    fixed_scale: float = 0.1
    # Cross-chain pooled covariance (see AdaptiveMetropolis.pooled).
    pooled: bool = False

    def __post_init__(self):
        if not 0.0 < self.gamma < 1.0:
            raise ValueError(
                f"gamma must be in (0, 1) — a *timid* second stage; got "
                f"{self.gamma}"
            )

    # AM's state/init/adaptation are reused verbatim (same pytree → the
    # chunked/checkpoint runtime treats DRAM states like AM states).
    def _am(self) -> AdaptiveMetropolis:
        return AdaptiveMetropolis(
            beta=0.0, fixed_scale=self.fixed_scale,
            opt_scale=self.opt_scale, pooled=self.pooled,
        )

    def transition_of(self, state: AdaptiveMetropolisState) -> Transition:
        return Transition(state.x, state.logprob, state.isaccept)

    def init(
        self, key: KeyArray, model, initial_params: Optional[Any] = None
    ) -> Tuple[Transition, AdaptiveMetropolisState]:
        return self._am().init(key, model, initial_params)

    def _step(self, key, state, model, batch_shape, lp_fn):
        bn = len(batch_shape)
        key_z1, key_a1, key_z2, key_a2 = jax.random.split(key, 4)
        x, lp0 = state.x, state.logprob
        d = x.shape[-1]
        s = self.opt_scale / math.sqrt(d)
        g = self.gamma

        Lz = lambda z: jnp.einsum("...ij,...j->...i", state.L, z)
        z1 = jax.random.normal(key_z1, x.shape, x.dtype)
        z2 = jax.random.normal(key_z2, x.shape, x.dtype)

        # Stage 1: bold adapted Gaussian (symmetric → α₁ = Δlp).
        y1 = x + s * Lz(z1)
        lp1 = lp_fn(y1)
        la1 = lp1 - lp0
        acc1 = -jax.random.exponential(key_a1, batch_shape) < la1

        # Stage 2: same covariance shrunk by γ, evaluated unconditionally.
        y2 = x + (g * s) * Lz(z2)
        lp2 = lp_fn(y2)
        la1_rev = lp1 - lp2
        # Shared-L cross term in z-space (module docstring).
        dz = z1 - g * z2
        dq = -0.5 * (
            jnp.sum(dz * dz, axis=-1) - jnp.sum(z1 * z1, axis=-1)
        )
        la2 = lp2 - lp0 + dq + _log1m_exp(la1_rev) - _log1m_exp(la1)
        acc2 = (-jax.random.exponential(key_a2, batch_shape) < la2) & ~acc1

        m1, m2 = acc1[..., None], acc2[..., None]
        x_new = jnp.where(m1, y1, jnp.where(m2, y2, x))
        lp_new = jnp.where(acc1, lp1, jnp.where(acc2, lp2, lp0))

        mean_new, L_new, it_new = self._am()._advance_moments(
            state, x_new, bn > 0
        )
        state_new = AdaptiveMetropolisState(
            x=x_new,
            logprob=lp_new,
            mean=mean_new,
            L=L_new,
            iteration=it_new,
            isaccept=acc1 | acc2,
        )
        return self.transition_of(state_new), state_new

    def step(
        self, key: KeyArray, state: AdaptiveMetropolisState, model
    ) -> Tuple[Transition, AdaptiveMetropolisState]:
        model = as_model(model)
        return self._step(
            key, state, model, (), lambda p: logdensity(model, p)
        )

    def step_batched(
        self, key: KeyArray, state: AdaptiveMetropolisState, model,
        batch_shape: Tuple[int, ...],
    ) -> Tuple[Transition, AdaptiveMetropolisState]:
        model = as_model(model)
        return self._step(
            key, state, model, batch_shape,
            lambda p: logdensity_batched(model, p),
        )

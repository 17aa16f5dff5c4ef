"""Marginal-likelihood (evidence) estimation via power posteriors.

Beyond-parity subsystem (the reference has no evidence machinery; it is the
natural companion to the tempering stack, samplers/tempering.py). The
power-posterior family tempers the **likelihood only** (Friel-Pettitt 2008):

    π_β(x) ∝ p(x) · L(x)^β,     Z(0) = 1 (proper prior),  Z(1) = evidence

and two estimators are computed from the same ladder run:

- **Thermodynamic integration** (path sampling):
  log Z = ∫₀¹ E_β[log L] dβ, trapezoid over the rungs.
- **Stepping-stone** (Xie et al. 2011):
  log Z = Σ_k log E_{β_k}[ L^{β_{k+1}−β_k} ], each expectation a logsumexp
  over that rung's draws — consistent even with a coarse ladder (TI's
  discretization bias is one-sided; SS is the recommended estimator).

TPU formulation: the whole ladder runs as ONE flat chain batch — rung k
contributes ``num_chains`` chains whose density closes over a per-chain β
vector, so K rungs × C chains is a single ``step_batched`` under one
``lax.scan`` (no Python loop over rungs, no replica swaps needed: rungs are
independent targets here, and the β-ladder's mixing aid is irrelevant
because every rung starts from the prior and burns in independently).

The default ladder β_k = (k/(K−1))^5 concentrates rungs near β=0 where
E_β[log L] changes fastest (the Xie/Friel recommendation).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import Distribution, MvNormal
from ..models.density import DensityModel
from ..samplers.base import Transition
from ..samplers.mh import RWMH
from ..utils import KeyArray, as_key


def power_ladder(n_rungs: int = 16, c: float = 5.0):
    """β_k = (k/(K−1))^c, k = 0..K−1 — rungs concentrated near the prior."""
    return tuple((k / (n_rungs - 1.0)) ** c for k in range(n_rungs))


def log_evidence(
    loglik_fn: Callable[[Any], jax.Array],
    prior,
    n_samples: int,
    *,
    key: KeyArray,
    betas: Optional[Sequence[float]] = None,
    num_chains: int = 64,
    proposal_scale: Any = 0.5,
    discard_initial: Optional[int] = None,
    d: Optional[int] = None,
) -> Dict[str, Any]:
    """Estimate log Z = log ∫ p(x) L(x) dx.

    ``loglik_fn`` — log-likelihood over a flat (d,) params vector;
    ``prior`` — a :class:`Distribution` with ``sample`` and ``log_prob``
    over the same vector (the proper prior p). Each ladder rung runs
    ``num_chains`` RWMH chains (scale ``proposal_scale``) on
    p(x)·L(x)^{β_k}; every chain starts at a prior draw and burns
    ``discard_initial`` steps (default ``n_samples``).

    Returns a dict with ``log_z_ss`` (stepping-stone — use this),
    ``log_z_ti`` (thermodynamic integration, trapezoid), the ladder
    ``betas``, per-rung ``mean_loglik``, and per-rung ``acceptance``.
    """
    if betas is None:
        betas = power_ladder()
    betas_t = tuple(float(b) for b in betas)
    if betas_t != tuple(sorted(betas_t)) or betas_t[0] != 0.0 or betas_t[-1] != 1.0:
        raise ValueError(
            "betas must ascend from 0.0 (prior) to 1.0 (posterior); "
            "use power_ladder() for the default schedule."
        )
    if not isinstance(prior, Distribution):
        raise TypeError(
            "prior must be a Distribution (needs .sample and .log_prob); "
            "got " + type(prior).__name__
        )
    K = len(betas_t)
    C = num_chains
    B = K * C
    burn = n_samples if discard_initial is None else int(discard_initial)
    master = as_key(key)
    key_init, key_run = jax.random.split(master)

    # flat (B,) β vector: rung k occupies chains [k*C, (k+1)*C)
    beta_vec = jnp.repeat(jnp.asarray(betas_t, jnp.float32), C)

    loglik_b = jax.vmap(loglik_fn)

    def _prior_lp(xs):
        lp = prior.log_prob(xs)
        # sum event dims if log_prob is elementwise over the vector
        if lp.ndim == xs.ndim:
            lp = jnp.sum(lp, axis=-1)
        return lp

    def density_batched(xs):  # (B, d) -> (B,)
        return _prior_lp(xs) + beta_vec * loglik_b(xs)

    x0 = prior.sample(key_init, (B,))
    if d is None:
        d = int(np.prod(x0.shape[1:])) if x0.ndim > 1 else 1
    if x0.ndim == 1:
        x0 = x0[:, None]
    model = DensityModel(
        lambda x: _prior_lp(x) + loglik_fn(x),  # unused by the batched path
        dimension=d,
        logdensity_batched_fn=density_batched,
    )
    spl = RWMH(MvNormal(jnp.zeros(d), scale=jnp.asarray(proposal_scale)))

    lp0 = density_batched(x0)
    state = Transition(x0, lp0, jnp.zeros((B,), bool))

    @jax.jit
    def run(state):
        def body(s, j):
            _, s = spl.step_batched(
                jax.random.fold_in(key_run, j), s, model, (B,)
            )
            return s, None

        s, _ = jax.lax.scan(body, state, jnp.arange(burn))

        def body2(s, j):
            _, s = spl.step_batched(
                jax.random.fold_in(key_run, burn + j), s, model, (B,)
            )
            return s, (loglik_b(s.params), s.accepted)

        s, (lls, accs) = jax.lax.scan(
            body2, s, jnp.arange(n_samples)
        )
        return lls, accs  # (N, B)

    lls, accs = run(state)
    lls = lls.reshape(n_samples, K, C)
    acc = accs.reshape(n_samples, K, C).mean(axis=(0, 2))  # (K,)

    betas_arr = jnp.asarray(betas_t)
    mean_ll = jnp.mean(lls, axis=(0, 2))  # (K,) E_β[log L]
    # TI: trapezoid over the ladder
    log_z_ti = jnp.sum(
        0.5 * (mean_ll[1:] + mean_ll[:-1]) * (betas_arr[1:] - betas_arr[:-1])
    )
    # Stepping-stone: Σ_k logmeanexp((β_{k+1}−β_k)·ℓ_k) over rung-k draws
    db = (betas_arr[1:] - betas_arr[:-1]).reshape(-1, 1)  # (K-1, 1)
    rung_draws = lls[:, :-1, :].transpose(1, 0, 2).reshape(K - 1, -1)
    log_z_ss = jnp.sum(
        jax.scipy.special.logsumexp(db * rung_draws, axis=1)
        - jnp.log(rung_draws.shape[1])
    )
    return {
        "log_z_ss": float(log_z_ss),
        "log_z_ti": float(log_z_ti),
        "betas": betas_t,
        "mean_loglik": np.asarray(mean_ll),
        "acceptance": np.asarray(acc),
    }

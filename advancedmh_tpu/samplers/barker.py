"""Barker proposal MCMC (Livingstone & Zanella 2022, JRSS-B "The Barker
proposal: combining robustness and efficiency in gradient-based MCMC").

Beyond-parity sampler (no reference equivalent; it completes the
gradient-based family next to :class:`MALA`). Per coordinate the proposal
draws z ~ N(0, σ²) and applies it with gradient-informed sign:

    b = +1 with probability σ(z·∂ᵢ log π(x)),  −1 otherwise;   y = x + b·z

(σ(t) the logistic function), i.e. the proposal density is
q(y|x) ∝ N(y−x; 0, σ²)·σ((y−x)·∂ᵢ log π(x)). Unlike MALA's drift — which
grows linearly in the gradient and blows up when σ is even modestly too
large — the Barker skew is bounded, so the sampler inherits random-walk
robustness while keeping gradient-guided efficiency (the paper's headline
property; scaling exponent matches MALA's d^{-1/3} regime up to a ~1.7×
constant).

Acceptance (coordinatewise softplus form, exact):

    log α = Δlog π + Σᵢ [ softplus(−δᵢ·gᵢ(x)) − softplus(δᵢ·gᵢ(y)) ],

δ = y − x, from log σ(t) = −softplus(−t) applied to the forward/backward
proposal products. The gradient is cached in :class:`GradientTransition`
so each step costs exactly one fused value+gradient evaluation, the same
contract as MALA (≙ src/MALA.jl:73-75 for the caching pattern).

Params may be any pytree: every operation is elementwise, per-leaf keys
avoid cross-leaf noise correlation, and the Hastings sum reduces over all
leaf elements.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.density import as_model, check_capabilities, logdensity_and_gradient
from ..utils import KeyArray
from .base import GradientTransition, Sampler, accept_reject, select_tree


def _tree_randoms(key, tree, draw):
    """One independent draw per leaf, shaped like the leaf (batched state
    leaves already carry the chain axes, so this covers both modes)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return treedef.unflatten(
        [draw(k, jnp.shape(l)) for k, l in zip(keys, leaves)]
    )


@dataclasses.dataclass(frozen=True)
class Barker(Sampler):
    """``Barker(step_size)``: σ is the per-coordinate proposal scale.

    The optimal acceptance rate is ≈ 0.57 (Vogrinc-Livingstone-Zanella 2022),
    between RWMH's 0.234 and MALA's 0.574 regime — tune σ toward that.
    """

    step_size: float = 1.0

    def init(
        self, key: KeyArray, model, initial_params: Optional[Any] = None
    ) -> Tuple[GradientTransition, GradientTransition]:
        """Like MALA (≙ src/MALA.jl:37): requires initial parameters and an
        order-1-capable model."""
        if initial_params is None:
            raise ValueError("please specify initial parameters")
        model = as_model(model)
        check_capabilities(model)
        lp, grad = logdensity_and_gradient(model, initial_params)
        t = GradientTransition(
            initial_params, lp, grad, jnp.zeros((), dtype=bool)
        )
        return t, t

    # -- shared core ----------------------------------------------------------

    def _propose(self, key, params, gradient):
        """Gradient-skewed increments δ (per-leaf pytree)."""
        key_z, key_b = jax.random.split(key)
        z = jax.tree_util.tree_map(
            lambda e: self.step_size * e,
            _tree_randoms(key_z, params, jax.random.normal),
        )
        u = _tree_randoms(key_b, params, jax.random.uniform)
        return jax.tree_util.tree_map(
            lambda zl, ul, gl: jnp.where(
                ul < jax.nn.sigmoid(zl * gl), zl, -zl
            ),
            z, u, gradient,
        )

    @staticmethod
    def _logratio(delta, grad_x, grad_y, batch_ndim=0):
        """Σ softplus(−δ·g(x)) − softplus(δ·g(y)) over all leaf elements."""
        def leaf(d, gx, gy):
            t = jax.nn.softplus(-d * gx) - jax.nn.softplus(d * gy)
            return jnp.sum(t.reshape(t.shape[:batch_ndim] + (-1,)), axis=-1)

        terms = jax.tree_util.tree_map(leaf, delta, grad_x, grad_y)
        return sum(jax.tree_util.tree_leaves(terms))

    def step(
        self, key: KeyArray, state: GradientTransition, model
    ) -> Tuple[GradientTransition, GradientTransition]:
        model = as_model(model)
        key_prop, key_acc = jax.random.split(key)
        delta = self._propose(key_prop, state.params, state.gradient)
        candidate = jax.tree_util.tree_map(
            jnp.add, state.params, delta
        )
        lp_candidate, grad_candidate = logdensity_and_gradient(model, candidate)
        logratio = self._logratio(delta, state.gradient, grad_candidate)
        logalpha = lp_candidate - state.lp + logratio
        accepted = accept_reject(key_acc, logalpha)
        params = select_tree(accepted, candidate, state.params)
        lp = jnp.where(accepted, lp_candidate, state.lp)
        gradient = select_tree(accepted, grad_candidate, state.gradient)
        t = GradientTransition(params, lp, gradient, accepted)
        return t, t

    def step_batched(
        self, key: KeyArray, state: GradientTransition, model,
        batch_shape: Tuple[int, ...],
    ) -> Tuple[GradientTransition, GradientTransition]:
        """Vectorized step: batched RNG, one vmapped value+gradient pass."""
        model = as_model(model)
        key_prop, key_acc = jax.random.split(key)
        bn = len(batch_shape)
        delta = self._propose(key_prop, state.params, state.gradient)
        candidate = jax.tree_util.tree_map(jnp.add, state.params, delta)
        if model.logdensity_and_gradient_fn is not None:
            lp_candidate, grad_candidate = jax.vmap(
                model.logdensity_and_gradient_fn
            )(candidate)
        else:
            lp_candidate, grad_candidate = jax.vmap(
                jax.value_and_grad(model.logdensity_fn)
            )(candidate)
        logratio = self._logratio(
            delta, state.gradient, grad_candidate, batch_ndim=bn
        )
        logalpha = lp_candidate - state.lp + logratio
        accepted = -jax.random.exponential(key_acc, batch_shape) < logalpha

        def sel(c, p):
            mask = accepted.reshape(batch_shape + (1,) * (c.ndim - bn))
            return jnp.where(mask, c, p)

        params = jax.tree_util.tree_map(sel, candidate, state.params)
        lp = jnp.where(accepted, lp_candidate, state.lp)
        gradient = jax.tree_util.tree_map(sel, grad_candidate, state.gradient)
        t = GradientTransition(params, lp, gradient, accepted)
        return t, t

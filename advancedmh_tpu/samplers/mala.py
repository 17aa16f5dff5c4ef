"""Metropolis-adjusted Langevin algorithm (≙ reference src/MALA.jl).

The proposal is a *function of the gradient* at the current state, e.g.::

    MALA(lambda g: MvNormal(0.5 * sigma2 * g, scale=jnp.sqrt(sigma2)))

≙ the reference's ``MALA(g -> MvNormal(σ²/2 .* g, σ²*I))``. Gradients come
from ``jax.value_and_grad`` (the built-in ≙ of the ForwardDiff extension) or
from a model-provided ``logdensity_and_gradient_fn`` (≙ LogDensityProblems
order-1 models). The gradient is cached in the transition so each step costs
exactly one fused value+gradient evaluation (≙ src/MALA.jl:73-75).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.density import as_model, check_capabilities, logdensity_and_gradient
from ..proposals import RandomWalkProposal, is_proposal, propose, q
from ..proposals.core import _resolve
from ..utils import KeyArray
from .base import GradientTransition, Sampler, accept_reject, select_tree


def _resolve_tree(proposal_tree, conditioner):
    """Resolve every functional leaf against the matching ``conditioner`` leaf
    (for MALA the conditioner is the *gradient*, ≙ src/MALA.jl:70)."""
    leaves, treedef = jax.tree_util.tree_flatten(proposal_tree, is_leaf=is_proposal)
    c_leaves = treedef.flatten_up_to(conditioner)
    return treedef.unflatten([_resolve(p, c) for p, c in zip(leaves, c_leaves)])


@dataclasses.dataclass(frozen=True)
class MALA(Sampler):
    """≙ ``MALA(d)`` (src/MALA.jl:1-11): a bare callable or distribution is
    wrapped in a ``RandomWalkProposal``; a ``RandomWalkProposal`` is used
    as-is."""

    proposal: Any

    def __post_init__(self):
        p = self.proposal
        leaves = jax.tree_util.tree_leaves(p, is_leaf=is_proposal)
        if not any(is_proposal(leaf) for leaf in leaves):
            object.__setattr__(self, "proposal", RandomWalkProposal(p))

    @staticmethod
    def langevin(step_size_sq: float) -> "MALA":
        """Canonical Langevin proposal ``MvNormal(σ²/2·g, σ²·I)`` (≙ the
        reference's standard usage). Records the step size so the fused
        Pallas engine (``sample(engine='fused')``) can run it."""
        from ..distributions import MvNormal

        s2 = float(step_size_sq)
        spl = MALA(
            lambda g: MvNormal(0.5 * s2 * g, scale=jnp.sqrt(jnp.float32(s2)))
        )
        object.__setattr__(spl, "langevin_step_size_sq", s2)
        return spl

    def init(
        self, key: KeyArray, model, initial_params: Optional[Any] = None
    ) -> Tuple[GradientTransition, GradientTransition]:
        """≙ src/MALA.jl:37: MALA *requires* initial parameters."""
        if initial_params is None:
            raise ValueError("please specify initial parameters")
        model = as_model(model)
        check_capabilities(model)
        lp, grad = logdensity_and_gradient(model, initial_params)
        t = GradientTransition(initial_params, lp, grad, jnp.zeros((), dtype=bool))
        return t, t

    def step(
        self, key: KeyArray, state: GradientTransition, model
    ) -> Tuple[GradientTransition, GradientTransition]:
        """≙ src/MALA.jl:54-93."""
        model = as_model(model)
        key_prop, key_acc = jax.random.split(key)

        # Forward proposal resolved at the current gradient (src/MALA.jl:70).
        prop_state = _resolve_tree(self.proposal, state.gradient)
        candidate = propose(key_prop, prop_state, state.params)

        # One fused value+gradient evaluation (src/MALA.jl:73-75).
        lp_candidate, grad_candidate = logdensity_and_gradient(model, candidate)

        # Asymmetric Hastings correction with gradient-dependent forward and
        # backward densities (src/MALA.jl:78-80).
        prop_candidate = _resolve_tree(self.proposal, grad_candidate)
        logratio = q(prop_candidate, state.params, candidate) - q(
            prop_state, candidate, state.params
        )

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
        """Vectorized MALA step (batched RNG; gradients via a single vmapped
        value-and-gradient pass over the chain batch)."""
        model = as_model(model)
        key_prop, key_acc = jax.random.split(key)
        bn = len(batch_shape)

        prop_state = _resolve_tree(self.proposal, state.gradient)
        # Functional leaves resolve against the *batched gradient* — their
        # payload params then carry the batch, so propose() draws un-shaped.
        candidate = propose(
            key_prop, self.proposal, state.params, batch_shape,
            conditioner=state.gradient,
        )

        if model.logdensity_and_gradient_fn is not None:
            lp_candidate, grad_candidate = jax.vmap(
                model.logdensity_and_gradient_fn
            )(candidate)
        else:
            lp_candidate, grad_candidate = jax.vmap(
                jax.value_and_grad(model.logdensity_fn)
            )(candidate)

        prop_candidate = _resolve_tree(self.proposal, grad_candidate)
        logratio = q(prop_candidate, state.params, candidate, batch_ndim=bn) - q(
            prop_state, candidate, state.params, batch_ndim=bn
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

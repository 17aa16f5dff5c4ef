"""Custom-sampler extensibility (≙ subtyping MHSampler + AbstractMCMC.step
in the reference, src/AdvancedMH.jl:33): a user-defined sampler written
against the public Sampler protocol composes with the full runtime — vmap
chain batching, schedules, Chains bundling — with no framework changes.

The example sampler is preconditioned Crank-Nicolson (pCN): proposal
x' = √(1−β²)·x + β·z with z ~ N(0, I), which is reversible w.r.t. a
standard-normal prior, so the accept ratio is the *likelihood* difference
only. Executable twin of the docs/api.md "Writing your own sampler" block.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import DensityModel, Normal, sample
from advancedmh_tpu.samplers.base import Sampler, Transition, accept_reject


@dataclasses.dataclass(frozen=True)
class PCN(Sampler):
    beta: float = 0.2

    def init(self, key, model, initial_params=None):
        x = (
            initial_params
            if initial_params is not None
            else {
                "a": jax.random.normal(jax.random.fold_in(key, 0), ()),
                "b": jax.random.normal(jax.random.fold_in(key, 1), ()),
            }
        )
        t = Transition(x, model.logdensity_fn(x), jnp.zeros((), bool))
        return t, t

    def step(self, key, state, model):
        k1, k2 = jax.random.split(key)
        # one key per leaf — reusing k1 across equal-shaped leaves would give
        # bit-identical noise and collapse proposals onto a diagonal subspace
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        z = jax.tree_util.tree_unflatten(
            treedef,
            [
                jax.random.normal(k, jnp.shape(l))
                for k, l in zip(jax.random.split(k1, len(leaves)), leaves)
            ],
        )
        rho = jnp.sqrt(1.0 - self.beta**2)
        cand = jax.tree_util.tree_map(
            lambda x, e: rho * x + self.beta * e, state.params, z
        )
        lp = model.logdensity_fn(cand)  # likelihood only (prior is implicit)
        acc = accept_reject(k2, lp - state.lp)
        params = jax.tree_util.tree_map(
            lambda c, p: jnp.where(acc, c, p), cand, state.params
        )
        t = Transition(params, jnp.where(acc, lp, state.lp), acc)
        return t, t


def test_pcn_composes_with_runtime():
    # Target: prior N(0, I) × likelihood a ~ N(1, 0.5²), b ~ N(−1, 0.5²)
    # → posterior mean = μ_l/(σ_l² + 1) = ±0.8, var = 0.2. Params are a
    # two-leaf dict on purpose: equal-shaped leaves expose any per-leaf key
    # reuse in the proposal (identical noise → spuriously correlated draws).
    def loglik(x):
        return Normal(1.0, 0.5).log_prob(x["a"]) + Normal(-1.0, 0.5).log_prob(
            x["b"]
        )

    model = DensityModel(loglik)
    res = sample(
        model, PCN(beta=0.3), 4000, key=0, num_chains=64, discard_initial=500,
    )
    acc = float(np.asarray(res.transitions.accepted).mean())
    assert 0.05 < acc < 0.95  # the sampler genuinely accepts AND rejects
    chains = res.to_chains(param_names=["a", "b"])
    assert chains.n_chains == 64 and chains.n_samples == 4000
    post_mean = np.asarray([float(chains["a"].mean()), float(chains["b"].mean())])
    np.testing.assert_allclose(post_mean, [0.8, -0.8], atol=0.05)
    post_var = float(chains["a"].std()) ** 2
    assert abs(post_var - 0.2) < 0.05
    # the two coordinates are independent in the posterior: key reuse across
    # leaves would make their increments identical and corr → 1
    a = np.asarray(chains["a"]).ravel()
    b = np.asarray(chains["b"]).ravel()
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.1
    s = chains.summary()
    assert s["a"]["ess"] > 1000 and 0.9 < s["a"]["rhat"] < 1.1

"""Preconditioned Crank-Nicolson tests.

Beyond-parity sampler (samplers/pcn.py). The pCN-specific property under
test: β-mixing is dimension-independent — the same β keeps a healthy
acceptance rate at d=2 and d=64, where a random walk of fixed scale
collapses (Cotter et al. 2013, the function-space argument).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    DensityModel,
    MvNormal,
    Normal,
    PreconditionedCrankNicolson,
    sample,
)


class TestPosterior:
    def test_conjugate_posterior(self):
        """Prior N(0,1) × likelihood N(1, 0.5²) per leaf → posterior mean
        0.8, var 0.2 (the custom-sampler demo target, now first-class)."""
        def loglik(x):
            return (Normal(1.0, 0.5).log_prob(x["a"])
                    + Normal(-1.0, 0.5).log_prob(x["b"]))

        model = DensityModel(loglik)
        spl = PreconditionedCrankNicolson(
            {"a": Normal(0.0, 1.0), "b": Normal(0.0, 1.0)}, beta=0.3
        )
        res = sample(model, spl, 4000, key=0, num_chains=64,
                     discard_initial=500)
        a = np.asarray(res.transitions.params["a"]).ravel()
        b = np.asarray(res.transitions.params["b"]).ravel()
        np.testing.assert_allclose([a.mean(), b.mean()], [0.8, -0.8],
                                   atol=0.05)
        assert abs(a.var() - 0.2) < 0.05
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.1  # per-leaf keys distinct

    def test_gp_latent_posterior(self):
        """GP regression (d=32): pCN with the MvNormal(0, chol K) prior
        recovers the closed-form posterior mean — the ESS showcase fixture,
        one likelihood eval per step instead of a shrinkage loop."""
        from advancedmh_tpu.models import gp_latent_model

        model, prior, aux = gp_latent_model(n_points=32, noise=0.3, seed=3)
        spl = PreconditionedCrankNicolson(prior, beta=0.15)
        res = sample(model, spl, 3000, key=1, num_chains=64,
                     discard_initial=2000)
        draws = np.asarray(res.transitions.params).reshape(-1, 32)
        np.testing.assert_allclose(draws.mean(0), aux["post_mean"], atol=0.07)

    def test_beta_one_is_independence_sampler(self):
        """β=1 proposes fresh prior draws — still exact, posterior mean
        recovered via pure likelihood-ratio acceptance."""
        model = DensityModel(lambda x: Normal(1.0, 0.5).log_prob(x))
        spl = PreconditionedCrankNicolson(Normal(0.0, 1.0), beta=1.0)
        res = sample(model, spl, 8000, key=2, num_chains=32,
                     discard_initial=200)
        x = np.asarray(res.transitions.params).ravel()
        assert abs(x.mean() - 0.8) < 0.05


class TestDimensionRobustness:
    def test_acceptance_flat_in_dimension(self):
        """The pCN selling point: fixed β=0.2, acceptance at d=64 stays
        within a factor ~2 of d=2 (an RWMH with fixed scale would collapse
        exponentially)."""
        rates = {}
        for d in (2, 64):
            model = DensityModel(
                lambda f: -0.125 * jnp.sum(f * f)  # likelihood N(0, 2I)-ish
            )
            spl = PreconditionedCrankNicolson(
                MvNormal.standard(d), beta=0.2
            )
            res = sample(model, spl, 800, key=3, num_chains=128,
                         discard_initial=200)
            rates[d] = float(np.asarray(res.transitions.accepted).mean())
        assert rates[64] > 0.3 * rates[2]
        assert rates[64] > 0.2


class TestMechanics:
    def test_bad_beta_raises(self):
        with pytest.raises(ValueError, match="beta"):
            PreconditionedCrankNicolson(Normal(0.0, 1.0), beta=0.0)
        with pytest.raises(ValueError, match="beta"):
            PreconditionedCrankNicolson(Normal(0.0, 1.0), beta=1.5)

    def test_non_gaussian_prior_raises(self):
        from advancedmh_tpu import InverseGamma

        with pytest.raises(TypeError, match="Gaussian prior"):
            spl = PreconditionedCrankNicolson(InverseGamma(2.0, 3.0))
            spl.init(jax.random.key(0), DensityModel(lambda x: 0.0))

    def test_prior_leaf_mismatch_raises(self):
        model = DensityModel(lambda x: Normal(0.0, 1.0).log_prob(x["a"]))
        spl = PreconditionedCrankNicolson(
            {"a": Normal(0.0, 1.0), "b": Normal(0.0, 1.0)}
        )
        with pytest.raises(ValueError, match="leaves"):
            sample(model, spl, 5, key=0,
                   initial_params={"a": jnp.zeros(())})

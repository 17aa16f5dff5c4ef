"""Adaptive-tempering SMC tests (runtime/smc.py).

Sharp checks ≙ the evidence suite: the conjugate Normal-Normal marginal
likelihood and posterior have closed forms; the adaptive β-schedule, the
evidence estimate, and the final particle cloud must all hit them. Plus
the capability SMC uniquely adds over the MCMC stack: populating separated
modes in the right proportions (tempering walks particles through the
barrier regime).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import MvNormal, Normal, smc_sample


def _analytic_log_evidence(y, sigma, tau):
    n = len(y)
    cov = sigma**2 * np.eye(n) + tau**2 * np.ones((n, n))
    _, logdet = np.linalg.slogdet(2.0 * np.pi * cov)
    return float(-0.5 * (logdet + y @ np.linalg.solve(cov, y)))


class TestConjugate:
    def test_normal_normal_evidence_and_posterior(self):
        y = np.asarray([0.8, 1.3, 0.2, 1.0, 0.6], np.float32)
        y_j = jnp.asarray(y)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 1.0).log_prob(y_j))

        out = smc_sample(
            loglik, MvNormal(jnp.zeros(1), scale=1.0), key=0,
            num_particles=8192,
        )
        want = _analytic_log_evidence(y, 1.0, 1.0)
        assert abs(out["log_z"] - want) < 0.05
        # closed-form conjugate posterior N(Σy/(n+1), 1/(n+1))
        n = len(y)
        th = np.asarray(out["particles"]).reshape(-1)
        assert abs(th.mean() - y.sum() / (n + 1)) < 0.03
        assert abs(th.std() - (1.0 / (n + 1)) ** 0.5) < 0.03
        # adaptive schedule: strictly ascending 0 → 1
        b = np.asarray(out["betas"])
        assert b[0] == 0.0 and b[-1] == 1.0
        assert np.all(np.diff(b) > 0)
        assert out["n_stages"] == len(b) - 1
        # rejuvenation stays alive at the 2.38/√d·σ̂ no-knobs scale
        assert all(0.15 < a < 0.9 for a in out["acceptance"])

    def test_flat_likelihood_exact(self):
        """L ≡ 1: one stage straight to β=1, log Z exactly 0, particles
        still distributed as the prior."""
        out = smc_sample(
            lambda th: jnp.zeros(()), MvNormal(jnp.zeros(2), scale=1.0),
            key=1, num_particles=2048,
        )
        assert out["log_z"] == 0.0
        assert out["n_stages"] == 1
        p = np.asarray(out["particles"])
        np.testing.assert_allclose(p.mean(0), np.zeros(2), atol=0.08)
        np.testing.assert_allclose(p.std(0), np.ones(2), atol=0.08)

    def test_schedule_resolution_follows_target(self):
        """A sharper likelihood (more data) must force a finer adaptive
        schedule; lowering target_ess_frac must coarsen it."""
        y = jnp.asarray(np.random.default_rng(0).normal(0.5, 1.0, 40),
                        jnp.float32)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 1.0).log_prob(y))

        prior = MvNormal(jnp.zeros(1), scale=1.0)
        fine = smc_sample(loglik, prior, key=2, num_particles=2048,
                          target_ess_frac=0.9)
        coarse = smc_sample(loglik, prior, key=2, num_particles=2048,
                            target_ess_frac=0.3)
        assert fine["n_stages"] > coarse["n_stages"]
        # both still land the evidence
        want = _analytic_log_evidence(np.asarray(y), 1.0, 1.0)
        assert abs(fine["log_z"] - want) < 0.1
        assert abs(coarse["log_z"] - want) < 0.15


class TestCapability:
    def test_bimodal_mode_populations(self):
        """The SMC capability the MCMC stack lacks: a symmetric two-mode
        likelihood with a deep barrier. Tempering keeps particles mobile
        while the modes emerge, so BOTH end up populated ≈ 50/50 — a
        single RWMH chain at the same budget sits in one mode."""
        sep = 6.0

        def loglik(theta):
            t = theta[0]
            return jnp.logaddexp(
                -0.5 * ((t - sep / 2) / 0.5) ** 2,
                -0.5 * ((t + sep / 2) / 0.5) ** 2,
            )

        out = smc_sample(
            loglik, MvNormal(jnp.zeros(1), scale=4.0), key=3,
            num_particles=8192, mutation_steps=10,
        )
        th = np.asarray(out["particles"]).reshape(-1)
        right = (th > 0).mean()
        assert 0.4 < right < 0.6
        # particles actually concentrate at ±sep/2
        assert abs(np.abs(th).mean() - sep / 2) < 0.3

    def test_pytree_prior(self):
        """Prior as a dict of Distributions (≙ log_evidence contract):
        loglik receives the same structure; evidences of independent
        blocks add."""
        y1 = np.asarray([0.5, -0.2, 0.9], np.float32)
        y2 = np.asarray([1.5, 2.1], np.float32)

        def loglik(theta):
            return (
                jnp.sum(Normal(theta["a"], 1.0).log_prob(jnp.asarray(y1)))
                + jnp.sum(Normal(theta["b"], 0.5).log_prob(jnp.asarray(y2)))
            )

        prior = {"a": Normal(0.0, 1.0), "b": Normal(0.0, 1.0)}
        out = smc_sample(loglik, prior, key=4, num_particles=8192)
        want = (
            _analytic_log_evidence(y1, 1.0, 1.0)
            + _analytic_log_evidence(y2, 0.5, 1.0)
        )
        assert abs(out["log_z"] - want) < 0.1
        assert set(out["particles"].keys()) == {"a", "b"}


class TestInterface:
    def test_validation(self):
        prior = MvNormal(jnp.zeros(1), scale=1.0)
        with pytest.raises(ValueError, match="target_ess_frac"):
            smc_sample(lambda t: jnp.zeros(()), prior, key=0,
                       target_ess_frac=1.5)
        with pytest.raises(ValueError, match="mutation_steps"):
            smc_sample(lambda t: jnp.zeros(()), prior, key=0,
                       mutation_steps=0)

    def test_deterministic_given_key(self):
        y = jnp.asarray([0.3, 0.7], jnp.float32)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 1.0).log_prob(y))

        prior = MvNormal(jnp.zeros(1), scale=1.0)
        a = smc_sample(loglik, prior, key=7, num_particles=512)
        b = smc_sample(loglik, prior, key=7, num_particles=512)
        assert a["log_z"] == b["log_z"]
        np.testing.assert_array_equal(
            np.asarray(a["particles"]), np.asarray(b["particles"])
        )

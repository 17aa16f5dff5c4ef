"""Power-posterior evidence estimation tests (runtime/evidence.py).

Sharp check: the conjugate Normal-Normal model has a closed-form marginal
likelihood — log N(y; 0, σ²I + τ²11ᵀ) — both estimators must hit it.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import MvNormal, Normal, log_evidence, log_evidence_ais, power_ladder


def _analytic_log_evidence(y, sigma, tau):
    n = len(y)
    cov = sigma**2 * np.eye(n) + tau**2 * np.ones((n, n))
    sign, logdet = np.linalg.slogdet(2.0 * np.pi * cov)
    return float(
        -0.5 * (logdet + y @ np.linalg.solve(cov, y))
    )


class TestConjugate:
    def test_normal_normal_evidence(self):
        y = np.asarray([0.8, 1.3, 0.2, 1.0, 0.6], np.float32)
        sigma, tau = 1.0, 1.0
        y_j = jnp.asarray(y)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], sigma).log_prob(y_j))

        out = log_evidence(
            loglik, MvNormal(jnp.zeros(1), scale=tau), 3000, key=0,
            num_chains=64, proposal_scale=0.6,
        )
        want = _analytic_log_evidence(y, sigma, tau)
        assert abs(out["log_z_ss"] - want) < 0.05
        assert abs(out["log_z_ti"] - want) < 0.1  # TI carries ladder bias
        # the reported Monte-Carlo SE brackets the true value (Xie 2011 §SE)
        assert out["se_ss"] > 0.0
        assert abs(out["log_z_ss"] - want) < 3.0 * out["se_ss"] + 0.02
        # mean log-likelihood increases along the ladder (the near-zero
        # rungs are MC-noisy — all targets there are ≈ the prior)
        assert np.all(np.diff(out["mean_loglik"]) > -0.2)
        assert out["mean_loglik"][-1] > out["mean_loglik"][0] + 2.0
        assert np.all(out["acceptance"] > 0.05)

    def test_flat_likelihood_gives_zero(self):
        """L ≡ 1 → Z = 1 → log Z = 0 for both estimators, exactly."""
        out = log_evidence(
            lambda th: jnp.zeros(()), MvNormal(jnp.zeros(2), scale=1.0),
            200, key=1, num_chains=16,
        )
        assert abs(out["log_z_ss"]) < 1e-5
        assert abs(out["log_z_ti"]) < 1e-5

    def test_two_dim_factorized(self):
        """Two independent conjugate blocks: evidences add in log space."""
        y1 = np.asarray([0.5, -0.2, 0.9], np.float32)
        y2 = np.asarray([1.5, 2.1], np.float32)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 1.0).log_prob(jnp.asarray(y1))) + \
                jnp.sum(Normal(theta[1], 0.5).log_prob(jnp.asarray(y2)))

        out = log_evidence(
            loglik, MvNormal(jnp.zeros(2), scale=1.0), 3000, key=2,
            num_chains=64, proposal_scale=0.5,
        )
        want = (_analytic_log_evidence(y1, 1.0, 1.0)
                + _analytic_log_evidence(y2, 0.5, 1.0))
        assert abs(out["log_z_ss"] - want) < 0.08


class TestHardening:
    """Round-2 hardening: auto proposal scaling, pytree priors, SE, loud
    low-acceptance warning (VERDICT r1 items 5/7)."""

    def test_auto_scaling_keeps_every_rung_alive(self):
        """proposal_scale='auto' (the default): per-chain dual averaging
        finds workable scales on every rung — including hot ones where a
        coarse global scale would freeze the chain."""
        y = np.asarray([0.8, 1.3, 0.2, 1.0, 0.6], np.float32)
        y_j = jnp.asarray(y)

        def loglik(theta):
            # tight likelihood: σ = 0.05 makes the β=1 rung ~100x narrower
            # than the prior — a fixed prior-sized scale would collapse there
            return jnp.sum(Normal(theta[0], 0.05).log_prob(y_j))

        out = log_evidence(
            loglik, MvNormal(jnp.zeros(1), scale=1.0), 2000, key=3,
            num_chains=64,
        )
        assert np.all(out["acceptance"] > 0.1)
        # adapted scales shrink toward the hot end of the ladder
        assert out["proposal_scales"][-1] < 0.5 * out["proposal_scales"][0]
        n = len(y)
        cov = 0.05**2 * np.eye(n) + np.ones((n, n))
        sign, logdet = np.linalg.slogdet(2.0 * np.pi * cov)
        want = float(-0.5 * (logdet + y @ np.linalg.solve(cov, y)))
        assert abs(out["log_z_ss"] - want) < max(0.15, 3 * out["se_ss"])

    def test_pytree_prior_params(self):
        """A dict-of-Distributions prior: loglik_fn receives the same pytree
        structure; evidence matches the factorized analytic value."""
        y1 = np.asarray([0.5, -0.2, 0.9], np.float32)
        y2 = np.asarray([1.5, 2.1], np.float32)

        def loglik(theta):
            return (
                jnp.sum(Normal(theta["a"], 1.0).log_prob(jnp.asarray(y1)))
                + jnp.sum(Normal(theta["b"], 0.5).log_prob(jnp.asarray(y2)))
            )

        prior = {"a": Normal(0.0, 1.0), "b": Normal(0.0, 1.0)}
        out = log_evidence(loglik, prior, 3000, key=4, num_chains=64)
        want = (_analytic_log_evidence(y1, 1.0, 1.0)
                + _analytic_log_evidence(y2, 0.5, 1.0))
        assert abs(out["log_z_ss"] - want) < max(0.1, 3 * out["se_ss"])

    def test_low_acceptance_rung_warns(self):
        """A hopeless fixed scale on a tight likelihood must warn loudly."""
        y_j = jnp.asarray([0.3, 0.1], jnp.float32)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 0.005).log_prob(y_j))

        with pytest.warns(UserWarning, match="acceptance"):
            log_evidence(
                loglik, MvNormal(jnp.zeros(1), scale=1.0), 300, key=5,
                num_chains=16, proposal_scale=2.0,
            )

    def test_per_rung_scale_sequence(self):
        betas = (0.0, 0.5, 1.0)
        out = log_evidence(
            lambda th: jnp.zeros(()), MvNormal(jnp.zeros(1), scale=1.0),
            200, key=6, num_chains=16, betas=betas,
            proposal_scale=(1.0, 0.5, 0.25),
        )
        np.testing.assert_allclose(
            out["proposal_scales"], [1.0, 0.5, 0.25]
        )

    def test_bad_scale_length_raises(self):
        with pytest.raises(ValueError, match="proposal_scale"):
            log_evidence(
                lambda th: jnp.zeros(()), MvNormal(jnp.zeros(1), scale=1.0),
                10, key=0, betas=(0.0, 1.0), proposal_scale=(1.0, 0.5, 0.25),
            )


class TestMechanics:
    def test_power_ladder_shape(self):
        b = power_ladder(11, c=5.0)
        assert b[0] == 0.0 and b[-1] == 1.0 and len(b) == 11
        assert all(x < y for x, y in zip(b, b[1:]))
        # rungs concentrate near 0
        assert b[5] < 0.05

    def test_bad_ladder_raises(self):
        with pytest.raises(ValueError, match="betas"):
            log_evidence(
                lambda th: jnp.zeros(()), MvNormal(jnp.zeros(1), scale=1.0),
                10, key=0, betas=(0.0, 0.5),
            )

    def test_non_distribution_prior_raises(self):
        with pytest.raises(TypeError, match="Distribution"):
            log_evidence(lambda th: jnp.zeros(()), lambda x: 0.0, 10, key=0)


class TestAIS:
    """Annealed importance sampling (log_evidence_ais, Neal 2001)."""

    def test_normal_normal_ais(self):
        y = np.asarray([0.8, 1.3, 0.2, 1.0, 0.6], np.float32)
        y_j = jnp.asarray(y)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 1.0).log_prob(y_j))

        out = log_evidence_ais(
            loglik, MvNormal(jnp.zeros(1), scale=1.0), key=0,
            num_chains=512, n_steps_per_rung=4, proposal_scale=0.6,
        )
        want = _analytic_log_evidence(y, 1.0, 1.0)
        assert abs(out["log_z_ais"] - want) < 0.05
        assert out["se_ais"] > 0.0
        assert abs(out["log_z_ais"] - want) < 3.0 * out["se_ais"] + 0.02
        # weights should be healthy on this easy model
        assert out["ess_weights"] > 100.0
        assert np.all(out["acceptance"] > 0.1)

    def test_flat_likelihood_exact_zero(self):
        """L ≡ 1 ⇒ every weight increment is 0 ⇒ log Z = 0 exactly."""
        out = log_evidence_ais(
            lambda th: jnp.zeros(()), MvNormal(jnp.zeros(2), scale=1.0),
            key=1, num_chains=32, n_steps_per_rung=1,
            betas=(0.0, 0.5, 1.0), proposal_scale=1.0,
        )
        assert out["log_z_ais"] == 0.0
        assert out["ess_weights"] == pytest.approx(32.0)

    def test_auto_pilot_scales_monotone_shrink(self):
        """auto scaling: hot rungs of a concentrated likelihood get smaller
        proposal scales than the prior rung."""
        y = jnp.zeros(50)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 0.1).log_prob(y))

        out = log_evidence_ais(
            loglik, MvNormal(jnp.zeros(1), scale=1.0), key=2,
            num_chains=256, n_steps_per_rung=3, n_pilot=300,
        )
        s = out["proposal_scales"]
        assert s[-1] < 0.5 * s[0]
        # unbiasedness sanity vs closed form (wide SE tolerance)
        want = _analytic_log_evidence(np.zeros(50, np.float32), 0.1, 1.0)
        assert abs(out["log_z_ais"] - want) < max(0.3, 4.0 * out["se_ais"])

    def test_pytree_prior(self):
        """Pytree prior: loglik receives the same structure (≙ log_evidence)."""
        y1 = np.asarray([0.5, -0.2, 0.9], np.float32)

        def loglik(theta):
            return jnp.sum(Normal(theta["mu"][0], 1.0).log_prob(jnp.asarray(y1)))

        out = log_evidence_ais(
            loglik, {"mu": MvNormal(jnp.zeros(1), scale=1.0)}, key=3,
            num_chains=256, proposal_scale=0.6,
        )
        want = _analytic_log_evidence(y1, 1.0, 1.0)
        assert abs(out["log_z_ais"] - want) < 0.1

    def test_validation(self):
        prior = MvNormal(jnp.zeros(1), scale=1.0)
        with pytest.raises(ValueError, match="betas"):
            log_evidence_ais(lambda t: jnp.zeros(()), prior, key=0,
                             betas=(0.0, 0.5))
        with pytest.raises(ValueError, match="n_steps_per_rung"):
            log_evidence_ais(lambda t: jnp.zeros(()), prior, key=0,
                             n_steps_per_rung=0)
        with pytest.raises(ValueError, match="proposal_scale"):
            log_evidence_ais(lambda t: jnp.zeros(()), prior, key=0,
                             proposal_scale="bogus")
        with pytest.raises(ValueError, match="proposal_scale"):
            log_evidence_ais(lambda t: jnp.zeros(()), prior, key=0,
                             betas=(0.0, 1.0), proposal_scale=(1.0, 0.5, 0.2))

    def test_low_acceptance_warns(self):
        y = jnp.zeros(80)

        def loglik(theta):
            return jnp.sum(Normal(theta[0], 0.05).log_prob(y))

        with pytest.warns(UserWarning, match="ess_weights"):
            log_evidence_ais(
                loglik, MvNormal(jnp.zeros(1), scale=1.0), key=4,
                num_chains=64, n_steps_per_rung=4, betas=(0.0, 0.1, 1.0),
                proposal_scale=25.0,
            )

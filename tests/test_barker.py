"""Barker-proposal sampler tests (beyond-parity; samplers/barker.py).

Mirrors the MALA test categories (≙ reference test/runtests.jl:287-365
structure: error path, posterior moments, covariance recovery) plus the
sampler's own headline property — step-size robustness relative to MALA
(Livingstone & Zanella 2022, §3).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import Barker, DensityModel, MALA, MvNormal, Normal, sample
from tests.test_mh import MODEL


class TestBasic:
    def test_requires_initial_params(self):
        with pytest.raises(ValueError, match="initial parameters"):
            sample(MODEL, Barker(0.1), 100, key=0)

    def test_posterior_moments(self):
        chains = sample(
            MODEL, Barker(step_size=0.05), 2000, key=1, num_chains=16,
            initial_params=jnp.ones(2), discard_initial=500,
            chain_type="chains", param_names=["μ", "σ"],
        )
        assert abs(float(chains["μ"].mean())) < 0.1
        assert abs(float(chains["σ"].mean()) - 1.0) < 0.1

    def test_covariance_recovery(self):
        """Quadratic log-density with analytic gradient (≙ the MALA issue-#95
        test model): Barker recovers the full covariance."""
        SIG = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
        P = np.linalg.inv(SIG).astype(np.float32)

        def ld(x):
            return -0.5 * x @ jnp.asarray(P) @ x

        def ld_grad(x):
            return ld(x), -jnp.asarray(P) @ x

        model = DensityModel(ld, logdensity_and_gradient_fn=ld_grad, dimension=2)
        res = sample(
            model, Barker(step_size=0.9), 4000, key=2, num_chains=64,
            initial_params=jnp.ones(2), discard_initial=1000,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(draws.mean(0), np.zeros(2), atol=0.05)
        np.testing.assert_allclose(np.cov(draws.T), SIG, atol=0.15)

    def test_gradient_cached_in_state(self):
        _, state = Barker(0.5).init(
            jax.random.key(0), MODEL, jnp.asarray([0.0, 1.0])
        )
        assert state.gradient is not None
        lp, g = jax.value_and_grad(MODEL.logdensity_fn)(jnp.asarray([0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(state.gradient), np.asarray(g))


class TestRobustness:
    def test_survives_step_sizes_that_kill_mala(self):
        """The bounded skew keeps acceptance healthy at step sizes where
        MALA's linear drift collapses it (the paper's headline property)."""
        sigma = 4.0  # grossly too large for a unit Gaussian target

        def ld(x):
            return -0.5 * jnp.sum(x * x)

        model = DensityModel(ld, dimension=2)
        kw = dict(
            key=3, num_chains=64, initial_params=jnp.zeros(2),
            discard_initial=200,
        )
        res_b = sample(model, Barker(step_size=sigma), 1000, **kw)
        s2 = sigma**2
        res_m = sample(
            model,
            MALA(lambda g: MvNormal(s2 / 2.0 * g, scale=jnp.sqrt(s2))),
            1000, **kw,
        )
        acc_b = float(np.asarray(res_b.transitions.accepted).mean())
        acc_m = float(np.asarray(res_m.transitions.accepted).mean())
        assert acc_m < 0.05  # MALA has effectively died
        assert acc_b > 0.15  # Barker still moves
        # and the Barker chain is actually sampling the target
        draws = np.asarray(res_b.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(draws.mean(0), np.zeros(2), atol=0.1)
        np.testing.assert_allclose(draws.std(0), np.ones(2), atol=0.1)


class TestPytree:
    def test_dict_params_decorrelated_leaves(self):
        """Pytree params: per-leaf proposal keys (equal-shaped leaves would
        expose any key reuse as spurious cross-leaf correlation)."""
        def ld(x):
            return (
                Normal(1.0, 0.5).log_prob(x["a"])
                + Normal(-1.0, 0.5).log_prob(x["b"])
            )

        model = DensityModel(ld)
        res = sample(
            model, Barker(step_size=0.6), 4000, key=4, num_chains=32,
            initial_params={"a": jnp.zeros(()), "b": jnp.zeros(())},
            discard_initial=500,
        )
        a = np.asarray(res.transitions.params["a"]).ravel()
        b = np.asarray(res.transitions.params["b"]).ravel()
        np.testing.assert_allclose(a.mean(), 1.0, atol=0.05)
        np.testing.assert_allclose(b.mean(), -1.0, atol=0.05)
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.1

    def test_single_chain_matches_batched(self):
        """Single-chain step and step_batched target the same posterior."""
        def ld(x):
            return -0.5 * jnp.sum((x - 2.0) ** 2)

        model = DensityModel(ld, dimension=2)
        res_v = sample(
            model, Barker(step_size=1.0), 3000, key=5, num_chains=32,
            initial_params=jnp.zeros(2), discard_initial=500,
        )
        res_s = sample(
            model, Barker(step_size=1.0), 3000, key=6, num_chains=32,
            initial_params=jnp.zeros(2), discard_initial=500,
            vectorized=False,
        )
        m_v = np.asarray(res_v.transitions.params).reshape(-1, 2).mean(0)
        m_s = np.asarray(res_s.transitions.params).reshape(-1, 2).mean(0)
        np.testing.assert_allclose(m_v, [2.0, 2.0], atol=0.05)
        np.testing.assert_allclose(m_s, [2.0, 2.0], atol=0.05)

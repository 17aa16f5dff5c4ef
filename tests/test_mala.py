"""MALA tests ≙ reference test/runtests.jl "MALA" testset (:287-365).

- missing initial_params errors (≙ :294-301)
- posterior moments on the Gaussian (μ,σ) model (≙ :304-314)
- covariance recovery on a quadratic log-density with analytic gradient
  (≙ issue #95 test, :317-364)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    DensityModel,
    GradientTransition,
    MALA,
    MvNormal,
    getparams,
    sample,
    setparams,
)
from tests.test_mh import MODEL


SIGMA2 = 1e-3
SPL = MALA(lambda g: MvNormal(SIGMA2 / 2.0 * g, scale=jnp.sqrt(SIGMA2)))


class TestBasic:
    def test_requires_initial_params(self):
        with pytest.raises(ValueError, match="initial parameters"):
            sample(MODEL, SPL, 100, key=0, discard_initial=10)

    def test_posterior_moments(self):
        chains = sample(
            MODEL, SPL, 2000, key=1, num_chains=16,
            initial_params=jnp.ones(2), discard_initial=500,
            chain_type="chains", param_names=["μ", "σ"],
        )
        assert abs(float(chains["μ"].mean())) < 0.1
        assert abs(float(chains["σ"].mean()) - 1.0) < 0.1

    def test_logdensityproblems_object_without_grad_is_order_zero(self):
        """≙ capability check (src/MALA.jl:42-52): a LogDensityProblems-style
        object declaring neither capabilities nor a gradient coerces to
        order 0, so MALA raises the helpful error instead of attempting
        autodiff on an undeclared density."""
        from advancedmh_tpu.models.density import CapabilityOrder, as_model

        class Target:
            dimension = 2

            def logdensity(self, x):
                return -0.5 * jnp.sum(x * x)

        m = as_model(Target())
        assert m.capabilities == CapabilityOrder.ZERO
        with pytest.raises(ValueError, match="gradient"):
            sample(m, SPL, 5, key=0, initial_params=jnp.zeros(2))

    def test_gradient_cached_in_transition(self):
        t, state = SPL.init(jax.random.key(0), MODEL, jnp.ones(2))
        assert isinstance(state, GradientTransition)
        t2, s2 = SPL.step(jax.random.key(1), state, MODEL)
        assert s2.gradient.shape == (2,)

    def test_getparams_setparams(self):
        """≙ interface conformance testset (test/runtests.jl:37-54)."""
        t, _ = SPL.init(jax.random.key(0), MODEL, jnp.ones(2))
        assert jnp.all(getparams(t) == t.params)
        t_same = setparams(MODEL, t, getparams(t))
        assert float(t_same.lp) == float(t.lp)
        np.testing.assert_allclose(
            np.asarray(t_same.gradient), np.asarray(t.gradient), rtol=1e-6
        )
        t_new = setparams(MODEL, t, jnp.asarray([1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(t_new.params), [1.0, 2.0])
        # lp recomputed at the new params
        assert float(t_new.lp) == pytest.approx(float(MODEL.logdensity_fn(jnp.asarray([1.0, 2.0]))), rel=1e-5)


class TestQuadraticCovariance:
    """≙ 'issue #95': MALA on N(0, Σ) with analytic gradient recovers Σ."""

    SIG = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
    A = np.linalg.inv(SIG).astype(np.float32)

    def _model(self):
        Ajnp = jnp.asarray(self.A)

        def logdensity(x):
            return -x @ Ajnp @ x / 2.0

        def logdensity_and_gradient(x):
            return -x @ Ajnp @ x / 2.0, -Ajnp @ x

        return DensityModel(
            logdensity,
            logdensity_and_gradient_fn=logdensity_and_gradient,
            dimension=2,
        )

    def test_covariance_recovery(self):
        s2 = 0.5
        spl = MALA(lambda g: MvNormal(s2 / 2.0 * g, scale=jnp.sqrt(s2)))
        res = sample(
            self._model(), spl, 8000, key=2, num_chains=16,
            initial_params=jnp.ones(2), discard_initial=1000,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(draws.mean(0), np.zeros(2), atol=0.1)
        np.testing.assert_allclose(np.cov(draws.T), self.SIG, atol=0.2)

    def test_analytic_gradient_used(self):
        """Model-provided gradient path (≙ LogDensityProblems order-1)."""
        calls = []

        def ldg(x):
            calls.append(1)
            return -x @ jnp.asarray(self.A) @ x / 2.0, -jnp.asarray(self.A) @ x

        m = DensityModel(lambda x: -x @ jnp.asarray(self.A) @ x / 2.0,
                         logdensity_and_gradient_fn=ldg, dimension=2)
        spl = MALA(lambda g: MvNormal(0.25 * g, scale=jnp.sqrt(0.5)))
        spl.init(jax.random.key(0), m, jnp.ones(2))
        assert calls  # analytic path was traced

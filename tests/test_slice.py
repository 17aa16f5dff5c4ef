"""Slice sampler tests (samplers/slice.py; Neal 2003).

Categories follow SURVEY.md §4: posterior moments on the shared fixture
models (same tolerances as the reference's MH tests), covariance recovery,
robustness to the width knob (the sampler's headline property), interface
and error paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import DensityModel, SliceSampler, sample
from tests.test_mh import MODEL


class TestMoments:
    def test_readme_model_moments(self):
        """The reference README/test flagship (μ, σ posterior with a support
        guard): −inf outside σ ≥ 0 simply means 'outside the slice'."""
        res = sample(
            MODEL, SliceSampler(width=0.5), 2000, key=0, num_chains=64,
            initial_params=jnp.asarray([0.0, 1.0]), discard_initial=200,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        assert abs(draws[:, 0].mean()) < 0.1
        assert abs(draws[:, 1].mean() - 1.0) < 0.1

    def test_covariance_recovery(self):
        SIG = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
        P = np.linalg.inv(SIG).astype(np.float32)
        model = DensityModel(lambda x: -0.5 * x @ jnp.asarray(P) @ x, dimension=2)
        res = sample(
            model, SliceSampler(width=1.5), 3000, key=1, num_chains=64,
            initial_params=jnp.zeros(2), discard_initial=500,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(draws.mean(0), np.zeros(2), atol=0.05)
        np.testing.assert_allclose(np.cov(draws.T), SIG, atol=0.12)

    def test_width_robustness(self):
        """Neal's headline property: the answer is insensitive to width
        across orders of magnitude (stepping-out/shrinkage absorb it)."""
        model = DensityModel(
            lambda x: -0.5 * jnp.sum(x * x), dimension=1
        )
        for w in (0.1, 1.0, 10.0):
            res = sample(
                model, SliceSampler(width=w), 1500, key=2, num_chains=32,
                initial_params=jnp.zeros(1), discard_initial=200,
            )
            d = np.asarray(res.transitions.params).reshape(-1)
            assert abs(d.mean()) < 0.08, f"width={w}"
            np.testing.assert_allclose(d.var(), 1.0, rtol=0.12)


class TestPytree:
    def test_dict_params_one_direction(self):
        """The random direction is a single unit vector over the whole
        pytree (not per-leaf), so cross-leaf correlations are explored."""
        model = DensityModel(
            lambda th: -0.5 * (th["a"] ** 2 + jnp.sum(th["b"] ** 2))
            - 0.8 * th["a"] * th["b"][0]
        )
        init = {"a": jnp.zeros(()), "b": jnp.zeros(2)}
        res = sample(
            model, SliceSampler(), 2000, key=3, num_chains=32,
            initial_params=init, discard_initial=300,
        )
        a = np.asarray(res.transitions.params["a"]).reshape(-1)
        b0 = np.asarray(res.transitions.params["b"]).reshape(-1, 2)[:, 0]
        # precision [[1, .8], [.8, 1]] → corr(a, b0) = −0.8
        corr = np.corrcoef(a, b0)[0, 1]
        assert abs(corr + 0.8) < 0.06


class TestInterface:
    def test_requires_initial_params(self):
        with pytest.raises(ValueError, match="initial parameters"):
            sample(MODEL, SliceSampler(), 100, key=0)

    def test_rejection_free(self):
        res = sample(
            MODEL, SliceSampler(), 200, key=4, num_chains=16,
            initial_params=jnp.asarray([0.0, 1.0]),
        )
        assert bool(np.asarray(res.transitions.accepted)[:, 1:].all())

    def test_single_chain_step_jits(self):
        spl = SliceSampler()
        _, state = spl.init(jax.random.key(0), MODEL, jnp.asarray([0.0, 1.0]))
        t, _ = jax.jit(lambda k, s: spl.step(k, s, MODEL))(
            jax.random.key(1), state
        )
        assert bool(t.accepted)
        assert np.isfinite(float(t.lp))

    def test_impossible_target_keeps_state(self):
        impossible = DensityModel(lambda th: -jnp.inf * jnp.ones(()))
        spl = SliceSampler(max_shrink=4)
        x0 = jnp.asarray([0.5])
        _, state = spl.init(jax.random.key(0), impossible, x0)
        t, _ = spl.step(jax.random.key(1), state, impossible)
        np.testing.assert_array_equal(np.asarray(t.params), [0.5])
        assert not bool(t.accepted)

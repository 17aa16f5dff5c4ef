"""MEADS (Hoffman-Sountsov 2022) — warmup-free cross-fold generalized HMC.

Categories follow SURVEY.md §4: posterior moments (1), interface/error
paths (6), determinism (3-analog), plus the sampler's own contracts: fold
parameters are finite and adaptive, the persistent slice variable stays
uniform-valid, and both acceptance schemes agree on the posterior.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import MEADS, sample
from advancedmh_tpu.models.targets import (
    correlated_gaussian_model,
    gaussian_mean_scale_model,
)


class TestPosterior:
    def test_correlated_gaussian_moments(self):
        SIG = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
        model = correlated_gaussian_model(SIG)
        res = sample(
            model, MEADS(), 2000, key=0, num_chains=256,
            discard_initial=500, initial_params=jnp.zeros(2),
            vectorized=True,
        )
        d = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(d.mean(0), np.zeros(2), atol=0.06)
        np.testing.assert_allclose(np.cov(d.T), SIG, rtol=0.1, atol=0.05)

    def test_anisotropic_preconditioning(self):
        """100:1 scale ratio: the per-dimension σ from the complementary
        fold must absorb the anisotropy — without it a shared ε collapses
        to the stiff direction and the wide coordinate never mixes."""
        SIG = np.diag([100.0, 1.0]).astype(np.float32)
        model = correlated_gaussian_model(SIG)
        res = sample(
            model, MEADS(), 3000, key=1, num_chains=256,
            discard_initial=1000, initial_params=jnp.zeros(2),
            vectorized=True,
        )
        d = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(
            d.var(0), np.array([100.0, 1.0]), rtol=0.15
        )

    def test_readme_model_with_support_guard(self):
        """The reference fixture (μ, σ posterior with the σ ≥ 0 → −inf
        guard): out-of-support proposals must reject cleanly (a = 0 on
        non-finite logα), never poison the persistent state."""
        model = gaussian_mean_scale_model()
        res = sample(
            model, MEADS(), 2000, key=2, num_chains=256,
            discard_initial=500, initial_params=jnp.asarray([0.0, 1.0]),
            vectorized=True,
        )
        d = np.asarray(res.transitions.params).reshape(-1, 2)
        assert np.isfinite(d).all()
        assert abs(d[:, 0].mean()) < 0.1
        assert abs(d[:, 1].mean() - 1.0) < 0.1

    def test_metropolis_accept_variant(self):
        SIG = np.array([[1.0, 0.5], [0.5, 1.0]], dtype=np.float32)
        model = correlated_gaussian_model(SIG)
        res = sample(
            model, MEADS(accept="metropolis"), 2000, key=3,
            num_chains=256, discard_initial=500,
            initial_params=jnp.zeros(2), vectorized=True,
        )
        d = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(d.T), SIG, rtol=0.1, atol=0.05)


class TestMechanics:
    def test_no_warmup_phase(self):
        assert MEADS().has_warmup_phase is False
        assert MEADS().has_batched_kernel is True

    def test_single_chain_step_raises(self):
        model = correlated_gaussian_model(np.eye(2, dtype=np.float32))
        with pytest.raises(ValueError, match="complementary chain folds"):
            sample(model, MEADS(), 10, key=0,
                   initial_params=jnp.zeros(2))

    def test_fold_divisibility_enforced(self):
        model = correlated_gaussian_model(np.eye(2, dtype=np.float32))
        with pytest.raises(ValueError, match="divisible by n_folds"):
            sample(model, MEADS(n_folds=4), 10, key=0, num_chains=6,
                   initial_params=jnp.zeros(2), vectorized=True)

    def test_pytree_params_rejected(self):
        from advancedmh_tpu import DensityModel

        model = DensityModel(
            lambda p: -0.5 * (p["a"] ** 2 + p["b"] ** 2)
        )
        with pytest.raises(ValueError, match="array params"):
            sample(model, MEADS(), 10, key=0, num_chains=8,
                   initial_params={"a": jnp.zeros(()), "b": jnp.zeros(())},
                   vectorized=True)

    def test_ctor_validation(self):
        with pytest.raises(ValueError, match="n_folds"):
            MEADS(n_folds=1)
        with pytest.raises(ValueError, match="accept"):
            MEADS(accept="bogus")

    def test_deterministic_given_key(self):
        model = correlated_gaussian_model(
            np.eye(2, dtype=np.float32)
        )
        kw = dict(key=7, num_chains=64, discard_initial=50,
                  initial_params=jnp.zeros(2), vectorized=True)
        a = sample(model, MEADS(), 100, **kw)
        b = sample(model, MEADS(), 100, **kw)
        np.testing.assert_array_equal(
            np.asarray(a.transitions.params), np.asarray(b.transitions.params)
        )

    def test_slice_variable_stays_uniform_valid(self):
        """Neal's non-reversible u must remain in [0, 1) through the
        accept/reject renormalizations and the δ drift — an out-of-range
        u silently biases every later acceptance."""
        model = correlated_gaussian_model(
            np.array([[1.0, 0.5], [0.5, 1.0]], np.float32)
        )
        res = sample(
            model, MEADS(), 200, key=4, num_chains=128,
            initial_params=jnp.zeros(2), vectorized=True,
        )
        u = np.asarray(res.final_state.u)
        assert ((u >= 0.0) & (u < 1.0)).all()
        # and the kernel is actually moving with healthy persistence
        acc = np.asarray(res.transitions.accepted).mean()
        assert 0.6 < acc <= 1.0


class TestChunked:
    def test_chunked_resume_bit_exact(self):
        """Chunked XLA MEADS equals the unchunked run bitwise: the state
        (incl. persistent p/u) threads through the chunk boundary and the
        absolute-iteration RNG indexing never re-derives keys."""
        from advancedmh_tpu.runtime.chunked import sample_chunked

        model = correlated_gaussian_model(
            np.array([[1.0, 0.5], [0.5, 1.0]], np.float32)
        )
        kw = dict(key=9, num_chains=64, discard_initial=50,
                  initial_params=jnp.zeros(2), vectorized=True)
        whole = sample(model, MEADS(), 200, **kw)
        chunked = sample_chunked(model, MEADS(), 200, chunk_size=100, **kw)
        np.testing.assert_array_equal(
            np.asarray(whole.transitions.params),
            np.asarray(chunked.transitions.params),
        )


class TestSharded:
    def test_mesh_sharded_moments(self):
        """Chains shard over the 8-device mesh; the per-fold reductions
        compile to psums (folds of 32 span 2 devices each). Statistical
        agreement, not bitwise (cross-device reduction order differs)."""
        from advancedmh_tpu import MCMCDistributed

        SIG = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
        model = correlated_gaussian_model(SIG)
        res = sample(
            model, MEADS(), 1500, key=5, num_chains=256,
            chain_method=MCMCDistributed(), discard_initial=500,
            initial_params=jnp.zeros(2), vectorized=True,
        )
        d = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(d.T), SIG, rtol=0.12, atol=0.06)

"""Adaptive Metropolis (Haario / Roberts-Rosenthal) tests.

Beyond-parity sampler: covariance learning must recover the target's
covariance both in the samples and in the adapted Cholesky factor, with the
same statistical-tolerance style as the reference's RAM jldoctest
(reference src/RobustAdaptiveMetropolis.jl:54-55: cov ≈ Σ rtol 0.2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    AdaptiveMetropolis,
    DensityModel,
    Normal,
    guarded_logdensity,
    sample,
)
from advancedmh_tpu.models.targets import correlated_gaussian_model

COV = jnp.asarray([[1.5, 0.35], [0.35, 1.0]], jnp.float32)
MODEL = correlated_gaussian_model(COV)


class TestCovarianceRecovery:
    def test_samples_recover_covariance(self):
        res = sample(
            MODEL, AdaptiveMetropolis(), 2000, key=0, num_chains=64,
            initial_params=jnp.zeros(2), num_warmup=1000,
            discard_initial=1000,
        )
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(x.mean(0), np.zeros(2), atol=0.1)
        np.testing.assert_allclose(np.cov(x.T), np.asarray(COV), rtol=0.2)

    def test_adapted_factor_learns_covariance(self):
        """L Lᵀ of the final state ≈ Σ (the covariance is learned, not just
        the samples correct)."""
        res = sample(
            MODEL, AdaptiveMetropolis(), 3000, key=1, num_chains=16,
            initial_params=jnp.zeros(2), discard_initial=1000,
        )
        L = np.asarray(res.final_state.L)  # (C, d, d)
        learned = np.einsum("cij,ckj->cik", L, L).mean(0)
        np.testing.assert_allclose(learned, np.asarray(COV), rtol=0.3)

    def test_acceptance_rate_reasonable(self):
        res = sample(
            MODEL, AdaptiveMetropolis(), 2000, key=2, num_chains=32,
            initial_params=jnp.zeros(2), discard_initial=1000,
        )
        acc = float(np.asarray(res.transitions.accepted).mean())
        # d=2 optimally-scaled RWMH accepts ~0.35-0.45; the β-mixture keeps a
        # small fixed component so allow a wide band.
        assert 0.2 < acc < 0.6


class TestPhases:
    def test_fixed_phase_only(self):
        """With adapt_start beyond the run length the proposal never uses the
        adapted component — still a correct (slow) symmetric RWMH."""
        res = sample(
            MODEL, AdaptiveMetropolis(adapt_start=10**9, fixed_scale=2.0),
            3000, key=3, num_chains=64, initial_params=jnp.zeros(2),
            discard_initial=500,
        )
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(x.mean(0), np.zeros(2), atol=0.15)

    def test_moments_track_chain_history(self):
        """The running mean converges to the target mean."""
        res = sample(
            MODEL, AdaptiveMetropolis(), 3000, key=4, num_chains=16,
            initial_params=jnp.zeros(2), discard_initial=0,
        )
        mean = np.asarray(res.final_state.mean)
        np.testing.assert_allclose(mean.mean(0), np.zeros(2), atol=0.2)
        it = np.asarray(res.final_state.iteration)
        assert (it == it[0]).all() and it[0] == 1 + res.schedule.total_steps


class TestInterface:
    def test_single_chain_unbatched_path(self):
        res = sample(MODEL, AdaptiveMetropolis(), 200, key=5,
                     initial_params=jnp.zeros(2))
        assert np.asarray(res.transitions.lp).shape == (200,)
        assert np.isfinite(np.asarray(res.transitions.lp)).all()

    def test_resume_bit_exact(self):
        """Checkpoint/resume: 100+100 resumed equals 200 straight (the state
        pytree carries mean/L/iteration, so the adaptation continues
        seamlessly)."""
        spl = AdaptiveMetropolis()
        full = sample(MODEL, spl, 200, key=6, num_chains=4,
                      initial_params=jnp.zeros(2), discard_initial=1)
        p1 = sample(MODEL, spl, 100, key=6, num_chains=4,
                    initial_params=jnp.zeros(2), discard_initial=1)
        p2 = sample(MODEL, spl, 100, key=6, num_chains=4,
                    initial_state=p1.final_state,
                    iteration_offset=p1.schedule.total_steps,
                    discard_initial=1)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.params)[:, 100:],
            np.asarray(p2.transitions.params),
        )

    def test_needs_dimension(self):
        with pytest.raises(ValueError, match="dimension"):
            sample(DensityModel(lambda t: -jnp.sum(t**2)),
                   AdaptiveMetropolis(), 10, key=7)

    def test_support_guarded_model(self):
        """AM on the README (μ, σ) model: the -inf support guard must not
        derail adaptation."""
        data = jnp.asarray(
            np.random.default_rng(1234).normal(size=300), jnp.float32
        )
        ld = guarded_logdensity(
            support_fn=lambda t: t[1] >= 0,
            logdensity_fn=lambda t: jnp.sum(
                Normal(t[0], t[1]).log_prob(data)
            ),
            safe_params_fn=lambda t: jnp.stack(
                [t[0], jnp.maximum(t[1], 0.1)]
            ),
        )
        model = DensityModel(ld, dimension=2)
        res = sample(model, AdaptiveMetropolis(), 3000, key=8, num_chains=32,
                     initial_params=jnp.asarray([0.0, 1.0]),
                     discard_initial=1000)
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        assert abs(x[:, 0].mean()) < 0.1
        assert abs(x[:, 1].mean() - 1.0) < 0.1


class TestPooledAdaptation:
    """pooled=True: cross-chain Welford merge (SURVEY §2 'cross-chain
    adaptation stats over collectives'). All chains feed one shared Σ, so it
    converges measurably faster than per-chain at an equal step budget."""

    def _corr_model(self, d=6, rho=0.5):
        C = rho * np.ones((d, d), np.float32) + (1 - rho) * np.eye(
            d, dtype=np.float32
        )
        return correlated_gaussian_model(jnp.asarray(C)), C

    def test_pooled_beats_per_chain_at_equal_budget(self):
        model, SIG = self._corr_model()
        kw = dict(key=0, num_chains=128, initial_params=jnp.zeros(6),
                  vectorized=True)
        pooled = sample(model, AdaptiveMetropolis(pooled=True), 150, **kw)
        per = sample(model, AdaptiveMetropolis(), 150, **kw)

        def cov_err(L):
            C = L @ np.swapaxes(L, -1, -2)
            # scale-free comparison: normalize by trace
            C = C / np.trace(C, axis1=-2, axis2=-1)[..., None, None]
            T = SIG / np.trace(SIG)
            return np.abs(C - T).max(axis=(-2, -1))

        err_pooled = cov_err(np.asarray(pooled.final_state.L)[0])
        err_per = cov_err(np.asarray(per.final_state.L)).mean()
        assert err_pooled < err_per

    def test_pooled_moments_replicated_and_counted(self):
        model, _ = self._corr_model()
        res = sample(
            model, AdaptiveMetropolis(pooled=True), 50, key=1,
            num_chains=16, initial_params=jnp.zeros(6), vectorized=True,
        )
        L = np.asarray(res.final_state.L)
        np.testing.assert_array_equal(L, np.broadcast_to(L[0], L.shape))
        # iteration counts observations: 1 (init) + 16 per step × 49 steps
        # (sample 1 is the init state; 49 further steps emit samples 2..50)
        assert int(res.final_state.iteration[0]) == 1 + 16 * 49

    def test_pooled_posterior_moments_correct(self):
        """Pooling must not bias the posterior (adaptation stays
        diminishing: C·1/n weighting)."""
        res = sample(
            MODEL, AdaptiveMetropolis(pooled=True), 2000, key=2,
            num_chains=64, initial_params=jnp.zeros(2), num_warmup=1000,
            discard_initial=1000, vectorized=True,
        )
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(x.mean(0), np.zeros(2), atol=0.1)
        np.testing.assert_allclose(np.cov(x.T), np.asarray(COV), rtol=0.2)

    def test_pooled_dram(self):
        from advancedmh_tpu import DRAM

        res = sample(
            MODEL, DRAM(pooled=True), 1500, key=3, num_chains=64,
            initial_params=jnp.zeros(2), num_warmup=500,
            discard_initial=500, vectorized=True,
        )
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(x.T), np.asarray(COV), rtol=0.2)
        L = np.asarray(res.final_state.L)
        np.testing.assert_array_equal(L, np.broadcast_to(L[0], L.shape))

"""DRAM (Haario et al. 2006) tests: delayed rejection × adaptive covariance.

The DRAM-specific property: from a *badly mis-scaled start* the sampler
must (a) keep moving through the timid stage while the covariance estimate
is still wrong, and (b) end up with proposals matched to the target
covariance — checked against plain AM started the same way.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import DRAM, DensityModel, sample
from advancedmh_tpu.models.targets import gaussian_mean_scale_model

COV = np.array([[4.0, 1.8], [1.8, 1.0]], np.float32)
PREC = jnp.asarray(np.linalg.inv(COV))
CORR_MODEL = DensityModel(lambda th: -0.5 * th @ PREC @ th, dimension=2)


class TestPosterior:
    def test_correlated_covariance_recovery(self):
        res = sample(
            CORR_MODEL, DRAM(), 4000, key=0, num_chains=128,
            initial_params=jnp.zeros(2), discard_initial=1500,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(
            np.cov(draws.T), COV, atol=0.25 * float(COV.max())
        )

    def test_readme_model_moments(self):
        model = gaussian_mean_scale_model(n_obs=300)
        res = sample(
            model, DRAM(), 3000, key=1, num_chains=64,
            initial_params=jnp.asarray([0.0, 1.0]), discard_initial=1000,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        assert abs(draws[:, 0].mean()) < 0.1
        assert abs(draws[:, 1].mean() - 1.0) < 0.1

    def test_single_chain_step_path(self):
        res = sample(
            CORR_MODEL, DRAM(), 30000, key=2,
            initial_params=jnp.zeros(2), discard_initial=5000,
        )
        draws = np.asarray(res.transitions.params)
        np.testing.assert_allclose(
            np.cov(draws.T), COV, atol=0.3 * float(COV.max())
        )


class TestMechanics:
    def test_adapted_l_tracks_target(self):
        """After adaptation, (opt_scale/√d)²·LLᵀ ∝ the target covariance —
        the learned factor is the chain's empirical covariance."""
        res = sample(
            CORR_MODEL, DRAM(), 3000, key=3, num_chains=64,
            initial_params=jnp.zeros(2), discard_initial=0,
        )
        L = np.asarray(res.final_state.L)  # (C, d, d)
        sigma = np.einsum("cij,ckj->cik", L, L).mean(axis=0)
        # proportional: compare correlation and the variance ratio
        corr = sigma[0, 1] / np.sqrt(sigma[0, 0] * sigma[1, 1])
        corr_true = COV[0, 1] / np.sqrt(COV[0, 0] * COV[1, 1])
        assert abs(corr - corr_true) < 0.12
        assert abs(sigma[0, 0] / sigma[1, 1] - COV[0, 0] / COV[1, 1]) < 1.2

    def test_stage2_keeps_chain_moving_early(self):
        """With a hopeless C₀ (fixed_scale 30 → bold stage ~never accepted
        pre-adaptation), the γ-stage keeps acceptance alive."""
        spl = DRAM(fixed_scale=30.0, gamma=0.02)
        res = sample(
            CORR_MODEL, spl, 200, key=4, num_chains=256,
            initial_params=jnp.zeros(2), discard_initial=0,
        )
        acc = np.asarray(res.transitions.accepted)[:50].mean()
        assert acc > 0.15  # plain AM at scale 30 would be ≈ 0

    def test_bad_gamma_raises(self):
        with pytest.raises(ValueError, match="gamma"):
            DRAM(gamma=1.5)

    def test_resume_state_roundtrip(self):
        """The AM-shaped state resumes bit-exactly through initial_state."""
        kw = dict(key=5, num_chains=8, initial_params=jnp.zeros(2))
        full = sample(CORR_MODEL, DRAM(), 150, **kw)
        part1 = sample(CORR_MODEL, DRAM(), 100, **kw)
        part2 = sample(
            CORR_MODEL, DRAM(), 50, key=5, num_chains=8,
            initial_state=part1.final_state,
            iteration_offset=part1.schedule.total_steps,
            discard_initial=1,  # first kept sample = one step after resume
        )
        lp_split = np.concatenate(
            [np.asarray(part1.transitions.lp), np.asarray(part2.transitions.lp)],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.transitions.lp), lp_split)

"""Robust Adaptive Metropolis tests.

≙ reference src/RobustAdaptiveMetropolis.jl jldoctest (covariance recovery)
and test/RobustAdaptiveMetropolis.jl (eigenvalue-bound clamping via collected
states), plus correctness of the hand-written rank-1 Cholesky kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    DensityModel,
    MvNormal,
    RobustAdaptiveMetropolis,
    sample,
)
from advancedmh_tpu.ops import chol_rank1_update, chol_rank1_update_batched


class TestCholRank1:
    @pytest.mark.parametrize("d", [2, 3, 8, 16])
    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_matches_direct_cholesky(self, d, sign):
        rng = np.random.default_rng(d)
        A = rng.normal(size=(d, d))
        A = A @ A.T + d * np.eye(d)
        L = np.linalg.cholesky(A)
        v = 0.3 * rng.normal(size=d)  # small enough that downdate stays PD
        target = A + sign * np.outer(v, v)
        L_new, ok = chol_rank1_update(
            jnp.asarray(L, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.asarray(sign, jnp.float32),
        )
        assert bool(ok)
        np.testing.assert_allclose(
            np.asarray(L_new) @ np.asarray(L_new).T, target, rtol=2e-4, atol=2e-4
        )
        # stays lower triangular with positive diagonal
        assert np.allclose(np.triu(np.asarray(L_new), 1), 0.0)
        assert (np.diag(np.asarray(L_new)) > 0).all()

    def test_failed_downdate_flags_not_ok(self):
        L = jnp.eye(2)
        v = jnp.asarray([2.0, 0.0])  # I - vv' is indefinite
        _, ok = chol_rank1_update(L, v, jnp.asarray(-1.0))
        assert not bool(ok)

    def test_batched(self):
        rng = np.random.default_rng(0)
        B, d = 5, 4
        A = rng.normal(size=(B, d, d))
        A = A @ np.swapaxes(A, 1, 2) + d * np.eye(d)
        L = np.linalg.cholesky(A)
        v = 0.2 * rng.normal(size=(B, d))
        signs = np.array([1.0, -1.0, 1.0, -1.0, 1.0])
        L_new, ok = chol_rank1_update_batched(
            jnp.asarray(L, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.asarray(signs, jnp.float32),
        )
        assert np.asarray(ok).all()
        for b in range(B):
            target = A[b] + signs[b] * np.outer(v[b], v[b])
            got = np.asarray(L_new[b]) @ np.asarray(L_new[b]).T
            np.testing.assert_allclose(got, target, rtol=3e-4, atol=3e-4)


def _gaussian_model(cov):
    cov = jnp.asarray(cov, jnp.float32)
    mv = MvNormal.from_cov(jnp.zeros(cov.shape[0]), cov)
    return DensityModel(mv.log_prob, dimension=cov.shape[0])


class TestRAMSampling:
    def test_covariance_recovery(self):
        """≙ the RAM jldoctest (src/RobustAdaptiveMetropolis.jl:17-56):
        correlated 2-D Gaussian, cov(chain) ≈ Σ rtol 0.2."""
        SIG = np.array([[1.0, 0.5], [0.5, 1.0]], dtype=np.float32)
        res = sample(
            _gaussian_model(SIG), RobustAdaptiveMetropolis(), 4000, key=0,
            num_chains=4, num_warmup=4000, initial_params=jnp.zeros(2),
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        got = np.cov(draws.T)
        np.testing.assert_allclose(got, SIG, rtol=0.2, atol=0.1)

    def test_covariance_recovery_with_eig_bounds(self):
        """≙ second jldoctest: bounds (0.1, 2.0) still recover Σ."""
        SIG = np.array([[1.0, 0.5], [0.5, 1.0]], dtype=np.float32)
        spl = RobustAdaptiveMetropolis(
            eigenvalue_lower_bound=0.1, eigenvalue_upper_bound=2.0
        )
        res = sample(
            _gaussian_model(SIG), spl, 4000, key=1,
            num_chains=4, num_warmup=4000, initial_params=jnp.zeros(2),
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        assert np.linalg.norm(np.cov(draws.T) - SIG) < 0.25

    @pytest.mark.parametrize(
        "sigma2,hits", [(10.0, "upper"), (0.01, "lower")]
    )
    def test_eigenvalue_bounds(self, sigma2, hits):
        """≙ test/RobustAdaptiveMetropolis.jl:32-70: aggressive adaptation
        with bounds [0.9, 1.1]; adapted-S eigenvalues stay within bounds and
        the active bound is hit."""
        rho = sigma2 / 2.0
        SIG = np.array([[sigma2, rho], [rho, sigma2]], dtype=np.float32)
        spl = RobustAdaptiveMetropolis(
            gamma=0.51, eigenvalue_lower_bound=0.9, eigenvalue_upper_bound=1.1
        )
        num_warmup = 1000
        res = sample(
            _gaussian_model(SIG), spl, num_warmup, key=2,
            num_warmup=num_warmup, discard_initial=0,
            initial_params=jnp.zeros(2), collect_states=True,
        )
        S_hist = np.asarray(res.states.S)  # (num_warmup, 2, 2)
        # triangular factor → eigenvalues are the diagonal
        eigs = np.stack([np.diag(S) for S in S_hist])
        assert (eigs >= 0.9 - 1e-5).all()
        assert (eigs <= 1.1 + 1e-5).all()
        if hits == "upper":
            assert np.isclose(eigs.max(0), 1.1, atol=0.05).all()
        else:
            assert np.isclose(eigs.min(0), 0.9, atol=0.05).all()

    def test_wrong_size_S_raises(self):
        """≙ src/RobustAdaptiveMetropolis.jl:201-204."""
        spl = RobustAdaptiveMetropolis(S=np.eye(3))
        with pytest.raises(ValueError, match="wrong dimensionality"):
            sample(_gaussian_model(np.eye(2)), spl, 10, key=3,
                   initial_params=jnp.zeros(2))

    def test_S_frozen_after_warmup(self):
        SIG = np.eye(2, dtype=np.float32)
        res = sample(
            _gaussian_model(SIG), RobustAdaptiveMetropolis(), 50, key=4,
            num_warmup=100, discard_initial=100, collect_states=True,
            initial_params=jnp.zeros(2),
        )
        S_hist = np.asarray(res.states.S)  # post-warmup states only
        np.testing.assert_array_equal(
            S_hist, np.broadcast_to(S_hist[:1], S_hist.shape)
        )

    def test_init_without_params_uses_model_dimension(self):
        res = sample(
            _gaussian_model(np.eye(2)), RobustAdaptiveMetropolis(), 10, key=5
        )
        assert np.asarray(res.transitions.params).shape == (10, 2)

    def test_logalpha_bounded_at_zero(self):
        res = sample(
            _gaussian_model(np.eye(2)), RobustAdaptiveMetropolis(), 200, key=6,
            collect_states=True, initial_params=jnp.zeros(2),
        )
        assert (np.asarray(res.states.logalpha) <= 0.0).all()


class TestPooledRAM:
    """pooled=True: one shared S adapted by all chains per warmup step (the
    rank-C Vihola update; SURVEY §2 'psum for RAM cross-chain adaptation
    stats')."""

    def test_pooled_shape_converges_faster(self):
        d = 4
        C = 0.5 * np.ones((d, d), np.float32) + 0.5 * np.eye(d, dtype=np.float32)
        from advancedmh_tpu.models.targets import correlated_gaussian_model

        model = correlated_gaussian_model(jnp.asarray(C))
        kw = dict(key=0, num_chains=128, num_warmup=200, discard_initial=200,
                  initial_params=jnp.zeros(d), vectorized=True)
        pooled = sample(model, RobustAdaptiveMetropolis(pooled=True), 10, **kw)
        per = sample(model, RobustAdaptiveMetropolis(), 10, **kw)

        def shape_err(S):
            M = S @ np.swapaxes(S, -1, -2)
            M = M / np.trace(M, axis1=-2, axis2=-1)[..., None, None]
            T = C / np.trace(C)
            return np.abs(M - T).max(axis=(-2, -1))

        err_pooled = shape_err(np.asarray(pooled.final_state.S)[0])
        err_per = shape_err(np.asarray(per.final_state.S)).mean()
        assert err_pooled < err_per
        # shared S stays replicated across the chain axis
        S = np.asarray(pooled.final_state.S)
        np.testing.assert_array_equal(S, np.broadcast_to(S[0], S.shape))

    def test_pooled_acceptance_near_target(self):
        from advancedmh_tpu.models.targets import correlated_gaussian_model

        C = np.asarray([[2.0, 0.8], [0.8, 1.0]], np.float32)
        model = correlated_gaussian_model(jnp.asarray(C))
        res = sample(
            model, RobustAdaptiveMetropolis(pooled=True), 2000, key=1,
            num_chains=64, num_warmup=1000, discard_initial=1000,
            initial_params=jnp.zeros(2), vectorized=True,
        )
        acc = float(np.asarray(res.transitions.accepted).mean())
        assert abs(acc - 0.234) < 0.08
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(x.T), C, rtol=0.2)

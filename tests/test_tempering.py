"""Replica-exchange (parallel tempering) meta-sampler.

Beyond-parity feature (samplers/tempering.py): the canonical validation is
a well-separated bimodal target, where single-temperature random walks get
stuck in one mode and tempering restores mode hopping through the swap
ladder.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    DensityModel,
    MALA,
    MvNormal,
    Normal,
    ReplicaExchange,
    RWMH,
    sample,
    swap_rates,
)

# Equal-weight mixture of N(−5, 1) and N(+5, 1): ~8σ mode separation.
def _bimodal(x):
    x = jnp.reshape(x, ())
    return jnp.logaddexp(
        Normal(-5.0, 1.0).log_prob(x), Normal(5.0, 1.0).log_prob(x)
    ) - jnp.log(2.0)


MODEL = DensityModel(_bimodal, dimension=1)
BETAS = (1.0, 0.55, 0.3, 0.15, 0.05)


class TestReplicaExchange:
    def test_bimodal_mode_hopping(self):
        """PT recovers both modes (mean ≈ 0, every chain visits both); the
        same inner RWMH without tempering never leaves its starting mode
        (scale 0.5 vs an 8σ barrier)."""
        inner = RWMH(Normal(0.0, 0.5))
        pt = ReplicaExchange(inner, betas=BETAS)
        res = sample(
            MODEL, pt, 4000, key=0, num_chains=16, discard_initial=500,
            initial_params=jnp.asarray(-5.0),
        )
        draws = np.asarray(res.transitions.params)  # (chains, samples)
        frac_right = (draws > 0).mean(axis=1)
        assert 0.3 < float(frac_right.mean()) < 0.7
        assert (frac_right > 0.02).all()  # every chain crossed the barrier
        assert abs(float(draws.mean())) < 1.0

        plain = sample(
            MODEL, inner, 4000, key=0, num_chains=16, discard_initial=500,
            initial_params=jnp.asarray(-5.0),
        )
        pd = np.asarray(plain.transitions.params).ravel()
        assert (pd > 0).mean() < 0.02  # stuck in the starting mode
        assert pd.mean() < -3.0

    def test_swap_rates_observed(self):
        pt = ReplicaExchange(RWMH(Normal(0.0, 1.0)), betas=BETAS)
        res = sample(
            MODEL, pt, 1000, key=1, num_chains=8,
            initial_params=jnp.asarray(-5.0),
        )
        rates = np.asarray(swap_rates(res.final_state))  # (chains, K-1)
        assert rates.shape == (8, len(BETAS) - 1)
        assert (rates > 0.02).all() and (rates < 0.98).all()

    def test_cold_chain_lp_is_untempered(self):
        pt = ReplicaExchange(RWMH(Normal(0.0, 1.0)), betas=(1.0, 0.5))
        res = sample(
            MODEL, pt, 50, key=2, num_chains=4,
            initial_params=jnp.asarray(-5.0),
        )
        params = np.asarray(res.transitions.params)
        lp = np.asarray(res.transitions.lp)
        want = np.vectorize(lambda v: float(_bimodal(jnp.asarray(v))))(params)
        np.testing.assert_allclose(lp, want, rtol=1e-4, atol=1e-4)

    def test_mala_inner_gradient_retempered(self):
        """MALA as the inner sampler: swapped gradients are rescaled to the
        receiving temperature, so drifts stay consistent and the posterior
        is still correct on a unimodal check target."""
        m = DensityModel(
            MvNormal.from_cov(jnp.zeros(2), jnp.asarray(
                [[1.0, 0.5], [0.5, 1.0]], jnp.float32)).log_prob,
            dimension=2,
        )
        pt = ReplicaExchange(MALA.langevin(0.4), betas=(1.0, 0.5))
        res = sample(
            m, pt, 3000, key=3, num_chains=32, discard_initial=500,
            initial_params=jnp.zeros(2),
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(draws.mean(0), np.zeros(2), atol=0.07)
        np.testing.assert_allclose(
            np.cov(draws.T), [[1.0, 0.5], [0.5, 1.0]], atol=0.12
        )

    def test_composes_with_sharded_chains(self):
        """PT chains shard over the device mesh like any sampler (replica
        axis stays on-device; zero collectives)."""
        from advancedmh_tpu import MCMCDistributed

        pt = ReplicaExchange(RWMH(Normal(0.0, 0.5)), betas=BETAS)
        res = sample(
            MODEL, pt, 500, key=4, num_chains=8,
            chain_method=MCMCDistributed(), discard_initial=100,
            initial_params=jnp.asarray(-5.0),
        )
        assert np.asarray(res.transitions.params).shape == (8, 500)
        assert np.isfinite(np.asarray(res.transitions.lp)).all()

    def test_validation(self):
        inner = RWMH(Normal(0.0, 1.0))
        with pytest.raises(ValueError, match="cold"):
            ReplicaExchange(inner, betas=(0.9, 0.5))
        with pytest.raises(ValueError, match="descending"):
            ReplicaExchange(inner, betas=(1.0, 0.5, 0.5))
        with pytest.raises(ValueError, match="at least 2"):
            ReplicaExchange(inner, betas=(1.0,))
        with pytest.raises(ValueError, match="replica_scales"):
            ReplicaExchange(inner, betas=BETAS, replica_scales=(1.0, 2.0))
        with pytest.raises(ValueError, match="positive"):
            ReplicaExchange(
                inner, betas=(1.0, 0.5), replica_scales=(1.0, -1.0)
            )
        from advancedmh_tpu import MALA

        with pytest.raises(ValueError, match="random-walk"):
            ReplicaExchange(
                MALA.langevin(0.1), betas=(1.0, 0.5),
                replica_scales=(1.0, 2.0),
            )

    def test_replica_scales_mode_hopping(self):
        """Per-replica β^{-1/2} step sizes keep hot replicas mixing and the
        cold chain still targets the exact posterior."""
        pt = ReplicaExchange(
            RWMH(Normal(0.0, 0.5)), betas=BETAS,
            replica_scales=ReplicaExchange.geometric_scales(BETAS),
        )
        res = sample(
            MODEL, pt, 3000, key=7, num_chains=16, discard_initial=500,
            initial_params=jnp.asarray(-5.0),
        )
        draws = np.asarray(res.transitions.params)
        frac_right = (draws > 0).mean(axis=1)
        assert 0.3 < float(frac_right.mean()) < 0.7
        assert abs(float(draws.mean())) < 1.0
        # cold-chain lp stays the untempered density
        lp = np.asarray(res.transitions.lp)
        want = np.vectorize(lambda v: float(_bimodal(jnp.asarray(v))))(draws)
        np.testing.assert_allclose(lp, want, rtol=1e-4, atol=1e-4)


class TestTuneBetas:
    def test_moves_spacings_toward_target(self):
        from advancedmh_tpu import tune_betas

        betas = (1.0, 0.5, 0.25)
        # first pair swaps far above target → its spacing must widen
        # (β₁ drops); second pair far below → spacing shrinks (β₂ rises
        # relative to β₁'s drop)
        new = tune_betas(betas, [0.9, 0.05], target=0.3)
        assert new[0] == 1.0
        assert new[1] < 0.5  # widened gap
        rho_old = np.diff(-np.log(np.asarray(betas)))
        rho_new = np.diff(-np.log(np.asarray(new)))
        assert rho_new[0] > rho_old[0]
        assert rho_new[1] < rho_old[1]
        # stays a valid ladder
        assert all(b2 < b1 for b1, b2 in zip(new, new[1:]))
        assert all(b > 0 for b in new)

    def test_fixed_point_at_target(self):
        from advancedmh_tpu import tune_betas

        betas = (1.0, 0.4, 0.1)
        new = tune_betas(betas, [0.3, 0.3], target=0.3)
        np.testing.assert_allclose(new, betas, rtol=1e-12)

    def test_shape_validation(self):
        from advancedmh_tpu import tune_betas

        with pytest.raises(ValueError, match="shape"):
            tune_betas((1.0, 0.5), [0.3, 0.3])

"""Vectorized (chain-batched kernel) path: correctness vs the vmapped path.

The vectorized path is equal to vmap-of-single-chain *in distribution* (the
RNG streams differ: one key per step vs one per chain-step), so these tests
check posterior moments and structural invariants, plus exact-resume within
the vectorized path itself.
"""
import jax
import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import (
    MALA,
    MCMCDistributed,
    MvNormal,
    Normal,
    RWMH,
    RobustAdaptiveMetropolis,
    StaticMH,
    sample,
)
from advancedmh_tpu.models.density import DensityModel
from tests.test_mh import MODEL


class TestVectorizedMH:
    def test_moments_match_reference_tolerance(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        c = sample(MODEL, spl, 3000, key=0, num_chains=32, discard_initial=500,
                   chain_type="chains", param_names=["μ", "σ"])  # vectorized default
        assert abs(float(c["μ"].mean())) < 0.1
        assert abs(float(c["σ"].mean()) - 1.0) < 0.1

    def test_vectorized_flag_paths_agree_statistically(self):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(num_chains=32, discard_initial=500,
                  initial_params=jnp.asarray([0.0, 1.0]),
                  chain_type="chains", param_names=["μ", "σ"])
        c_vec = sample(MODEL, spl, 2000, key=1, vectorized=True, **kw)
        c_map = sample(MODEL, spl, 2000, key=1, vectorized=False, **kw)
        assert abs(float(c_vec["μ"].mean()) - float(c_map["μ"].mean())) < 0.05
        assert abs(float(c_vec["σ"].mean()) - float(c_map["σ"].mean())) < 0.05

    def test_vectorized_resume_bit_exact(self):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=3, num_chains=8, initial_params=jnp.asarray([0.0, 1.0]))
        full = sample(MODEL, spl, 100, **kw)
        p1 = sample(MODEL, spl, 50, **kw)
        p2 = sample(MODEL, spl, 50, key=3, num_chains=8,
                    initial_state=p1.final_state,
                    iteration_offset=p1.schedule.total_steps, discard_initial=1)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp),
            np.concatenate([np.asarray(p1.transitions.lp),
                            np.asarray(p2.transitions.lp)], axis=1),
        )


class TestVectorizedMALA:
    def test_moments(self):
        s2 = 1e-3
        spl = MALA(lambda g: MvNormal(s2 / 2.0 * g, scale=jnp.sqrt(s2)))
        c = sample(MODEL, spl, 2000, key=4, num_chains=16,
                   initial_params=jnp.ones(2), discard_initial=500,
                   chain_type="chains", param_names=["μ", "σ"])
        assert abs(float(c["μ"].mean())) < 0.1
        assert abs(float(c["σ"].mean()) - 1.0) < 0.1


class TestVectorizedRAM:
    def test_covariance_recovery(self):
        SIG = np.array([[1.0, 0.5], [0.5, 1.0]], dtype=np.float32)
        mv = MvNormal.from_cov(jnp.zeros(2), jnp.asarray(SIG))
        model = DensityModel(mv.log_prob, dimension=2)
        res = sample(model, RobustAdaptiveMetropolis(), 3000, key=5,
                     num_chains=8, num_warmup=3000, initial_params=jnp.zeros(2))
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(draws.T), SIG, rtol=0.2, atol=0.1)

    def test_eigenvalue_bounds_batched(self):
        SIG = np.array([[10.0, 5.0], [5.0, 10.0]], dtype=np.float32)
        mv = MvNormal.from_cov(jnp.zeros(2), jnp.asarray(SIG))
        model = DensityModel(mv.log_prob, dimension=2)
        spl = RobustAdaptiveMetropolis(
            gamma=0.51, eigenvalue_lower_bound=0.9, eigenvalue_upper_bound=1.1
        )
        res = sample(model, spl, 500, key=6, num_chains=4, num_warmup=500,
                     discard_initial=0, initial_params=jnp.zeros(2),
                     collect_states=True)
        S_hist = np.asarray(res.states.S)  # (chains, n, 2, 2)
        diags = np.diagonal(S_hist, axis1=-2, axis2=-1)
        assert (diags >= 0.9 - 1e-5).all() and (diags <= 1.1 + 1e-5).all()
        assert np.isclose(diags.max(axis=1), 1.1, atol=0.05).all()


class TestVectorizedFunctionalProposal:
    def test_state_dependent_proposal(self):
        from advancedmh_tpu import MetropolisHastings, RandomWalkProposal

        m = DensityModel(lambda x: Normal(0.0, 1.0).log_prob(x))
        # state-dependent increment scale (traced through the batch); the
        # proposal is asymmetric, so this also exercises the batched
        # functional Hastings correction.
        spl = MetropolisHastings(
            RandomWalkProposal(lambda t=0.0: Normal(0.0, 0.5 + 0.1 * jnp.tanh(t)))
        )
        c = sample(m, spl, 2000, key=7, num_chains=32, discard_initial=200,
                   chain_type="chains")
        assert abs(float(c.values.mean())) < 0.1

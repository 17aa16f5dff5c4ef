"""Delayed-rejection MH (Mira 2001) tests.

Beyond-parity sampler. The sharp check is *exactness of the stage-2
correction*: a deliberately mis-scaled bold first stage forces most moves
through the second stage, where a wrong (1−α₁) ratio or a missing q₁ cross
term shows up immediately as biased moments.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    DelayedRejection,
    DensityModel,
    MetropolisHastings,
    MvNormal,
    Normal,
    RandomWalkProposal,
    StaticProposal,
    sample,
)
from advancedmh_tpu.models.targets import gaussian_mean_scale_model


def _dr(scale1, scale2, d=2):
    return DelayedRejection(
        RandomWalkProposal(MvNormal(jnp.zeros(d), scale=scale1), symmetric=True),
        RandomWalkProposal(MvNormal(jnp.zeros(d), scale=scale2), symmetric=True),
    )


class TestPosterior:
    def test_readme_model_moments(self):
        # 300 obs ≙ test/runtests.jl:22-31, where mean μ ≈ 0, σ ≈ 1 within 0.1
        model = gaussian_mean_scale_model(n_obs=300)
        res = sample(
            model, _dr(0.7, 0.12), 2000, key=0, num_chains=64,
            initial_params=jnp.asarray([0.0, 1.0]), discard_initial=500,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        assert abs(draws[:, 0].mean()) < 0.1
        assert abs(draws[:, 1].mean() - 1.0) < 0.1

    def test_stage2_correction_exact(self):
        """Bold stage 1 (scale 8: ~never accepted) funnels nearly every
        accepted move through stage 2 — the composite must still sample the
        correlated Gaussian exactly."""
        cov = np.array([[1.5, 0.9], [0.9, 1.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))
        model = DensityModel(lambda th: -0.5 * th @ prec @ th, dimension=2)
        res = sample(
            model, _dr(8.0, 0.8), 4000, key=1, num_chains=256,
            initial_params=jnp.zeros(2), discard_initial=1000,
        )
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        np.testing.assert_allclose(draws.mean(axis=0), 0.0, atol=0.05)
        np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.12)

    def test_single_chain_step_path(self):
        """The unbatched step (no num_chains) runs the same math."""
        model = DensityModel(
            lambda th: Normal(0.0, 1.0).log_prob(th[0]), dimension=1
        )
        res = sample(
            model, _dr(2.5, 0.5, d=1), 20000, key=2,
            initial_params=jnp.zeros(1), discard_initial=2000,
        )
        x = np.asarray(res.transitions.params).ravel()
        assert abs(x.mean()) < 0.06
        assert abs(x.var() - 1.0) < 0.12


class TestMechanics:
    def test_second_stage_rescues_acceptance(self):
        """With a hopeless bold scale, plain MH barely moves while DR keeps
        a healthy acceptance rate through the timid stage."""
        model = gaussian_mean_scale_model()
        bold = MetropolisHastings(
            RandomWalkProposal(MvNormal(jnp.zeros(2), scale=8.0), symmetric=True)
        )
        kw = dict(
            num_chains=128, initial_params=jnp.asarray([0.0, 1.0]),
            discard_initial=200,
        )
        acc_mh = np.asarray(
            sample(model, bold, 500, key=3, **kw).transitions.accepted
        ).mean()
        acc_dr = np.asarray(
            sample(model, _dr(8.0, 0.2), 500, key=3, **kw).transitions.accepted
        ).mean()
        assert acc_mh < 0.05
        assert acc_dr > 0.2

    def test_asymmetric_second_raises(self):
        with pytest.raises(ValueError, match="symmetric second"):
            DelayedRejection(
                RandomWalkProposal(
                    MvNormal(jnp.zeros(2), scale=1.0), symmetric=True
                ),
                StaticProposal(MvNormal(jnp.zeros(2), scale=1.0)),
            )

    def test_pytree_proposals(self):
        """DR composes over proposal pytrees like MetropolisHastings."""
        model = DensityModel(
            lambda th: Normal(0.0, 1.0).log_prob(th["a"])
            + Normal(2.0, 0.5).log_prob(th["b"])
        )
        first = {
            "a": RandomWalkProposal(Normal(0.0, 1.0), symmetric=True),
            "b": RandomWalkProposal(Normal(0.0, 1.0), symmetric=True),
        }
        second = {
            "a": RandomWalkProposal(Normal(0.0, 0.2), symmetric=True),
            "b": RandomWalkProposal(Normal(0.0, 0.2), symmetric=True),
        }
        spl = DelayedRejection(first, second)
        res = sample(
            model, spl, 3000, key=5, num_chains=32,
            initial_params={"a": jnp.zeros(()), "b": 2.0 * jnp.ones(())},
            discard_initial=500,
        )
        a = np.asarray(res.transitions.params["a"]).ravel()
        b = np.asarray(res.transitions.params["b"]).ravel()
        assert abs(a.mean()) < 0.08
        assert abs(b.mean() - 2.0) < 0.06

"""Discrete distributions + discrete-support MH sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from advancedmh_tpu import (
    DensityModel,
    MetropolisHastings,
    StaticProposal,
    sample,
)
from advancedmh_tpu.distributions import (
    Bernoulli,
    Binomial,
    Categorical,
    DiscreteUniform,
    Geometric,
    Poisson,
)

KEY = jax.random.key(0)


CASES = [
    (Bernoulli(0.3), sps.bernoulli(0.3)),
    (Poisson(4.5), sps.poisson(4.5)),
    (Binomial(10.0, 0.4), sps.binom(10, 0.4)),
    (Geometric(0.3), sps.geom(0.3, loc=-1)),  # failures-before-success
    (DiscreteUniform(2.0, 7.0), sps.randint(2, 8)),
]


@pytest.mark.parametrize("ours,ref", CASES, ids=[type(c[0]).__name__ for c in CASES])
def test_log_prob_matches_scipy(ours, ref):
    x = np.asarray(ref.rvs(size=30, random_state=0), dtype=np.float32)
    got = np.asarray(ours.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref.logpmf(x), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ours,ref", CASES, ids=[type(c[0]).__name__ for c in CASES])
def test_sample_moments(ours, ref):
    xs = np.asarray(ours.sample(KEY, (50_000,)))
    mean, var = ref.stats("mv")
    assert abs(xs.mean() - mean) < 6 * np.sqrt(var / 50_000) + 2e-2
    assert np.allclose(xs, np.round(xs))  # integer-valued


def test_categorical():
    probs = jnp.asarray([0.2, 0.5, 0.3])
    d = Categorical(probs)
    xs = np.asarray(d.sample(KEY, (50_000,)))
    freq = np.bincount(xs.astype(int), minlength=3) / 50_000
    np.testing.assert_allclose(freq, [0.2, 0.5, 0.3], atol=0.01)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray([0.0, 1.0, 2.0]))),
        np.log([0.2, 0.5, 0.3]),
        rtol=1e-5,
    )


def test_discrete_independence_sampler():
    """MH with a discrete static proposal targets a discrete distribution
    (independence sampler over Poisson support)."""
    target = Poisson(3.0)
    model = DensityModel(lambda k: target.log_prob(k))
    spl = MetropolisHastings(StaticProposal(Poisson(5.0)))
    res = sample(model, spl, 3000, key=1, num_chains=16, discard_initial=200)
    draws = np.asarray(res.transitions.params).ravel()
    assert abs(draws.mean() - 3.0) < 0.15
    assert np.allclose(draws, np.round(draws))

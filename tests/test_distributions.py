"""Distribution mini-library: sampling moments + log_prob vs scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from advancedmh_tpu import distributions as d

KEY = jax.random.key(0)
N = 100_000


CASES = [
    (d.Normal(0.5, 2.0), sps.norm(0.5, 2.0)),
    (d.LogNormal(0.2, 0.5), sps.lognorm(s=0.5, scale=np.exp(0.2))),
    (d.Uniform(-1.0, 3.0), sps.uniform(-1.0, 4.0)),
    (d.Exponential(2.0), sps.expon(scale=0.5)),
    (d.Laplace(1.0, 0.7), sps.laplace(1.0, 0.7)),
    (d.Cauchy(0.3, 1.5), sps.cauchy(0.3, 1.5)),
    (d.StudentT(5.0, 1.0, 2.0), sps.t(5.0, 1.0, 2.0)),
    (d.Gamma(3.0, 2.0), sps.gamma(3.0, scale=0.5)),
    (d.InverseGamma(3.0, 2.0), sps.invgamma(3.0, scale=2.0)),
    (d.Beta(2.0, 5.0), sps.beta(2.0, 5.0)),
]


@pytest.mark.parametrize("ours,ref", CASES, ids=[type(c[0]).__name__ for c in CASES])
def test_log_prob_matches_scipy(ours, ref):
    x = np.asarray(ref.rvs(size=50, random_state=123), dtype=np.float64)
    got = np.asarray(ours.log_prob(jnp.asarray(x, jnp.float32)))
    want = ref.logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("ours,ref", CASES, ids=[type(c[0]).__name__ for c in CASES])
def test_sample_moments(ours, ref):
    xs = np.asarray(ours.sample(KEY, (N,)))
    if isinstance(ours, d.Cauchy):
        # no moments; compare median instead
        assert abs(np.median(xs) - ref.median()) < 0.05
        return
    mean, var = ref.stats("mv")
    assert abs(xs.mean() - mean) < 5 * np.sqrt(var / N) + 2e-2
    assert abs(xs.std() - np.sqrt(var)) < 0.05 * np.sqrt(var) + 2e-2


def test_tdist_alias():
    t = d.TDist(3.0)
    assert isinstance(t, d.StudentT)
    x = np.array([0.0, 1.5, -2.0])
    np.testing.assert_allclose(
        np.asarray(t.log_prob(jnp.asarray(x, jnp.float32))),
        sps.t(3.0).logpdf(x),
        rtol=1e-4, atol=1e-4,
    )


class TestMvNormal:
    def test_standard(self):
        mv = d.MvNormal.standard(3)
        x = np.zeros(3)
        np.testing.assert_allclose(
            float(mv.log_prob(jnp.asarray(x, jnp.float32))),
            sps.multivariate_normal(np.zeros(3), np.eye(3)).logpdf(x),
            rtol=1e-5,
        )
        xs = np.asarray(mv.sample(KEY, (100_000,)))
        assert xs.shape == (100_000, 3)
        np.testing.assert_allclose(xs.mean(0), np.zeros(3), atol=0.02)
        np.testing.assert_allclose(np.cov(xs.T), np.eye(3), atol=0.03)

    def test_full_cov(self):
        cov = np.array([[1.5, 0.35], [0.35, 1.0]])
        loc = np.array([1.0, -2.0])
        mv = d.MvNormal.from_cov(jnp.asarray(loc, jnp.float32), jnp.asarray(cov, jnp.float32))
        x = np.array([0.5, 0.5])
        np.testing.assert_allclose(
            float(mv.log_prob(jnp.asarray(x, jnp.float32))),
            sps.multivariate_normal(loc, cov).logpdf(x),
            rtol=1e-4,
        )
        xs = np.asarray(mv.sample(KEY, (200_000,)))
        np.testing.assert_allclose(xs.mean(0), loc, atol=0.02)
        np.testing.assert_allclose(np.cov(xs.T), cov, atol=0.03)

    def test_full_cov_batched_logprob(self):
        """An unbatched scale_tril against chain-batched x (the step_batched
        hot path for full-covariance proposals) must broadcast, not crash."""
        cov = np.array([[1.5, 0.35], [0.35, 1.0]])
        mv = d.MvNormal.from_cov(jnp.zeros(2), jnp.asarray(cov, jnp.float32))
        xs = np.random.default_rng(0).normal(size=(16, 2)).astype(np.float32)
        got = np.asarray(mv.log_prob(jnp.asarray(xs)))
        want = sps.multivariate_normal(np.zeros(2), cov).logpdf(xs)
        np.testing.assert_allclose(got, want, rtol=1e-4)
        # batched against vmap-of-single agree
        single = np.asarray(
            jax.vmap(mv.log_prob)(jnp.asarray(xs))
        )
        np.testing.assert_allclose(got, single, rtol=1e-5)

    def test_diag(self):
        mv = d.MvNormal(loc=jnp.zeros(2), scale_diag=jnp.asarray([0.5, 2.0]))
        x = np.array([0.3, -0.7])
        np.testing.assert_allclose(
            float(mv.log_prob(jnp.asarray(x, jnp.float32))),
            sps.multivariate_normal(np.zeros(2), np.diag([0.25, 4.0])).logpdf(x),
            rtol=1e-4,
        )

    def test_batched_log_prob(self):
        mv = d.MvNormal.standard(2)
        xs = jnp.zeros((5, 2))
        assert mv.log_prob(xs).shape == (5,)


def test_distribution_is_pytree():
    n = d.Normal(jnp.asarray(1.0), jnp.asarray(2.0))
    leaves = jax.tree_util.tree_leaves(n)
    assert len(leaves) == 2

    # traced params flow through jit
    @jax.jit
    def f(loc):
        return d.Normal(loc, 1.0).log_prob(0.0)

    assert np.isfinite(float(f(0.5)))


def test_missing_log_prob_raises():
    class NoLogProb(d.Distribution):
        def sample(self, key, sample_shape=()):
            return jax.random.normal(key, sample_shape)

    with pytest.raises(NotImplementedError):
        NoLogProb().log_prob(0.0)

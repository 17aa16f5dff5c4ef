"""Direct unit tests of the batched (vectorized-path) proposal algebra."""
import jax
import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import (
    InverseGamma,
    MvNormal,
    Normal,
    Poisson,
    RandomWalkProposal,
    StaticProposal,
    logratio_proposal_density,
    propose,
    propose_initial,
    q,
)
from advancedmh_tpu.distributions import Laplace

KEY = jax.random.key(0)
C = 64


class TestBatchedPropose:
    def test_static_scalar(self):
        p = StaticProposal(Normal(2.0, 0.5))
        s = propose(KEY, p, jnp.zeros((C,)), batch_shape=(C,))
        assert s.shape == (C,)
        assert 1.0 < float(s.mean()) < 3.0
        assert float(s.std()) > 0.1  # distinct draws per chain

    def test_rw_vector(self):
        p = RandomWalkProposal(MvNormal.standard(3))
        t = jnp.ones((C, 3))
        s = propose(KEY, p, t, batch_shape=(C,))
        assert s.shape == (C, 3)
        assert not np.allclose(np.asarray(s[0]), np.asarray(s[1]))

    def test_dist_seq_payload(self):
        p = StaticProposal([Normal(0.0, 1.0), InverseGamma(2.0, 3.0)])
        s = propose(KEY, p, jnp.zeros((C, 2)), batch_shape=(C,))
        assert s.shape == (C, 2)
        assert (np.asarray(s[:, 1]) > 0).all()

    def test_functional_resolves_batched(self):
        p = RandomWalkProposal(lambda t=0.0: Normal(0.0, 0.1 + jnp.abs(t)))
        t = jnp.linspace(-1.0, 1.0, C)
        s = propose(KEY, p, t, batch_shape=(C,))
        assert s.shape == (C,)

    def test_tree_container(self):
        p = {"a": StaticProposal(Normal(0.0, 1.0)),
             "b": RandomWalkProposal(Normal(0.0, 0.1))}
        t = {"a": jnp.zeros((C,)), "b": jnp.ones((C,))}
        s = propose(KEY, p, t, batch_shape=(C,))
        assert s["a"].shape == (C,) and s["b"].shape == (C,)
        assert abs(float(s["b"].mean()) - 1.0) < 0.2

    def test_propose_initial_batched(self):
        p = StaticProposal(Normal(0.0, 1.0))
        s = propose_initial(KEY, p, batch_shape=(C,))
        assert s.shape == (C,)


class TestBatchedDensities:
    def test_q_batch_ndim(self):
        p = RandomWalkProposal(Laplace(0.0, 1.0))
        t = jax.random.normal(KEY, (C,))
        tc = jnp.zeros((C,))
        out = q(p, t, tc, batch_ndim=1)
        assert out.shape == (C,)
        want = np.asarray(Laplace(0.0, 1.0).log_prob(t))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)

    def test_logratio_batched_matches_per_chain(self):
        p = (RandomWalkProposal(Laplace(0.3, 1.0)),
             StaticProposal(Normal(0.0, 2.0)))
        s = (jax.random.normal(KEY, (C,)), jax.random.normal(KEY, (C,)) + 1)
        c = (jax.random.normal(jax.random.key(1), (C,)),
             jax.random.normal(jax.random.key(2), (C,)))
        batched = logratio_proposal_density(p, s, c, batch_ndim=1)
        assert batched.shape == (C,)
        for i in range(0, C, 13):
            si = tuple(x[i] for x in s)
            ci = tuple(x[i] for x in c)
            np.testing.assert_allclose(
                float(batched[i]),
                float(logratio_proposal_density(p, si, ci)),
                rtol=1e-4, atol=1e-5,
            )

    def test_symmetric_still_static_zero(self):
        p = RandomWalkProposal(Normal(0.0, 1.0), symmetric=True)
        out = logratio_proposal_density(
            p, jnp.zeros((C,)), jnp.ones((C,)), batch_ndim=1
        )
        assert isinstance(out, float) and out == 0.0


class TestMixedDiscreteContinuousTree:
    def test_sampling_mixed_tree(self):
        """dict proposal mixing a discrete Poisson leaf and a continuous
        Normal leaf — the full generality of the reference's NamedTuple
        containers."""
        from advancedmh_tpu import DensityModel, MetropolisHastings, sample

        target_k = Poisson(3.0)
        model = DensityModel(
            lambda th: target_k.log_prob(th["k"]) + Normal(1.0, 0.5).log_prob(th["x"])
        )
        spl = MetropolisHastings({
            "k": StaticProposal(Poisson(4.0)),
            "x": RandomWalkProposal(Normal(0.0, 0.3)),
        })
        res = sample(model, spl, 3000, key=5, num_chains=8, discard_initial=300)
        ks = np.asarray(res.transitions.params["k"]).ravel()
        xs = np.asarray(res.transitions.params["x"]).ravel()
        assert abs(ks.mean() - 3.0) < 0.2
        assert abs(xs.mean() - 1.0) < 0.1


def test_positional_ensemble_form():
    """≙ reference sample(model, spl, MCMCThreads(), N, nchains)."""
    from advancedmh_tpu import DensityModel, MCMCThreads, StaticMH, sample

    m = DensityModel(lambda x: Normal(0.0, 1.0).log_prob(x))
    res = sample(m, StaticMH(Normal(0.0, 1.0)), MCMCThreads(), 50, 4)
    assert np.asarray(res.transitions.lp).shape == (4, 50)

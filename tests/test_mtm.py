"""Multiple-Try Metropolis tests.

Beyond-parity sampler: posterior moments on the reference fixture model
(≙ test/runtests.jl:22-31 tolerances), the k=1 ≡ plain-MH degeneration,
acceptance monotone in k, and the symmetric-proposal requirement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    DensityModel,
    MultipleTryMetropolis,
    MvNormal,
    Normal,
    RandomWalkProposal,
    SymmetricRandomWalkProposal,
    guarded_logdensity,
    sample,
)

DATA = jnp.asarray(np.random.default_rng(1234).normal(size=300), jnp.float32)
LOGDENSITY = guarded_logdensity(
    support_fn=lambda t: t[1] >= 0,
    logdensity_fn=lambda t: jnp.sum(Normal(t[0], t[1]).log_prob(DATA)),
    safe_params_fn=lambda t: jnp.stack([t[0], jnp.maximum(t[1], 0.1)]),
)
MODEL = DensityModel(LOGDENSITY, dimension=2)


def _proposal(scale):
    return RandomWalkProposal(MvNormal(jnp.zeros(2), scale=scale))


class TestMoments:
    def test_posterior_moments(self):
        spl = MultipleTryMetropolis(_proposal(0.3), k=4)
        res = sample(MODEL, spl, 3000, key=0, num_chains=32,
                     initial_params=jnp.asarray([0.0, 1.0]),
                     discard_initial=500)
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        assert abs(x[:, 0].mean()) < 0.1
        assert abs(x[:, 1].mean() - 1.0) < 0.1

    def test_k1_is_plain_mh(self):
        """k=1 degenerates to standard MH (reference set = {x}) and still
        recovers the posterior."""
        spl = MultipleTryMetropolis(_proposal(0.1), k=1)
        res = sample(MODEL, spl, 4000, key=1, num_chains=32,
                     initial_params=jnp.asarray([0.0, 1.0]),
                     discard_initial=500)
        x = np.asarray(res.transitions.params).reshape(-1, 2)
        assert abs(x[:, 0].mean()) < 0.1
        assert abs(x[:, 1].mean() - 1.0) < 0.1

    def test_acceptance_increases_with_k(self):
        """More tries → higher acceptance at fixed step size — the point of
        MTM (measured here: k=1 → 0.10, k=8 → 0.47 at scale 0.2)."""
        accs = {}
        for k in (1, 8):
            spl = MultipleTryMetropolis(_proposal(0.2), k=k)
            res = sample(MODEL, spl, 1500, key=2, num_chains=64,
                         initial_params=jnp.asarray([0.0, 1.0]),
                         discard_initial=200)
            accs[k] = float(np.asarray(res.transitions.accepted).mean())
        assert accs[8] > accs[1] + 0.1, accs


class TestInterface:
    def test_single_chain_unbatched_path(self):
        spl = MultipleTryMetropolis(_proposal(0.3), k=3)
        res = sample(MODEL, spl, 200, key=3,
                     initial_params=jnp.asarray([0.0, 1.0]))
        lp = np.asarray(res.transitions.lp)
        assert lp.shape == (200,) and np.isfinite(lp).all()

    def test_pytree_proposal(self):
        """Dict-shaped params: candidate/reference batching must thread the
        proposal tree (≙ the reference's NamedTuple proposal containers)."""
        model = DensityModel(
            lambda t: Normal(0.0, 1.0).log_prob(t["a"])
            + Normal(1.0, 2.0).log_prob(t["b"])
        )
        spl = MultipleTryMetropolis(
            {
                "a": RandomWalkProposal(Normal(0.0, 0.5)),
                "b": RandomWalkProposal(Normal(0.0, 0.5)),
            },
            k=4,
        )
        res = sample(model, spl, 2000, key=4, num_chains=32,
                     initial_params={"a": jnp.asarray(0.0),
                                     "b": jnp.asarray(1.0)},
                     discard_initial=500)
        a = np.asarray(res.transitions.params["a"])
        b = np.asarray(res.transitions.params["b"])
        assert abs(a.mean()) < 0.15
        assert abs(b.mean() - 1.0) < 0.3

    def test_asymmetric_proposal_rejected(self):
        with pytest.raises(ValueError, match="symmetric"):
            MultipleTryMetropolis(
                RandomWalkProposal(MvNormal(jnp.ones(2), scale=0.3)), k=4
            )

    def test_symmetric_assertion_accepted(self):
        """A user-asserted SymmetricRandomWalkProposal passes validation even
        when symmetry cannot be proven (≙ the reference's Symmetric* trust
        model, src/proposal.jl:6,16)."""
        MultipleTryMetropolis(
            SymmetricRandomWalkProposal(MvNormal(jnp.ones(2), scale=0.3)), k=4
        )

    def test_k_validation(self):
        with pytest.raises(ValueError, match="k must be"):
            MultipleTryMetropolis(_proposal(0.3), k=0)

    def test_deterministic(self):
        spl = MultipleTryMetropolis(_proposal(0.3), k=4)
        kw = dict(key=5, num_chains=4,
                  initial_params=jnp.asarray([0.0, 1.0]), discard_initial=1)
        r1 = sample(MODEL, spl, 50, **kw)
        r2 = sample(MODEL, spl, 50, **kw)
        np.testing.assert_array_equal(
            np.asarray(r1.transitions.params), np.asarray(r2.transitions.params)
        )

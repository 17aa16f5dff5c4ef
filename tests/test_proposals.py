"""Proposal algebra: composition, symmetric short-circuit, Hastings ratios.

Mirrors reference test/runtests.jl:215-285 ("symmetric proposals" + type
inference checks) and the proposal-styles shape tests (:181-201).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    Cauchy,
    Distribution,
    InverseGamma,
    Laplace,
    MvNormal,
    Normal,
    RandomWalkProposal,
    StaticProposal,
    StudentT,
    SymmetricRandomWalkProposal,
    SymmetricStaticProposal,
    logratio_proposal_density,
    propose,
    propose_initial,
    q,
)
from advancedmh_tpu.utils import pytree_dataclass

KEY = jax.random.key(0)


@pytree_dataclass
class CustomNormal(Distribution):
    """≙ reference test/util.jl CustomNormal: sampleable, but *no* log_prob."""

    m: jax.Array = 0.0

    def sample(self, key, sample_shape=()):
        return self.m + jax.random.normal(key, sample_shape)


class TestShapes:
    def test_scalar(self):
        p = StaticProposal(Normal(0.0, 1.0))
        s = propose_initial(KEY, p)
        assert jnp.shape(s) == ()
        s2 = propose(KEY, p, s)
        assert jnp.shape(s2) == ()

    def test_array_payload(self):
        p = StaticProposal([Normal(0.0, 1.0), InverseGamma(2.0, 3.0)])
        s = propose_initial(KEY, p)
        assert jnp.shape(s) == (2,)
        assert float(s[1]) > 0  # InverseGamma support

    def test_tree_of_proposals(self):
        p = {"a": StaticProposal(Normal(0.0, 1.0)), "b": StaticProposal(InverseGamma(2.0, 3.0))}
        s = propose_initial(KEY, p)
        assert set(s.keys()) == {"a", "b"}
        s2 = propose(KEY, p, s)
        assert set(s2.keys()) == {"a", "b"}

    def test_functional_payload(self):
        p = StaticProposal(lambda x=1.0: Normal(x, 1.0))
        s = propose_initial(KEY, p)
        assert jnp.shape(s) == ()
        s2 = propose(KEY, p, s)
        assert jnp.shape(s2) == ()

    def test_random_walk_adds(self):
        p = RandomWalkProposal(Normal(0.0, 0.0))  # zero-width increment
        s = propose(KEY, p, jnp.asarray(5.0))
        assert float(s) == 5.0

    def test_mvnormal_payload(self):
        p = RandomWalkProposal(MvNormal.standard(3))
        s = propose(KEY, p, jnp.zeros(3))
        assert s.shape == (3,)


class TestSymmetric:
    def test_asymmetric_without_logpdf_raises(self):
        p = RandomWalkProposal(CustomNormal())
        assert not p.symmetric
        with pytest.raises(NotImplementedError):
            logratio_proposal_density(p, jnp.asarray(0.1), jnp.asarray(0.2))

    def test_functional_asymmetric_without_logpdf_raises(self):
        p = StaticProposal(lambda x=0.0: CustomNormal(x))
        with pytest.raises(NotImplementedError):
            logratio_proposal_density(p, jnp.asarray(0.1), jnp.asarray(0.2))

    @pytest.mark.parametrize(
        "p",
        [
            SymmetricRandomWalkProposal(CustomNormal()),
            SymmetricStaticProposal(lambda x=0.0: CustomNormal(x)),
        ],
    )
    def test_symmetric_never_evaluates_q(self, p):
        # scalar, list container, tuple container, dict container — all 0
        assert logratio_proposal_density(p, 0.1, 0.2) == 0.0
        assert logratio_proposal_density([p], [0.1], [0.2]) == 0.0
        assert logratio_proposal_density((p,), (0.1,), (0.2,)) == 0.0
        assert (
            logratio_proposal_density({"x": p}, {"x": 0.1}, {"x": 0.2}) == 0.0
        )

    def test_symmetric_flag_types(self):
        assert SymmetricRandomWalkProposal(CustomNormal()).symmetric
        assert SymmetricStaticProposal(CustomNormal()).symmetric
        assert not RandomWalkProposal(CustomNormal()).symmetric


class TestLogRatio:
    # the 8 proposal kinds of reference test/runtests.jl:262-273
    PROPOSALS = [
        StaticProposal(Normal(0.0, 1.0)),
        StaticProposal(lambda x: Normal(x, 1.0)),
        StaticProposal(Cauchy(0.0, 1.0), symmetric=True),
        StaticProposal(lambda x: Cauchy(x, 2.0), symmetric=True),
        RandomWalkProposal(Laplace(0.0, 1.0)),
        RandomWalkProposal(lambda x: Laplace(x, 1.0)),
        RandomWalkProposal(StudentT(1.0), symmetric=True),
        RandomWalkProposal(lambda x: StudentT(1.0), symmetric=True),
    ]

    def _single(self, p, s, c):
        return float(logratio_proposal_density(p, jnp.asarray(s), jnp.asarray(c)))

    def test_container_consistency(self):
        rng = np.random.default_rng(0)
        states = rng.normal(size=2)
        cands = rng.normal(size=2)
        for p1, p2 in itertools.product(self.PROPOSALS, self.PROPOSALS):
            val = self._single(p1, states[0], cands[0]) + self._single(
                p2, states[1], cands[1]
            )
            # list container
            got_list = logratio_proposal_density(
                [p1, p2], [jnp.asarray(states[0]), jnp.asarray(states[1])],
                [jnp.asarray(cands[0]), jnp.asarray(cands[1])],
            )
            # tuple container
            got_tuple = logratio_proposal_density(
                (p1, p2), (jnp.asarray(states[0]), jnp.asarray(states[1])),
                (jnp.asarray(cands[0]), jnp.asarray(cands[1])),
            )
            # dict container (≙ NamedTuple)
            got_dict = logratio_proposal_density(
                {"x": p1, "y": p2},
                {"x": jnp.asarray(states[0]), "y": jnp.asarray(states[1])},
                {"x": jnp.asarray(cands[0]), "y": jnp.asarray(cands[1])},
            )
            np.testing.assert_allclose(float(got_list), val, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(float(got_tuple), val, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(float(got_dict), val, rtol=1e-5, atol=1e-5)

    def test_static_ratio_formula(self):
        # static: q(prop, state) - q(prop, cand) = logpdf(state) - logpdf(cand)
        p = StaticProposal(Normal(0.0, 1.0))
        s, c = jnp.asarray(0.3), jnp.asarray(-0.4)
        want = float(Normal(0.0, 1.0).log_prob(s) - Normal(0.0, 1.0).log_prob(c))
        np.testing.assert_allclose(
            float(logratio_proposal_density(p, s, c)), want, rtol=1e-5
        )

    def test_rw_asymmetric_ratio_formula(self):
        # rw with asymmetric increment: logpdf(s - c) - logpdf(c - s)
        inc = Laplace(0.5, 1.0)  # asymmetric around 0
        p = RandomWalkProposal(inc)
        s, c = jnp.asarray(0.3), jnp.asarray(-0.4)
        want = float(inc.log_prob(s - c) - inc.log_prob(c - s))
        np.testing.assert_allclose(
            float(logratio_proposal_density(p, s, c)), want, rtol=1e-5
        )

    def test_jit_stable(self):
        """≙ the @inferred type-stability checks: the tree reduces to one
        traced expression with no per-step retracing."""
        p = (self.PROPOSALS[0], self.PROPOSALS[4])
        traces = 0

        @jax.jit
        def f(s, c):
            nonlocal traces
            traces += 1
            return logratio_proposal_density(p, s, c)

        f((jnp.asarray(0.1), jnp.asarray(0.2)), (jnp.asarray(0.3), jnp.asarray(0.4)))
        f((jnp.asarray(0.5), jnp.asarray(0.6)), (jnp.asarray(0.7), jnp.asarray(0.8)))
        assert traces == 1

    def test_all_symmetric_is_static_zero(self):
        p = {"x": self.PROPOSALS[2], "y": self.PROPOSALS[6]}
        out = logratio_proposal_density(
            p, {"x": jnp.asarray(0.1), "y": jnp.asarray(0.2)},
            {"x": jnp.asarray(0.3), "y": jnp.asarray(0.4)},
        )
        assert isinstance(out, float) and out == 0.0

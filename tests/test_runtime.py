"""Runtime semantics: schedule contract, output shapes/names, determinism.

≙ reference test/runtests.jl "MCMCChains" (:113-178), "Proposal styles"
(:181-201), "Initial parameters" (:203-213) testsets and the iteration
bookkeeping of AbstractMCMC.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import (
    Chains,
    DensityModel,
    InverseGamma,
    MetropolisHastings,
    Normal,
    Schedule,
    StaticMH,
    StaticProposal,
    StructArray,
    ess,
    rhat,
    sample,
)
from tests.test_mh import MODEL


class TestSchedule:
    def test_defaults(self):
        s = Schedule(n_samples=100)
        assert s.discard_initial == 0 and s.total_steps == 99

    def test_discard_defaults_to_warmup(self):
        s = Schedule(n_samples=100, num_warmup=50)
        assert s.discard_initial == 50

    def test_iteration_labels(self):
        s = Schedule(n_samples=10_000, discard_initial=25, thinning=4)
        it = s.iterations()
        assert it == range(26, 26 + 4 * 10_000, 4)

    def test_validation(self):
        with pytest.raises(ValueError):
            Schedule(n_samples=0)
        with pytest.raises(ValueError):
            Schedule(n_samples=10, thinning=0)


class TestOutputKeys:
    """≙ "Proposal styles" (:181-201): keys follow the proposal shape."""

    def test_scalar_proposal(self):
        m = DensityModel(lambda x: Normal(x, 1.0).log_prob(1.0))
        c = sample(m, MetropolisHastings(StaticProposal(Normal(0.0, 1.0))),
                   100, key=0, chain_type="namedtuples")
        assert set(c[0].keys()) == {"param_1", "lp"}

    def test_array_proposal(self):
        m = DensityModel(lambda x: Normal(x[0], x[1]).log_prob(1.0))
        c = sample(
            m,
            MetropolisHastings(
                StaticProposal([Normal(0.0, 1.0), InverseGamma(2.0, 3.0)])
            ),
            100, key=0, chain_type="namedtuples",
        )
        assert set(c[0].keys()) == {"param_1", "param_2", "lp"}

    def test_dict_proposal(self):
        m = DensityModel(lambda x: Normal(x["a"], x["b"]).log_prob(1.0))
        c = sample(
            m,
            MetropolisHastings(
                {"a": StaticProposal(Normal(0.0, 1.0)),
                 "b": StaticProposal(InverseGamma(2.0, 3.0))}
            ),
            100, key=0, chain_type="namedtuples",
        )
        assert set(c[0].keys()) == {"a", "b", "lp"}

    def test_functional_proposal(self):
        m = DensityModel(lambda x: Normal(x, 1.0).log_prob(1.0))
        c = sample(
            m, MetropolisHastings(StaticProposal(lambda x=1.0: Normal(x, 1.0))),
            100, key=0, chain_type="namedtuples",
        )
        assert set(c[0].keys()) == {"param_1", "lp"}


class TestInitialParams:
    def test_honored_as_first_sample(self):
        """≙ "Initial parameters" (:203-213)."""
        val = jnp.asarray([0.4, 1.2])
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        res = sample(MODEL, spl, 10, key=0, initial_params=val)
        np.testing.assert_allclose(np.asarray(res.transitions.params)[0], [0.4, 1.2])

    def test_batched_initial_params(self):
        vals = jnp.asarray([[0.1, 1.0], [0.2, 1.1], [0.3, 1.2]])
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        res = sample(
            MODEL, spl, 5, key=0, num_chains=3,
            initial_params=vals, initial_params_batched=True,
        )
        np.testing.assert_allclose(
            np.asarray(res.transitions.params)[:, 0, :], np.asarray(vals)
        )


class TestChainsBundle:
    def test_range_and_shapes(self):
        """≙ "MCMCChains" chain1b (:123-131)."""
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        c = sample(MODEL, spl, 1000, key=0, discard_initial=25, thinning=4,
                   chain_type="chains", param_names=["μ", "σ"])
        assert isinstance(c, Chains)
        assert c.range == range(26, 26 + 4 * 1000, 4)
        assert c.values.shape == (1000, 2, 1)
        assert c.array.shape == (1000, 3, 1)
        assert c.names == ["μ", "σ"]
        assert c.internals == ["lp"]

    def test_lp_column_is_logdensity(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        c = sample(MODEL, spl, 50, key=0, chain_type="chains")
        v = np.asarray(c.values[:, :, 0])
        lp = np.asarray(c.lp[:, 0])
        want = np.array([float(MODEL.logdensity_fn(jnp.asarray(row))) for row in v])
        np.testing.assert_allclose(lp, want, rtol=1e-5)

    def test_chainscat(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        c1 = sample(MODEL, spl, 50, key=0, num_chains=2, chain_type="chains")
        c2 = sample(MODEL, spl, 50, key=1, num_chains=3, chain_type="chains")
        cat = Chains.cat(c1, c2)
        assert cat.n_chains == 5

    def test_structarray(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        sa = sample(MODEL, spl, 50, key=0, chain_type="structarray",
                    param_names=["mu", "sigma"])
        assert isinstance(sa, StructArray)
        assert sa.mu.shape == (50,)
        assert sa.lp.shape == (50,)
        sa2 = sample(MODEL, spl, 50, key=1, chain_type="structarray",
                     param_names=["mu", "sigma"])
        cat = StructArray.cat(sa, sa2)
        assert cat.mu.shape == (100,)


class TestDeterminism:
    def test_same_key_same_chain(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        r1 = sample(MODEL, spl, 100, key=42, num_chains=4)
        r2 = sample(MODEL, spl, 100, key=42, num_chains=4)
        np.testing.assert_array_equal(
            np.asarray(r1.transitions.lp), np.asarray(r2.transitions.lp)
        )

    def test_shard_map_matches_vmap(self):
        """Chain results are independent of the execution layout."""
        from advancedmh_tpu import MCMCDistributed

        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        r1 = sample(MODEL, spl, 50, key=7, num_chains=8)
        r2 = sample(MODEL, spl, 50, key=7, num_chains=8,
                    chain_method=MCMCDistributed())
        np.testing.assert_allclose(
            np.asarray(r1.transitions.lp), np.asarray(r2.transitions.lp),
            rtol=1e-6,
        )


class TestDiagnostics:
    def test_iid_ess_close_to_n(self):
        x = jax.random.normal(jax.random.key(0), (4000, 4))
        e = float(ess(x))
        assert 0.5 * 16000 < e < 1.6 * 16000

    def test_autocorr_time_ar1(self):
        """AR(1) with coefficient φ has τ = (1+φ)/(1−φ) exactly (Sokal
        1997) — φ=0.9 → τ=19; ensemble averaging over 32 walkers keeps the
        FFT estimate tight."""
        from advancedmh_tpu import integrated_autocorr_time

        phi, n, w = 0.9, 20000, 32
        rng = np.random.default_rng(0)
        eps = rng.normal(size=(n, w)).astype(np.float32)
        x = np.zeros((n, w), np.float32)
        for t in range(1, n):
            x[t] = phi * x[t - 1] + eps[t]
        tau = float(integrated_autocorr_time(jnp.asarray(x)))
        assert abs(tau - 19.0) / 19.0 < 0.2

    def test_autocorr_time_white_noise_is_one(self):
        from advancedmh_tpu import integrated_autocorr_time

        x = jax.random.normal(jax.random.key(1), (8000, 8))
        tau = float(integrated_autocorr_time(x))
        assert tau < 1.5

    def test_chains_autocorr_time(self):
        from advancedmh_tpu import MvNormal, RWMH, sample
        from advancedmh_tpu.models.targets import gaussian_mean_scale_model

        model = gaussian_mean_scale_model()
        ch = sample(
            model, RWMH(MvNormal(jnp.zeros(2), scale=0.35)), 2000,
            key=0, num_chains=16, chain_type="chains",
            param_names=["mu", "sigma"],
            initial_params=jnp.asarray([0.0, 1.0]),
        )
        taus = ch.autocorr_time()
        assert set(taus) == {"mu", "sigma"}
        # RWMH at the RR-optimal scale mixes in O(10) steps on this target
        assert 1.0 <= taus["mu"] < 60.0

    def test_rhat_iid_close_to_one(self):
        x = jax.random.normal(jax.random.key(1), (4000, 4))
        assert abs(float(rhat(x)) - 1.0) < 0.02

    def test_rhat_detects_divergent_chains(self):
        x = jax.random.normal(jax.random.key(2), (1000, 2))
        x = x.at[:, 1].add(10.0)
        assert float(rhat(x)) > 2.0

    def test_correlated_chain_lower_ess(self):
        # AR(1) with strong autocorrelation
        n = 4000
        eps = np.random.default_rng(0).normal(size=n)
        x = np.zeros(n)
        for i in range(1, n):
            x[i] = 0.95 * x[i - 1] + eps[i]
        e = float(ess(jnp.asarray(x, jnp.float32)))
        assert e < n / 10

    def test_summary(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        c = sample(MODEL, spl, 500, key=0, num_chains=4, chain_type="chains",
                   param_names=["μ", "σ"])
        s = c.summary()
        assert set(s.keys()) == {"μ", "σ"}
        assert set(s["μ"].keys()) == {
            "mean", "std", "naive_se", "mcse", "ess", "rhat"
        }
        assert s["μ"]["ess"] > 0 and 0.8 < s["μ"]["rhat"] < 1.5
        assert s["μ"]["naive_se"] == pytest.approx(
            s["μ"]["std"] / (500 * 4) ** 0.5
        )

    def test_quantiles(self):
        # ≙ the MCMCChains 'Quantiles' table (reference README.md:66-74)
        rng = np.random.default_rng(3)
        vals = jnp.asarray(rng.normal(size=(2000, 1, 8)), jnp.float32)
        c = Chains(vals, jnp.zeros((2000, 8)), ["x"])
        q = c.quantiles()["x"]
        assert list(q.keys()) == [0.025, 0.25, 0.5, 0.75, 0.975]
        assert abs(q[0.5]) < 0.05
        assert abs(q[0.975] - 1.96) < 0.1
        assert abs(q[0.025] + 1.96) < 0.1
        # monotone in p
        vs = list(q.values())
        assert all(a < b for a, b in zip(vs, vs[1:]))

    def test_rank_normalized_diagnostics_iid(self):
        from advancedmh_tpu import ess_bulk, ess_tail, rhat_rank

        x = jax.random.normal(jax.random.key(5), (4000, 4))
        n_total = 16000
        assert 0.5 * n_total < float(ess_bulk(x)) < 1.6 * n_total
        # tail ESS of iid draws is O(n) (indicator autocorrelation ~0)
        assert float(ess_tail(x)) > 0.3 * n_total
        assert abs(float(rhat_rank(x)) - 1.0) < 0.02

    def test_rank_normalized_big_batch_finite(self):
        """f32 regression (r5): at > 2²⁴ pooled draws the extreme
        fractional ranks round to exactly 0/1 and Φ⁻¹ returns ±inf —
        which poisoned the FFT autocovariance and made ess_bulk report
        N·C/1e-6 (~1e13) at bench scale. The clip keeps every score
        finite and ESS ≈ n for iid draws."""
        from advancedmh_tpu import ess_bulk
        from advancedmh_tpu.diagnostics.ess import _rank_normalize

        n, c = 1100, 16384  # n·c = 18.0M > 2^24
        x = jax.random.normal(jax.random.key(8), (n, c))
        z = _rank_normalize(x)
        assert bool(jnp.isfinite(z).all())
        e = float(ess_bulk(x))
        assert 0.5 * n * c < e < 1.6 * n * c

    def test_rank_normalized_robust_to_heavy_tails(self):
        """Cauchy draws break the plain moment-based ESS (infinite variance);
        the rank-normalized bulk ESS still reads ~n — the point of
        Vehtari 2021 rank normalization."""
        from advancedmh_tpu import ess_bulk

        x = jax.random.cauchy(jax.random.key(6), (4000, 4))
        assert 0.4 * 16000 < float(ess_bulk(x)) < 1.7 * 16000

    def test_rhat_rank_detects_scale_disagreement(self):
        """Chains with equal means but different variances fool plain split-R̂
        on the raw draws; the folded term in rhat_rank catches them."""
        from advancedmh_tpu import rhat_rank

        k = jax.random.key(7)
        a = jax.random.normal(k, (2000, 2))
        x = jnp.concatenate([a[:, :1], 5.0 * a[:, 1:]], axis=1)
        assert float(rhat_rank(x)) > 1.2
        assert abs(float(rhat(x)) - 1.0) < 0.25  # plain R̂ barely reacts

    def test_numpy_integer_seed(self):
        from advancedmh_tpu.utils import as_key

        k1 = as_key(np.int64(7))
        k2 = as_key(7)
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(k1)),
            np.asarray(jax.random.key_data(k2)),
        )

    def test_shard_map_requires_num_chains(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        with pytest.raises(ValueError, match="num_chains"):
            sample(MODEL, spl, 10, key=0, chain_method="shard_map")

    def test_describe(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        c = sample(MODEL, spl, 100, key=0, num_chains=4, chain_type="chains",
                   param_names=["μ", "σ"], discard_initial=25, thinning=4)
        text = c.describe()
        assert "Summary Statistics" in text and "Quantiles" in text
        assert "Iterations        = 26:" in text  # start/thin labeling
        assert "Thinning interval = 4" in text
        assert "μ" in text and "97.5%" in text


class TestNestedRhat:
    """rhat_nested (Margossian et al. 2022): the many-short-chains
    convergence diagnostic."""

    def test_converged_near_one(self):
        import numpy as np
        from advancedmh_tpu import rhat_nested

        rng = np.random.default_rng(0)
        x = rng.normal(size=(20, 256)).astype(np.float32)  # iid = converged
        r = float(rhat_nested(jnp.asarray(x), num_superchains=8))
        assert abs(r - 1.0) < 0.05

    def test_detects_unmixed_superchains(self):
        import numpy as np
        from advancedmh_tpu import rhat_nested

        rng = np.random.default_rng(1)
        x = rng.normal(size=(20, 256)).astype(np.float32)
        # Each superchain stuck in its own mode: offsets per 32-chain group
        offsets = np.repeat(np.arange(8) * 5.0, 32)[None, :]
        r = float(rhat_nested(jnp.asarray(x + offsets), num_superchains=8))
        assert r > 2.0

    def test_single_draw_per_chain(self):
        """N=1 still works (the whole point vs split-R̂): within-chain
        variance degenerates to 0, the between-chain term carries it."""
        import numpy as np
        from advancedmh_tpu import rhat_nested

        rng = np.random.default_rng(2)
        good = rng.normal(size=(1, 512)).astype(np.float32)
        r_good = float(rhat_nested(jnp.asarray(good), num_superchains=8))
        assert abs(r_good - 1.0) < 0.1
        offsets = np.repeat(np.arange(8) * 5.0, 64)[None, :]
        r_bad = float(rhat_nested(jnp.asarray(good + offsets), 8))
        assert r_bad > 2.0

    def test_validation(self):
        from advancedmh_tpu import rhat_nested

        with pytest.raises(ValueError, match="chain axis"):
            rhat_nested(jnp.zeros(10), 2)
        with pytest.raises(ValueError, match="divisible"):
            rhat_nested(jnp.zeros((5, 10)), 3)
        with pytest.raises(ValueError, match=">= 2"):
            rhat_nested(jnp.zeros((5, 10)), 1)

    def test_chains_method(self):
        """Chains.rhat_nested: end-to-end through the bundle layer."""
        from advancedmh_tpu import RWMH, MvNormal, sample
        from tests.test_mh import MODEL

        ch = sample(MODEL, RWMH(MvNormal(jnp.zeros(2), scale=0.2)), 50,
                    key=3, num_chains=64, discard_initial=500,
                    chain_type="chains", param_names=["μ", "σ"])
        r = ch.rhat_nested(num_superchains=8)
        assert set(r) == {"μ", "σ"}
        assert all(0.9 < v < 1.2 for v in r.values())

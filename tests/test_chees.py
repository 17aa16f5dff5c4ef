"""ChEESHMC tests (samplers/chees.py, beyond-parity).

Hoffman-Radul-Sountsov 2021: shared cross-chain trajectory-length tuning.
The sharpest available correctness signal: on a preconditioned (unit-scale)
Gaussian the ChEES-optimal trajectory length is ~pi/2 (a quarter period of
the harmonic oscillator), so the adapted T must land there — not at the
max_leapfrog clip, not at its init.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import ChEESHMC, sample
from advancedmh_tpu.models.density import DensityModel
from advancedmh_tpu.models.targets import correlated_gaussian_model

COV = np.asarray([[1.5, 0.35], [0.35, 1.0]], np.float32)


def _aniso_model():
    var = jnp.array([25.0, 0.25])
    return DensityModel(lambda x: -0.5 * jnp.sum(x * x / var)), var


class TestValidation:
    def test_bad_hyperparams(self):
        with pytest.raises(ValueError, match="initial_trajectory_length"):
            ChEESHMC(initial_trajectory_length=0.0)
        with pytest.raises(ValueError, match="target_accept"):
            ChEESHMC(target_accept=0.0)
        with pytest.raises(ValueError, match="max_leapfrog"):
            ChEESHMC(max_leapfrog=0)
        with pytest.raises(ValueError, match="learning_rate"):
            ChEESHMC(learning_rate=-1.0)

    def test_requires_initial_params(self):
        model, _ = _aniso_model()
        with pytest.raises(ValueError, match="initial parameters"):
            sample(model, ChEESHMC(), 10, key=0, num_chains=4)


class TestAdaptation:
    def test_trajectory_converges_to_quarter_period(self):
        """With pooled mass preconditioning the target becomes ~N(0, I);
        the ChEES-optimal T is ~pi/2. Assert T lands in a loose bracket
        around it — far from both the 0.5 init and the clip bound."""
        model, var = _aniso_model()
        spl = ChEESHMC(initial_trajectory_length=0.5, initial_step_size=0.05,
                       max_leapfrog=64)
        res = sample(model, spl, 400, num_warmup=700, num_chains=256,
                     initial_params=jnp.zeros(2), key=5)
        st = res.final_state
        T = float(jnp.exp(st.log_traj_bar.reshape(-1)[0]))
        assert 0.9 < T < 2.8, T
        acc = float(np.asarray(res.transitions.accepted).mean())
        assert abs(acc - 0.65) < 0.12
        im = np.asarray(st.inverse_mass)[0]
        assert np.allclose(im, np.asarray(var), rtol=0.35)
        x = np.asarray(res.transitions.params)
        assert np.allclose(x.var(axis=(0, 1)), np.asarray(var), rtol=0.3)
        assert np.abs(x.mean(axis=(0, 1)) / np.sqrt(np.asarray(var))).max() < 0.1

    def test_shared_statistics_replicated(self):
        """All adaptation statistics are shared: identical across chains."""
        model, _ = _aniso_model()
        res = sample(model, ChEESHMC(max_leapfrog=32), 20, num_warmup=50,
                     num_chains=64, initial_params=jnp.zeros(2), key=6)
        st = res.final_state
        for leaf in (st.log_eps, st.log_eps_bar, st.log_traj, st.log_traj_bar,
                     st.adam_m, st.adam_v):
            arr = np.asarray(leaf)
            assert np.all(arr == arr.reshape(-1)[0])
        im = np.asarray(st.inverse_mass)
        np.testing.assert_array_equal(im, np.broadcast_to(im[:1], im.shape))

    def test_frozen_after_warmup(self):
        model, _ = _aniso_model()
        res = sample(model, ChEESHMC(max_leapfrog=32), 30, num_warmup=60,
                     num_chains=16, initial_params=jnp.zeros(2), key=7,
                     collect_states=True)
        lt = np.asarray(res.states.log_traj_bar)  # (C, S)
        assert np.all(lt[:, 1:] == lt[:, :1])
        im = np.asarray(res.states.inverse_mass)
        assert np.all(im[:, 1:] == im[:, :1])

    def test_posterior_covariance_correlated(self):
        model = correlated_gaussian_model(COV)
        res = sample(model, ChEESHMC(initial_step_size=0.05, max_leapfrog=32),
                     800, num_warmup=500, num_chains=64,
                     initial_params=jnp.zeros(2), key=8)
        draws = np.asarray(res.transitions.params).reshape(-1, 2)
        assert np.abs(np.cov(draws.T) - COV).max() < 0.2

    def test_no_mass_adaptation_flag(self):
        model, _ = _aniso_model()
        res = sample(model, ChEESHMC(adapt_mass=False, max_leapfrog=32), 20,
                     num_warmup=50, num_chains=32,
                     initial_params=jnp.zeros(2), key=9)
        im = np.asarray(res.final_state.inverse_mass)
        assert np.all(im == 1.0)


class TestSingleChain:
    def test_single_chain_fallback(self):
        """num_chains=None: eps + per-chain mass adapt; T stays at init."""
        model = correlated_gaussian_model(COV)
        spl = ChEESHMC(initial_trajectory_length=1.2, max_leapfrog=32)
        res = sample(model, spl, 400, num_warmup=300,
                     initial_params=jnp.zeros(2), key=10)
        st = res.final_state
        assert float(st.log_traj_bar) == pytest.approx(np.log(1.2), abs=1e-6)
        assert float(st.log_eps_bar) != pytest.approx(np.log(0.1))
        draws = np.asarray(res.transitions.params)
        assert np.abs(draws.mean(axis=0)).max() < 0.35


class TestChunkedResume:
    def test_chunked_equals_unchunked_across_warmup(self):
        """Absolute-iteration keys + full adaptation state in the pytree:
        chunked warmup (Adam/dual-averaging/Welford crossing chunk
        boundaries) is bit-exact vs the unchunked run."""
        from advancedmh_tpu import sample_chunked

        model = correlated_gaussian_model(COV)
        spl = ChEESHMC(initial_step_size=0.05, max_leapfrog=16)
        kw = dict(key=11, num_chains=8, num_warmup=40, discard_initial=0,
                  initial_params=jnp.zeros(2))
        full = sample(model, spl, 60, **kw)
        chunked = sample_chunked(model, spl, 60, chunk_size=17, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp), chunked.transitions.lp
        )
        np.testing.assert_array_equal(
            np.asarray(full.final_state.log_traj_bar),
            np.asarray(chunked.final_state.log_traj_bar),
        )


class TestAdaptiveHMCChunked:
    def test_chunked_equals_unchunked(self):
        from advancedmh_tpu import AdaptiveHMC, sample_chunked

        model = correlated_gaussian_model(COV)
        spl = AdaptiveHMC(n_leapfrog=5, pooled=True)
        kw = dict(key=12, num_chains=8, num_warmup=40, discard_initial=0,
                  initial_params=jnp.zeros(2))
        full = sample(model, spl, 60, **kw)
        chunked = sample_chunked(model, spl, 60, chunk_size=17, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp), chunked.transitions.lp
        )
        np.testing.assert_array_equal(
            np.asarray(full.final_state.inverse_mass),
            np.asarray(chunked.final_state.inverse_mass),
        )

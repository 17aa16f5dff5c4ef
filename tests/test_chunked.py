"""Chunked sampling: value-identical to unchunked, callbacks, warmup across
chunk boundaries."""
import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import (
    MvNormal,
    RWMH,
    RobustAdaptiveMetropolis,
    sample,
    sample_chunked,
)
from advancedmh_tpu.models.density import DensityModel
from tests.test_mh import MODEL


class TestChunked:
    def test_equals_unchunked(self):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=0, num_chains=4, initial_params=jnp.asarray([0.0, 1.0]))
        full = sample(MODEL, spl, 100, **kw)
        chunked = sample_chunked(MODEL, spl, 100, chunk_size=23, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp), chunked.transitions.lp
        )
        assert isinstance(chunked.transitions.lp, np.ndarray)  # host offload

    def test_equals_unchunked_with_discard_thinning(self):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=1, num_chains=2, initial_params=jnp.asarray([0.0, 1.0]),
                  discard_initial=7, thinning=3)
        full = sample(MODEL, spl, 40, **kw)
        chunked = sample_chunked(MODEL, spl, 40, chunk_size=11, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp), chunked.transitions.lp
        )

    def test_warmup_across_chunk_boundary(self):
        SIG = np.array([[1.0, 0.5], [0.5, 1.0]], dtype=np.float32)
        mv = MvNormal.from_cov(jnp.zeros(2), jnp.asarray(SIG))
        model = DensityModel(mv.log_prob, dimension=2)
        spl = RobustAdaptiveMetropolis()
        kw = dict(key=2, num_chains=2, num_warmup=60, discard_initial=0,
                  initial_params=jnp.zeros(2), collect_states=True)
        full = sample(model, spl, 100, **kw)
        chunked = sample_chunked(model, spl, 100, chunk_size=25, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp), chunked.transitions.lp
        )
        # S adapts across the 25/50/75 chunk boundaries exactly as unchunked
        np.testing.assert_array_equal(
            np.asarray(full.states.S), chunked.states.S
        )

    def test_elastic_recovery(self, tmp_path):
        """Crash between chunks → resume=True reproduces the full run
        bit-exactly from disk."""
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=9, num_chains=3, initial_params=jnp.asarray([0.0, 1.0]))
        ckpt = str(tmp_path / "ckpt")

        full = sample_chunked(MODEL, spl, 60, chunk_size=20, **kw)

        # simulate a crash after 2 of 3 chunks: run with a callback that
        # raises once chunk 1 completes
        class Crash(Exception):
            pass

        def boom(res, i):
            if i == 1:
                raise Crash

        try:
            sample_chunked(MODEL, spl, 60, chunk_size=20,
                           checkpoint_dir=ckpt, callback=boom, **kw)
        except Crash:
            pass

        executed = []  # resume must RUN only the post-crash chunk — a no-op
        # resume that restarts from scratch would be bit-identical in output
        # (deterministic keys), so output equality alone cannot catch it
        recovered = sample_chunked(
            MODEL, spl, 60, chunk_size=20, checkpoint_dir=ckpt, resume=True,
            callback=lambda res, i: executed.append(i), **kw,
        )
        assert executed == [2]
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp), recovered.transitions.lp
        )

    def test_elastic_recovery_restores_chain_store(self, tmp_path):
        """Resume re-streams completed chunks into the ChainStore (which
        truncates on open), so the on-disk store holds the full run."""
        from advancedmh_tpu.io import open_reader

        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=9, num_chains=3, initial_params=jnp.asarray([0.0, 1.0]))
        ckpt, storep = str(tmp_path / "ckpt"), str(tmp_path / "run")

        class Crash(Exception):
            pass

        def boom(res, i):
            if i == 1:
                raise Crash

        try:
            sample_chunked(MODEL, spl, 60, chunk_size=20, checkpoint_dir=ckpt,
                           store_path=storep, callback=boom, **kw)
        except Crash:
            pass
        recovered = sample_chunked(MODEL, spl, 60, chunk_size=20,
                                   checkpoint_dir=ckpt, store_path=storep,
                                   resume=True, **kw)
        data, cols = open_reader(storep)
        assert data.shape == (60 * 3, 3)  # full run, not just post-crash rows
        np.testing.assert_allclose(
            np.sort(np.asarray(data[:, 2])),
            np.sort(np.asarray(recovered.transitions.lp).ravel()),
            rtol=1e-6,
        )

    def test_store_path_with_ensemble(self, tmp_path):
        """Ensemble transitions carry a walker axis with num_chains=None;
        the store folds it like a chain axis instead of crashing."""
        from advancedmh_tpu import Ensemble, InverseGamma, Normal, StretchProposal
        from advancedmh_tpu.io import open_reader
        from advancedmh_tpu.models import emcee_demo_model

        spl = Ensemble(
            8, StretchProposal([InverseGamma(2.0, 3.0), Normal(0.0, 1.0)])
        )
        p = str(tmp_path / "ens")
        sample_chunked(
            emcee_demo_model(), spl, 30, chunk_size=10, key=0, store_path=p,
            param_names=["s", "m"],
        )
        data, cols = open_reader(p)
        assert cols == ["s", "m", "lp"]
        assert data.shape == (30 * 8, 3)

    def test_callback_invoked_per_chunk(self):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        seen = []
        sample_chunked(
            MODEL, spl, 50, chunk_size=20, key=3, num_chains=2,
            initial_params=jnp.asarray([0.0, 1.0]),
            callback=lambda res, i: seen.append(
                (i, np.asarray(res.transitions.lp).shape)
            ),
        )
        assert [i for i, _ in seen] == [0, 1, 2]
        assert [s[1] for _, s in seen] == [20, 20, 10]


class TestSampleCallbackProgress:
    """callback/progress through the public ``sample()`` front-end (≙ the
    AbstractMCMC kwargs re-exported at reference src/AdvancedMH.jl:30 and
    exercised at reference test/RobustAdaptiveMetropolis.jl:46-56)."""

    def test_callback_invoked_and_bitexact(self):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=3, num_chains=4, initial_params=jnp.asarray([0.0, 1.0]))
        seen = []
        res = sample(
            MODEL, spl, 90, chunk_size=25,
            callback=lambda r, i: seen.append(
                (i, np.asarray(r.transitions.lp).shape[1])
            ),
            **kw,
        )
        assert [i for i, _ in seen] == [0, 1, 2, 3]
        assert sum(n for _, n in seen) == 90
        plain = sample(MODEL, spl, 90, **kw)
        np.testing.assert_array_equal(
            np.asarray(plain.transitions.lp), np.asarray(res.transitions.lp)
        )

    def test_progress_prints(self, capsys):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        sample(
            MODEL, spl, 40, key=0, num_chains=2,
            initial_params=jnp.asarray([0.0, 1.0]), progress=True,
            chunk_size=20,
        )
        err = capsys.readouterr().err
        assert "40/40" in err

    def test_resume_from_state_with_callback(self):
        """sample(initial_state=..., callback=...) composes: the continuation
        equals the tail of an uninterrupted run bit-exactly."""
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=5, num_chains=3, initial_params=jnp.asarray([0.0, 1.0]))
        full = sample(MODEL, spl, 100, **kw)
        head = sample(MODEL, spl, 50, **kw)
        calls = []
        tail = sample(
            MODEL, spl, 50, key=5, num_chains=3,
            initial_state=head.final_state,
            iteration_offset=head.schedule.total_steps,
            discard_initial=1, chunk_size=30,
            callback=lambda r, i: calls.append(i),
        )
        assert calls == [0, 1]
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp)[:, 50:],
            np.asarray(tail.transitions.lp),
        )

    def test_chunk_info_state_and_iteration_range(self):
        """The callback's second argument is a ChunkInfo: still the integer
        chunk index (back-compat), plus the chunk's absolute iteration
        range and the full sampler state — the reference callback's
        ``(state, iteration)`` arguments (test/RobustAdaptiveMetropolis.jl:
        46-56) without ``collect_states``."""
        from advancedmh_tpu import ChunkInfo

        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        infos = []
        res = sample(
            MODEL, spl, 9, key=3, num_chains=2, discard_initial=4,
            thinning=2, chunk_size=4, initial_params=jnp.asarray([0.0, 1.0]),
            callback=lambda r, i: infos.append(i),
        )
        assert [int(i) for i in infos] == [0, 1, 2]
        assert all(isinstance(i, ChunkInfo) for i in infos)
        # Labels follow the Chains start/thin convention (sample 1 is
        # labeled discard_initial + 1), aligned with schedule.iterations().
        assert [list(i.iteration_range) for i in infos] == [
            [5, 7, 9, 11], [13, 15, 17, 19], [21]
        ]
        assert (
            [j for i in infos for j in i.iteration_range]
            == list(res.schedule.iterations())
        )
        # final_state of the last chunk is the run's final state.
        np.testing.assert_array_equal(
            np.asarray(infos[-1].final_state.params),
            np.asarray(res.final_state.params),
        )

    def test_ram_adaptation_dynamics_without_collect_states(self):
        """≙ the reference StatesExtractor test (test/
        RobustAdaptiveMetropolis.jl:11-71) through ``info.final_state``
        alone: chunk_size=1 observes every adapted S at per-iteration
        cadence with no collect_states, eigenvalues respect the bound and
        the adaptation drives them onto it."""
        upper = 1.5
        model = DensityModel(lambda x: -0.125 * jnp.sum(x * x), dimension=2)
        spl = RobustAdaptiveMetropolis(eigenvalue_upper_bound=upper)
        diags = []

        def extract(r, info):
            diags.append(
                np.diagonal(np.asarray(info.final_state.S), axis1=-2, axis2=-1)
            )

        sample(
            model, spl, 150, key=7, num_chains=2, num_warmup=150,
            discard_initial=0, initial_params=jnp.zeros(2),
            callback=extract, chunk_size=1,
        )
        diag = np.stack(diags, axis=1)  # (chains, steps, d)
        assert diag.shape[1] == 150
        assert diag.max() <= upper + 1e-6  # clamp holds everywhere
        assert diag.max() > 0.8 * upper  # and the bound is actually active

    def test_ram_adaptation_dynamics_via_callback(self):
        """≙ the reference StatesExtractor test
        (test/RobustAdaptiveMetropolis.jl:11-71): a callback observes every
        adapted S; eigenvalues respect the configured upper bound and the
        adaptation actually drives them onto it."""
        upper = 1.5
        # N(0, 4·I): the unconstrained optimum S ≈ (2.38/√2)·2 ≈ 3.4 ≫ upper.
        model = DensityModel(lambda x: -0.125 * jnp.sum(x * x), dimension=2)
        spl = RobustAdaptiveMetropolis(eigenvalue_upper_bound=upper)
        diags = []

        def extract(r, i):
            diags.append(
                np.diagonal(np.asarray(r.states.S), axis1=-2, axis2=-1)
            )

        sample(
            model, spl, 300, key=7, num_chains=2, num_warmup=300,
            discard_initial=0, initial_params=jnp.zeros(2),
            collect_states=True, callback=extract, chunk_size=100,
        )
        diag = np.concatenate(diags, axis=1)  # (chains, steps, d)
        assert diag.shape[1] == 300
        assert diag.max() <= upper + 1e-6  # clamp holds everywhere
        assert diag.max() > 0.8 * upper  # and the bound is actually active

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

"""Native chain store: build, roundtrip, streaming from sample_chunked."""
import numpy as np
import jax.numpy as jnp
import pytest

from advancedmh_tpu.io import ChainStore, open_reader
from advancedmh_tpu.io.chainstore import _load_native


class TestChainStore:
    def test_native_builds(self):
        assert _load_native() is not None, "g++ toolchain expected in image"

    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "chains")
        rng = np.random.default_rng(0)
        blocks = [rng.normal(size=(100, 3)).astype(np.float32) for _ in range(5)]
        with ChainStore(p, ["a", "b", "lp"]) as store:
            assert store.native
            for b in blocks:
                store.append(b)
            store.flush()
        data, cols = open_reader(p)
        assert cols == ["a", "b", "lp"]
        np.testing.assert_array_equal(np.asarray(data), np.concatenate(blocks))

    def test_many_async_appends(self, tmp_path):
        p = str(tmp_path / "big")
        with ChainStore(p, ["x"]) as store:
            total = 0
            for i in range(200):
                n = 1 + (i % 37)
                store.append(np.full((n, 1), float(i), np.float32))
                total += n
        data, _ = open_reader(p)
        assert data.shape == (total, 1)

    def test_shape_validation(self, tmp_path):
        with ChainStore(str(tmp_path / "v"), ["a", "b"]) as store:
            with pytest.raises(ValueError):
                store.append(np.zeros((3, 5), np.float32))


class TestStreamingFromSampler:
    def test_sample_chunked_streams(self, tmp_path):
        from advancedmh_tpu import MvNormal, RWMH, sample_chunked
        from tests.test_mh import MODEL

        p = str(tmp_path / "run")
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        res = sample_chunked(
            MODEL, spl, 100, chunk_size=30, key=0, num_chains=4,
            initial_params=jnp.asarray([0.0, 1.0]),
            store_path=p, param_names=["mu", "sigma"],
        )
        data, cols = open_reader(p)
        assert cols == ["mu", "sigma", "lp"]
        assert data.shape == (400, 3)  # 100 samples x 4 chains
        # streamed lp matches the in-memory result
        np.testing.assert_allclose(
            np.sort(np.asarray(data[:, 2])),
            np.sort(np.asarray(res.transitions.lp).ravel()),
            rtol=1e-6,
        )

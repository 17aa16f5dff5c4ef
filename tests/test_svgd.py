"""SVGD tests (runtime/svgd.py): deterministic particle inference.

The checks target what SVGD promises — moment recovery from a small
deterministic cloud, mode coverage, a decaying update norm (the
convergence trace), and exact determinism (no randomness after init).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedmh_tpu import DensityModel, svgd_sample
from advancedmh_tpu.models.targets import correlated_gaussian_model


class TestMoments:
    def test_correlated_gaussian_cloud(self):
        SIG = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
        model = correlated_gaussian_model(SIG)
        out = svgd_sample(
            model, key=0, num_particles=512, num_steps=500, init_scale=3.0
        )
        p = np.asarray(out["particles"])
        np.testing.assert_allclose(p.mean(0), np.zeros(2), atol=0.06)
        np.testing.assert_allclose(np.cov(p.T), SIG, rtol=0.12, atol=0.05)
        # convergence trace: the mean update magnitude must have decayed
        assert out["phi_norm"][-1] < 0.25 * out["phi_norm"][0]
        assert out["bandwidth"] > 0.0

    def test_anisotropic_with_adagrad(self):
        """25:1 scale ratio: the per-coordinate AdaGrad schedule lets one
        step_size serve both directions."""
        SIG = np.diag([25.0, 1.0]).astype(np.float32)
        model = correlated_gaussian_model(SIG)
        out = svgd_sample(
            model, key=1, num_particles=512, num_steps=800, init_scale=6.0
        )
        p = np.asarray(out["particles"])
        np.testing.assert_allclose(
            p.var(0), np.array([25.0, 1.0]), rtol=0.2
        )

    def test_bimodal_mode_coverage(self):
        """The repulsive term holds particles in BOTH modes — gradient
        ascent alone would collapse each basin's particles to its MAP."""

        def lp(x):
            return jnp.logaddexp(
                -0.5 * jnp.sum((x - 2.0) ** 2) / 0.25,
                -0.5 * jnp.sum((x + 2.0) ** 2) / 0.25,
            )

        out = svgd_sample(
            DensityModel(lp, dimension=2), key=1, num_particles=512,
            num_steps=800, init_scale=3.0,
        )
        q = np.asarray(out["particles"])
        right = (q[:, 0] > 0).mean()
        assert 0.35 < right < 0.65
        assert abs(np.abs(q[:, 0]).mean() - 2.0) < 0.2
        # within-mode spread survives (repulsion): not collapsed to MAPs
        spread = q[q[:, 0] > 0, 0].std()
        assert spread > 0.15


class TestInterface:
    def test_deterministic(self):
        model = correlated_gaussian_model(np.eye(2, dtype=np.float32))
        a = svgd_sample(model, key=7, num_particles=64, num_steps=100)
        b = svgd_sample(model, key=7, num_particles=64, num_steps=100)
        np.testing.assert_array_equal(
            np.asarray(a["particles"]), np.asarray(b["particles"])
        )

    def test_initial_particles(self):
        model = correlated_gaussian_model(np.eye(2, dtype=np.float32))
        x0 = jnp.asarray(
            np.random.default_rng(0).normal(size=(128, 2)), jnp.float32
        )
        out = svgd_sample(
            model, key=0, num_particles=128, num_steps=200,
            initial_particles=x0,
        )
        p = np.asarray(out["particles"])
        np.testing.assert_allclose(np.cov(p.T), np.eye(2), atol=0.15)

    def test_validation(self):
        model = correlated_gaussian_model(np.eye(2, dtype=np.float32))
        with pytest.raises(ValueError, match="num_particles"):
            svgd_sample(model, key=0, num_particles=1)
        with pytest.raises(ValueError, match="num_steps"):
            svgd_sample(model, key=0, num_steps=0)
        with pytest.raises(ValueError, match="initial_particles"):
            svgd_sample(model, key=0, num_particles=64,
                        initial_particles=jnp.zeros((32, 2)))

"""≙ the reference MALA usage (test/runtests.jl:287-365): gradient-informed
proposal MALA(g -> MvNormal(σ²/2 g, σ² I)); gradients via jax.value_and_grad
(or a model-provided analytic gradient)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import MALA, MvNormal, sample
from advancedmh_tpu.models import correlated_gaussian_model

N_SAMPLES = int(os.environ.get("N_SAMPLES", 8_000))


def main():
    SIGMA = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
    model = correlated_gaussian_model(SIGMA)  # has an analytic gradient

    s2 = 0.5
    sampler = MALA(lambda g: MvNormal(s2 / 2.0 * g, scale=jnp.sqrt(s2)))

    res = sample(
        model, sampler, N_SAMPLES, key=2, num_chains=16,
        initial_params=jnp.ones(2), discard_initial=1_000,
    )
    draws = np.asarray(res.transitions.params).reshape(-1, 2)
    est = np.cov(draws.T)
    print("estimated covariance:\n", est)
    assert np.allclose(est, SIGMA, atol=0.2), "Σ̂ ≉ Σ"
    print("‖Σ̂ − Σ‖ < 0.2 ✓  (≙ reference issue #95 test)")


if __name__ == "__main__":
    main()

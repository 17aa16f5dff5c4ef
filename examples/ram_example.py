"""≙ the reference RAM jldoctest (src/RobustAdaptiveMetropolis.jl:17-70):
adaptively learn the proposal covariance of a correlated Gaussian during
warmup, then verify cov(chain) ≈ Σ."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import RobustAdaptiveMetropolis, sample
from advancedmh_tpu.models import correlated_gaussian_model

NUM = int(os.environ.get("N_SAMPLES", 10_000))


def main():
    SIGMA = np.array([[1.0, 0.5], [0.5, 1.0]], dtype=np.float32)
    model = correlated_gaussian_model(SIGMA)

    chain = sample(
        model,
        RobustAdaptiveMetropolis(),
        NUM,
        key=1234,
        num_warmup=NUM,  # discard_initial defaults to num_warmup
        num_chains=4,
        initial_params=jnp.zeros(2),
        chain_type="chains",
    )
    cov = np.asarray(chain.cov())
    print("estimated covariance:\n", cov)
    assert np.allclose(cov, SIGMA, rtol=0.2, atol=0.1), "cov(chain) ≉ Σ"
    print("cov(chain) ≈ Σ (rtol 0.2) ✓")

    # Eigenvalue-bounded variant (p. 13 in Vihola 2012).
    chain2 = sample(
        model,
        RobustAdaptiveMetropolis(
            eigenvalue_lower_bound=0.1, eigenvalue_upper_bound=2.0
        ),
        NUM,
        key=1234,
        num_warmup=NUM,
        num_chains=4,
        initial_params=jnp.zeros(2),
        chain_type="chains",
    )
    print("bounded-eig norm error:",
          float(np.linalg.norm(np.asarray(chain2.cov()) - SIGMA)))
    return chain


if __name__ == "__main__":
    main()

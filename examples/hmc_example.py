"""Hamiltonian Monte Carlo (beyond-parity, samplers/hmc.py): leapfrog
trajectories with the exact MH energy-error accept, plus dual-averaged step
size via StepSizeAdaptation.hmc — covariance recovery on the correlated
quadratic (≙ the reference's MALA issue-#95 test, but with HMC's
decorrelated draws)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import HamiltonianMC, StepSizeAdaptation, sample
from advancedmh_tpu.models import correlated_gaussian_model

N_SAMPLES = int(os.environ.get("N_SAMPLES", 2_000))


def main():
    SIGMA = np.array([[1.5, 0.35], [0.35, 1.0]], dtype=np.float32)
    model = correlated_gaussian_model(SIGMA)  # analytic gradient

    # Fixed-ε HMC
    res = sample(
        model, HamiltonianMC(step_size=0.4, n_leapfrog=10), N_SAMPLES,
        key=2, num_chains=32, initial_params=jnp.zeros(2),
        discard_initial=500,
    )
    draws = np.asarray(res.transitions.params).reshape(-1, 2)
    acc = float(np.asarray(res.transitions.accepted).mean())
    est = np.cov(draws.T)
    print(f"fixed-ε HMC acceptance {acc:.2f}")
    print("estimated covariance:\n", est)
    assert np.allclose(est, SIGMA, atol=0.2), "Σ̂ ≉ Σ"

    # Dual-averaged ε toward the 0.65 optimum (Neal 2011 §5.4.4)
    spl = StepSizeAdaptation.hmc(n_leapfrog=5, initial_step_size=0.02)
    res = sample(
        model, spl, N_SAMPLES, key=3, num_chains=16, num_warmup=600,
        initial_params=jnp.zeros(2), discard_initial=600,
    )
    acc = float(np.asarray(res.transitions.accepted).mean())
    print(f"adapted HMC acceptance {acc:.2f} (target 0.65)")
    assert abs(acc - 0.65) < 0.15
    print("HMC ✓")


if __name__ == "__main__":
    main()

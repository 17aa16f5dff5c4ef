"""Auto-tuned many-chain HMC (beyond-parity, samplers/{hmc_adapt,chees}.py):

AdaptiveHMC learns the diagonal mass matrix (per-dimension scales) and the
step size; ChEESHMC additionally learns the trajectory length — the full
no-tuning-knobs HMC stack, all from cross-chain statistics (Hoffman-Radul-
Sountsov 2021). On a badly anisotropic Gaussian (100:1 variance ratio) the
adapted mass recovers the scales and the adapted trajectory length lands at
the quarter-period optimum ~π/2 of the preconditioned target.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import AdaptiveHMC, ChEESHMC, DensityModel, sample

N_SAMPLES = int(os.environ.get("N_SAMPLES", 400))


def main():
    var = jnp.array([25.0, 0.25])  # σ = [5, 0.5]: 100:1 variance anisotropy
    model = DensityModel(lambda x: -0.5 * jnp.sum(x * x / var))

    # AdaptiveHMC: ε + pooled diagonal mass (fixed trajectory length)
    res = sample(
        model, AdaptiveHMC(n_leapfrog=10, pooled=True), N_SAMPLES,
        key=0, num_chains=256, num_warmup=400, initial_params=jnp.zeros(2),
    )
    inv_mass = np.asarray(res.final_state.inverse_mass)[0]
    print(f"AdaptiveHMC inverse mass {inv_mass} (true variances {np.asarray(var)})")
    assert np.allclose(inv_mass, np.asarray(var), rtol=0.4)

    # ChEESHMC: ε + mass + trajectory length, all shared across chains
    res = sample(
        model,
        ChEESHMC(initial_trajectory_length=0.5, initial_step_size=0.05,
                 max_leapfrog=64),
        N_SAMPLES, key=1, num_chains=256, num_warmup=700,
        initial_params=jnp.zeros(2),
    )
    st = res.final_state
    T = float(jnp.exp(st.log_traj_bar.reshape(-1)[0]))
    eps = float(jnp.exp(st.log_eps_bar.reshape(-1)[0]))
    acc = float(np.asarray(res.transitions.accepted).mean())
    x = np.asarray(res.transitions.params)
    print(f"ChEES trajectory T={T:.2f} (≈π/2={np.pi/2:.2f}), ε={eps:.2f}, "
          f"acceptance {acc:.2f} (target 0.65)")
    assert 0.9 < T < 2.8
    assert abs(acc - 0.65) < 0.15
    assert np.allclose(x.var(axis=(0, 1)), np.asarray(var), rtol=0.3)
    print("auto-tuned HMC ✓")


if __name__ == "__main__":
    main()

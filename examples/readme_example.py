"""≙ the reference README walkthrough (reference README.md:23-63): define a
2-parameter Gaussian model from data, sample with RWMH, inspect summary
statistics (mean/std/ess/rhat)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import DensityModel, MvNormal, Normal, RWMH, sample, guarded_logdensity

N_SAMPLES = int(os.environ.get("N_SAMPLES", 20_000))
NUM_CHAINS = int(os.environ.get("NUM_CHAINS", 64))


def main():
    # Generate a set of data from the posterior we want to estimate.
    data = jnp.asarray(np.random.default_rng(1).normal(size=30), jnp.float32)

    # Define the components of a basic model: θ = (μ, σ), σ >= 0.
    def density(theta):
        return jnp.sum(Normal(theta[0], theta[1]).log_prob(data))

    model = DensityModel(
        guarded_logdensity(
            support_fn=lambda t: t[1] >= 0,
            logdensity_fn=density,
            safe_params_fn=lambda t: jnp.stack([t[0], jnp.maximum(t[1], 0.1)]),
        ),
        dimension=2,
    )

    # Set up the random-walk sampler and draw (chains × samples) on-device.
    spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
    chain = sample(
        model, spl, N_SAMPLES, key=0, num_chains=NUM_CHAINS,
        discard_initial=1_000, initial_params=jnp.asarray([0.0, 1.0]),
        chain_type="chains", param_names=["μ", "σ"],
    )

    print(chain)
    for name, stats in chain.summary().items():
        print(
            f"{name}: mean={stats['mean']:+.4f} std={stats['std']:.4f} "
            f"ess={stats['ess']:.0f} rhat={stats['rhat']:.4f}"
        )
    return chain


if __name__ == "__main__":
    main()

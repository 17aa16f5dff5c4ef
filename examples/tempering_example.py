"""Parallel tempering on a well-separated bimodal target (beyond-parity;
no reference equivalent — the reference's samplers are single-temperature).

A plain random walk with a local step size cannot cross the ~8σ barrier
between the modes of ½·N(−5, 1) + ½·N(+5, 1); `ReplicaExchange` runs a
ladder of tempered replicas per chain (a vmapped leading axis — one fused
kernel for all temperatures) with even-odd neighbor swaps, and the cold
chain inherits the hot chains' mode hopping."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import (
    DensityModel,
    Normal,
    ReplicaExchange,
    RWMH,
    sample,
    swap_rates,
)

NUM = int(os.environ.get("N_SAMPLES", 8000))
NUM_CHAINS = int(os.environ.get("NUM_CHAINS", 32))


def main():
    def bimodal(x):
        x = jnp.reshape(x, ())
        return jnp.logaddexp(
            Normal(-5.0, 1.0).log_prob(x), Normal(5.0, 1.0).log_prob(x)
        ) - jnp.log(2.0)

    model = DensityModel(bimodal, dimension=1)
    inner = RWMH(Normal(0.0, 0.5))

    # Plain RWMH: every chain starts in the left mode and stays there.
    plain = sample(
        model, inner, NUM, key=0, num_chains=NUM_CHAINS,
        discard_initial=500, initial_params=jnp.asarray(-5.0),
    )
    pd = np.asarray(plain.transitions.params).ravel()
    print(f"plain RWMH:  mean {pd.mean():+.2f}, "
          f"fraction in right mode {(pd > 0).mean():.3f}")
    assert (pd > 0).mean() < 0.02, "plain RWMH unexpectedly crossed"

    # Tempered: geometric-ish ladder down to β=0.05 (hot replica sees an
    # almost-flat landscape and random-walks freely between the basins).
    pt = ReplicaExchange(inner, betas=(1.0, 0.55, 0.3, 0.15, 0.05))
    res = sample(
        model, pt, NUM, key=0, num_chains=NUM_CHAINS,
        discard_initial=500, initial_params=jnp.asarray(-5.0),
    )
    draws = np.asarray(res.transitions.params)  # (chains, samples)
    frac_right = (draws > 0).mean()
    print(f"tempered:    mean {draws.mean():+.2f}, "
          f"fraction in right mode {frac_right:.3f}")
    rates = np.asarray(swap_rates(res.final_state))
    print("neighbor swap rates:", np.round(rates, 2))

    assert 0.3 < frac_right < 0.7, "tempered run failed to balance the modes"
    assert abs(draws.mean()) < 1.0
    assert (rates > 0.2).all(), "a ladder rung has stalled swaps"
    print("mode hopping restored by the temperature ladder ✓")


if __name__ == "__main__":
    main()

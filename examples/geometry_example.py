"""Hard-geometry sampling: Neal's funnel and the Haario banana
(models/targets.py::{neal_funnel_model, banana_model}; tests/test_geometry.py
pins the full tolerances).

Two lessons this example demonstrates against *exact* ground truth:

1. **Funnel** (v ~ N(0, 9), x_i | v ~ N(0, eᵛ)): fixed-metric samplers
   cannot shrink their step into the neck — the step-size-free
   `SliceSampler` recovers the neck mass P(v < −2) = Φ(−2/3) ≈ 0.2525
   almost exactly, while fixed-ε HMC undercounts it.
2. **Banana** (twisted Gaussian, Var = [100, 19]): trajectory-length
   adaptation (`ChEESHMC`) tracks the curved ridge where a single adapted
   diagonal metric cannot.
3. **Non-centered funnel**: the standard modeling fix (Stan's
   reparameterization lesson) — sample (v, z) with x = z·eᵛ́ᐟ², so the
   target is an isotropic Gaussian — lets the same ChEES kernel recover
   the neck mass essentially exactly. Hard geometry is sometimes best
   solved in the model, not the sampler.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import ChEESHMC, HamiltonianMC, SliceSampler, sample
from advancedmh_tpu.models.targets import banana_model, neal_funnel_model

N_SAMPLES = int(os.environ.get("N_SAMPLES", 800))
P_NECK2 = 0.25249  # Phi(-2/3): exact P(v < -2)


def main():
    funnel = neal_funnel_model(10)
    kw = dict(
        key=0, num_chains=256, initial_params=jnp.zeros(10),
        chain_type="raw", discard_initial=600,
    )
    v_slice = np.asarray(
        sample(funnel, SliceSampler(width=2.0), N_SAMPLES, **kw)
        .transitions.params
    )[:, :, 0]
    v_hmc = np.asarray(
        sample(funnel, HamiltonianMC(0.4, 8), N_SAMPLES, **kw)
        .transitions.params
    )[:, :, 0]
    print(
        f"funnel neck mass P(v<-2): exact {P_NECK2:.3f}  "
        f"slice {(v_slice < -2).mean():.3f}  "
        f"fixed-eps HMC {(v_hmc < -2).mean():.3f}"
    )
    assert abs((v_slice < -2).mean() - P_NECK2) < 0.05
    assert (v_hmc < -2).mean() < (v_slice < -2).mean()

    banana = banana_model()
    res = sample(
        banana,
        ChEESHMC(initial_step_size=0.5, initial_trajectory_length=2.0,
                 max_leapfrog=64),
        N_SAMPLES, key=0, num_chains=256, num_warmup=600,
        discard_initial=600, initial_params=jnp.zeros(2), chain_type="raw",
    )
    x = np.asarray(res.transitions.params).reshape(-1, 2)
    print(f"banana variances {x.var(0)} (exact [100, 19])")
    assert np.allclose(x.var(0), [100.0, 19.0], rtol=0.25)

    # Non-centered funnel: theta = (v, z), x_i = z_i * exp(v/2). The
    # target over theta is N(0, diag(9, 1, ..., 1)) — trivially easy —
    # and v's marginal is unchanged, so the neck mass comes out exact.
    from advancedmh_tpu import DensityModel

    nc = DensityModel(
        lambda t: -t[0] * t[0] / 18.0 - 0.5 * jnp.sum(t[1:] * t[1:]),
        dimension=10,
    )
    res = sample(
        nc,
        ChEESHMC(initial_step_size=0.2, initial_trajectory_length=1.0,
                 max_leapfrog=32),
        N_SAMPLES, key=0, num_chains=256, num_warmup=600,
        discard_initial=600, initial_params=jnp.zeros(10), chain_type="raw",
    )
    v_nc = np.asarray(res.transitions.params)[:, :, 0]
    print(
        f"non-centered funnel P(v<-2): exact {P_NECK2:.3f}  "
        f"ChEES {(v_nc < -2).mean():.3f}"
    )
    assert abs((v_nc < -2).mean() - P_NECK2) < 0.04


if __name__ == "__main__":
    main()

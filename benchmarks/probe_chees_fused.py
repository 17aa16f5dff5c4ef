"""Probe: fused ChEES engine end-to-end on the real chip (correctness + perf)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import ChEESHMC, sample
from advancedmh_tpu.diagnostics import ess
from advancedmh_tpu.models.targets import gaussian_mean_scale_model

N_CHAINS = 16384
N, W = 4000, 500

model = gaussian_mean_scale_model()
spl = ChEESHMC(initial_step_size=0.05, initial_trajectory_length=0.25,
               max_leapfrog=16)


def go(seed):
    t0 = time.perf_counter()
    res = sample(
        model, spl, N, key=seed, num_chains=N_CHAINS, engine="fused",
        num_warmup=W, discard_initial=W, initial_params=jnp.asarray([0.0, 1.0]),
        chain_type="raw",
    )
    mus = jnp.transpose(res.transitions.params[:, :, 0])  # (N, C)
    e = float(ess(mus))
    dt = time.perf_counter() - t0
    return res, e, dt


res, e, dt = go(0)  # compile
for trial in range(3):
    res, e, dt = go(1 + trial)
    p = np.asarray(res.transitions.params)
    acc = float(np.asarray(res.transitions.accepted).mean())
    print(
        f"trial {trial}: {dt:.3f}s acc={acc:.3f} "
        f"mu_mean={p[:, :, 0].mean():.4f} sig_mean={p[:, :, 1].mean():.4f} "
        f"mu_std={p[:, :, 0].std():.4f} "
        f"ess={e:.3e} ess/draw={e/(N*N_CHAINS):.3f} ess_per_s={e/dt:.3e}"
    )

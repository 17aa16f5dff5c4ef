"""Re-measure endpoint vs multinomial HMC after the static-L fori rewrite.

Replicates the round-2 methodology: anisotropic Gaussian (var 4.0/0.25),
eps=0.8, L=6, 16384 chains, XLA batched path, fence-timed best-of-3.
"""
import time

import jax
import jax.numpy as jnp

from advancedmh_tpu import HamiltonianMC
from advancedmh_tpu.diagnostics import ess
from advancedmh_tpu.models.density import DensityModel

N_CHAINS = 16384
N = 1000

var = jnp.array([4.0, 0.25], jnp.float32)
model = DensityModel(lambda x: -0.5 * jnp.sum(x * x / var))


def bench(spl, label):
    master = jax.random.key(0)

    @jax.jit
    def run(seed_key):
        x0 = jnp.zeros((N_CHAINS, 2), jnp.float32)
        _, state = jax.vmap(lambda k: spl.init(k, model, jnp.zeros(2)))(
            jax.random.split(seed_key, N_CHAINS)
        )

        def body(s, j):
            t, s = spl.step_batched(
                jax.random.fold_in(seed_key, j), s, model, (N_CHAINS,)
            )
            return s, t.params[:, 0]

        _, xs = jax.lax.scan(body, state, jnp.arange(N))
        return xs

    def go(sk):
        xs = run(sk)
        float(xs[-1, 0])
        return xs

    go(master)
    best, xs = float("inf"), None
    for trial in range(3):
        sk = jax.random.key(1 + trial)
        t0 = time.perf_counter()
        out = go(sk)
        dt = time.perf_counter() - t0
        if dt < best:
            best, xs = dt, out
    e = float(ess(xs))
    print(
        f"{label}: {best:.3f}s  steps/s={N/best:.1f} "
        f"chain-steps/s={N*N_CHAINS/best:.3e} ess={e:.3e} "
        f"ess_per_s={e/best:.3e} ess/draw={e/(N*N_CHAINS):.3f}"
    )


bench(HamiltonianMC(0.8, 6), "endpoint     ")
bench(HamiltonianMC(0.8, 6, trajectory_sampling="multinomial"), "multinomial  ")
# mistuned regime: the robustness pitch (endpoint collapses, multinomial moves)
bench(HamiltonianMC(1.9, 6), "endpoint-bad ")
bench(HamiltonianMC(1.9, 6, trajectory_sampling="multinomial"), "multinom-bad ")

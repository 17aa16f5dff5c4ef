"""Scaling-efficiency harness: samples/s vs device count.

≙ SURVEY.md §7.7: report samples/s/chip at 1 device vs N devices on the
chains axis. On a single-chip environment this runs against the virtual CPU
mesh (`--xla_force_host_platform_device_count`); on a pod slice it measures
real ICI-sharded scaling. MH chains are embarrassingly parallel, so the
target is ≥90% efficiency (BASELINE.md north star).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/scaling.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

# Env vars alone cannot select the CPU backend here (a sitecustomize hook
# force-registers the TPU platform before this script runs); honor
# JAX_PLATFORMS=cpu explicitly so the virtual-device flag takes effect.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def measure(num_devices: int, chains_per_device: int = 2048, n_steps: int = 200):
    from advancedmh_tpu import MCMCDistributed, MvNormal, RWMH, sample
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.parallel import make_mesh

    model = gaussian_mean_scale_model()
    spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
    mesh = make_mesh(n_devices=num_devices, axis="chains")
    C = chains_per_device * num_devices

    def run():
        res = sample(
            model, spl, 2, key=0, num_chains=C,
            chain_method=MCMCDistributed(mesh=mesh),
            discard_initial=n_steps,
            initial_params=jnp.asarray([0.0, 1.0]),
        )
        jax.block_until_ready(res.transitions.lp)

    run()  # compile
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return C * (n_steps + 1) / dt


def main():
    n_total = len(jax.devices())
    base = measure(1)
    results = {"1": {"chain_steps_per_s": base, "efficiency": 1.0}}
    n = 2
    while n <= n_total:
        r = measure(n)
        results[str(n)] = {
            "chain_steps_per_s": r,
            "efficiency": r / (base * n),
        }
        n *= 2
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

"""Scaling-efficiency harness: samples/s vs device count.

≙ SURVEY.md §7.7: report samples/s/chip at 1 device vs N devices on the
chains axis. On a single-chip environment this runs against the virtual CPU
mesh (`--xla_force_host_platform_device_count`) — there the numbers validate
that the sharded program compiles and scales mechanically, but "efficiency"
is NOT meaningful (virtual devices share the host's cores, so the 1-device
baseline underuses the machine and ratios can read anywhere from 0.8 to
>1). The ≥90% north star (BASELINE.md) is a *pod* metric: on a real slice
each mesh entry is an independent chip and chains are embarrassingly
parallel (zero hot-loop collectives).

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


def measure(num_devices: int, chains_per_device: int = 2048, n_steps: int = 2000):
    """Steady-state chain-steps/s on a ``num_devices``-wide chains mesh.
    ``num_devices=0`` measures the plain vmap path (no mesh, no sharding
    constraints) at the same per-device chain count — the delta against the
    1-device mesh row isolates the pure GSPMD/sharding-annotation overhead.

    The jitted program is built ONCE and the timed calls replay the compiled
    executable — calling the ``sample()`` front-end per trial would re-trace
    every time and the measurement would be compile-dominated. Timing is
    fenced with a dependent scalar host read (block_until_ready can return
    early on tunneled TPU backends, CLAUDE.md)."""
    from advancedmh_tpu import MvNormal, RWMH
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.parallel import chain_sharding, make_mesh
    from advancedmh_tpu.runtime.sample import build_chain_fn
    from advancedmh_tpu.runtime.schedule import Schedule

    model = gaussian_mean_scale_model()
    spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
    n_dev = max(num_devices, 1)
    mesh = make_mesh(n_devices=n_dev, axis="chains")
    C = chains_per_device * n_dev

    schedule = Schedule(
        n_samples=1, num_warmup=0, discard_initial=n_steps, thinning=1
    )
    chain_fn = build_chain_fn(
        spl, model, schedule, batch_shape=(C,),
        state_sharding=(
            chain_sharding(mesh, "chains") if num_devices > 0 else None
        ),
    )
    fn = jax.jit(lambda k: chain_fn(k, jnp.asarray([0.0, 1.0])))
    key = jax.random.key(0)

    def run():
        out, _ = fn(key)
        return float(out.lp[0, 0])  # scalar-read fence

    run()  # compile once; subsequent calls replay the executable
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return C * n_steps / best


def main():
    n_total = len(jax.devices())
    vmap_base = measure(0)
    base = measure(1)
    results = {
        "vmap(no-mesh)": {"chain_steps_per_s": vmap_base},
        "1": {
            "chain_steps_per_s": base,
            "efficiency": 1.0,
            "sharding_overhead_vs_vmap": 1.0 - base / vmap_base,
        },
    }
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

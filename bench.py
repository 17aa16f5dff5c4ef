"""Benchmark: RWMH chain-steps/s on the reference README flagship model.

Runs the fused scan-of-steps RWMH kernel over a large chain batch on the
available accelerator (one TPU chip under the driver) and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md —
"published": {}). The baseline used here is 1e6 chain-steps/s, a documented
*estimate* of the Julia reference's single-process sequential throughput on
this model (~1 µs/step for a 30-obs Normal log-likelihood + proposal draw +
accept on modern x86; the reference runs one chain per process). The TPU
design's win is the chain batch: value/baseline ≈ how many reference
processes one chip replaces.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SEQ_THROUGHPUT = 1.0e6  # chain-steps/s, documented estimate (see above)


def main():
    from advancedmh_tpu import MvNormal, RWMH, Transition
    from __graft_entry__ import _readme_model

    n_chains = 16384
    n_steps = 10_000

    model = _readme_model()
    spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))

    from functools import partial

    master = jax.random.key(0)

    @partial(jax.jit, static_argnums=2)
    def run(params, lp, n):
        state = Transition(params, lp, jnp.zeros((n_chains,), bool))

        def body(state, j):
            _, s = spl.step_batched(
                jax.random.fold_in(master, j), state, model, (n_chains,)
            )
            return s, None

        state, _ = jax.lax.scan(body, state, jnp.arange(n))
        return state.params, state.lp

    params = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (n_chains, 1))
    lp = jax.vmap(model.logdensity_fn)(params)

    # compile + warmup with the SAME static step count that is timed (a
    # different n would recompile inside the timed region)
    out = run(params, lp, n_steps)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = run(params, lp, n_steps)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    throughput = n_chains * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "rwmh_chain_steps_per_s",
                "value": throughput,
                "unit": "chain-steps/s (16384 chains, README 2-param Gaussian model)",
                "vs_baseline": throughput / REFERENCE_SEQ_THROUGHPUT,
            }
        )
    )


if __name__ == "__main__":
    main()

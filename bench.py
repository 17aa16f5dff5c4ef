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
    n_steps = 2000

    model = _readme_model()
    spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))

    def one(k, p, l):
        _, s = spl.step(k, Transition(p, l, jnp.zeros((), bool)), model)
        return s.params, s.lp

    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def run(chain_keys, params, lp, n):
        def body(carry, j):
            params, lp = carry
            keys = jax.vmap(lambda ck: jax.random.fold_in(ck, j))(chain_keys)
            params, lp = jax.vmap(one)(keys, params, lp)
            return (params, lp), None

        (params, lp), _ = jax.lax.scan(body, (params, lp), jnp.arange(n))
        return params, lp

    chain_keys = jax.random.split(jax.random.key(0), n_chains)
    params = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (n_chains, 1))
    lp = jax.vmap(model.logdensity_fn)(params)

    # compile + warmup
    out = run(chain_keys, params, lp, 100)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = run(chain_keys, params, lp, n_steps)
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

"""Benchmark: RWMH chain-steps/s on the reference README flagship model.

Primary engine: the fused Pallas VMEM-resident kernel (ops/pallas_mh.py) —
the whole propose→logdensity→accept loop for all chains runs on-chip with the
hardware PRNG, N steps per launch. Falls back to the XLA vectorized path
(samplers/mh.py step_batched under lax.scan) if Pallas is unavailable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SEQ_THROUGHPUT = 1.0e6  # chain-steps/s, documented estimate (above)
N_CHAINS = 16384
N_STEPS = 10_000


def bench_pallas(model):
    from advancedmh_tpu.ops import fused_rwmh

    run = fused_rwmh(
        model.tile_density, d=2, scale=0.1, n_steps=N_STEPS,
        consts=model.tile_consts,
    )
    params = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, N_CHAINS))
    lp0 = model.tile_density(params, jnp.asarray(model.tile_consts[0]))

    def go(seed):
        # Fence with a scalar read: on the axon tunnel block_until_ready can
        # return before the kernel finishes; a dependent host read is a true
        # sync and costs only one ~2 ms RTT (see benchmarks/samplers.py).
        out = run(params, lp0, seed)
        return float(out[2].mean())

    go(0)  # compile + warmup (kernel and the mean-read graph)
    best, acc_sum = float("inf"), None
    for trial in range(3):
        t0 = time.perf_counter()
        acc_sum = go(1 + trial)
        best = min(best, time.perf_counter() - t0)
    # sanity: sampler must actually be accepting/rejecting
    acc_rate = acc_sum / N_STEPS
    assert 0.05 < acc_rate < 0.95, f"degenerate acceptance rate {acc_rate}"
    return N_CHAINS * N_STEPS / best, "pallas-fused"


def bench_xla(model):
    from advancedmh_tpu import MvNormal, RWMH, Transition

    spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
    master = jax.random.key(0)

    @partial(jax.jit, static_argnums=2)
    def run(params, lp, n):
        state = Transition(params, lp, jnp.zeros((N_CHAINS,), bool))

        def body(state, j):
            _, s = spl.step_batched(
                jax.random.fold_in(master, j), state, model, (N_CHAINS,)
            )
            return s, None

        state, _ = jax.lax.scan(body, state, jnp.arange(n))
        return state.params, state.lp

    params = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (N_CHAINS, 1))
    lp = jax.vmap(model.logdensity_fn)(params)

    def go():
        p, l = run(params, lp, N_STEPS)
        return float(l[0])  # scalar-read fence (block_until_ready can
        # return early through the device tunnel — see bench_pallas)

    go()  # compile (same static n)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    return N_CHAINS * N_STEPS / best, "xla-scan"


def bench_ess_per_s(model):
    """ESS/s of μ on the same model via the fused sampling engine (the
    BASELINE.json companion metric)."""
    from advancedmh_tpu.diagnostics import ess
    from advancedmh_tpu.ops import fused_rwmh_sample

    N = 4000
    # scale 0.35 ≈ the Roberts-Rosenthal optimum 2.38/√d × posterior std
    # (~0.18 for μ here): measured sweep peaks there (acc ≈ 0.30,
    # 1.4e8 ESS/s vs 4.8e7 at scale=0.1).
    run = fused_rwmh_sample(
        model.tile_density, d=2, scale=0.35, n_samples=N, burn=1000, thin=1,
        consts=model.tile_consts,
    )
    params = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, N_CHAINS))
    lp0 = model.tile_density(params, jnp.asarray(model.tile_consts[0]))

    def go(seed):
        samples, _, _ = run(params, lp0, seed)
        float(samples[-1, 0, 0])  # scalar-read fence (see bench_pallas)
        return samples

    go(0)
    best, samples = float("inf"), None
    for trial in range(3):  # early post-compile calls can be tunnel-slow
        t0 = time.perf_counter()
        out = go(1 + trial)
        dt = time.perf_counter() - t0
        if dt < best:  # keep ESS and time from the same trial
            best, samples = dt, out
    mu_ess = float(ess(samples[:, 0, :]))  # (N, C)
    return mu_ess / best


def bench_ess_per_s_mala(model):
    """ESS/s of μ via the fused MALA engine — gradients point the chains at
    the mode, so fewer steps buy more ESS despite the pricier step."""
    from advancedmh_tpu.diagnostics import ess
    from advancedmh_tpu.ops.pallas_mala import fused_mala_sample

    N = 4000
    # eps ≈ posterior std (~0.18 for μ) × the Roberts-Rosenthal d^{-1/6}
    # regime → s2 = eps² ≈ 0.02; realized acceptance ≈ 0.5-0.7.
    run = fused_mala_sample(
        model.tile_density, d=2, step_size_sq=0.02, n_samples=N, burn=1000,
        thin=1, consts=model.tile_consts, tile_chains=2048,
    )
    params = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, N_CHAINS))
    consts = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(params, *consts)
    g0 = jax.grad(lambda xm: jnp.sum(model.tile_density(xm, *consts)))(params)

    def go(seed):
        samples, _, accs = run(params, lp0, g0, seed)
        float(samples[-1, 0, 0])  # scalar-read fence
        return samples, accs

    go(0)
    best, samples = float("inf"), None
    for trial in range(3):
        t0 = time.perf_counter()
        out, accs = go(1 + trial)
        dt = time.perf_counter() - t0
        if dt < best:
            best, samples = dt, out
    acc = float(accs.mean())
    assert 0.1 < acc < 0.98, f"degenerate MALA acceptance {acc}"
    return float(ess(samples[:, 0, :])) / best


def bench_ess_per_s_ram(model):
    """ESS/s of μ via the fused RAM engine: 1000 adaptive warmup steps find
    the posterior's scale/shape, then frozen-S draws — no hand tuning."""
    from advancedmh_tpu.diagnostics import ess
    from advancedmh_tpu.ops import fused_ram_sample

    N = 4000
    run = fused_ram_sample(
        model.tile_density, d=2, n_samples=N, warmup=1000,
        consts=model.tile_consts, tile_chains=1024,
    )
    params = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, N_CHAINS))
    consts = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(params, *consts)
    S0 = jnp.broadcast_to(
        jnp.eye(2, dtype=jnp.float32).reshape(4, 1), (4, N_CHAINS)
    )

    def go(seed):
        samples, _, accs, _S = run(params, lp0, S0, seed)
        float(samples[-1, 0, 0])  # scalar-read fence
        return samples, accs

    go(0)
    best, samples = float("inf"), None
    for trial in range(3):
        t0 = time.perf_counter()
        out, accs = go(1 + trial)
        dt = time.perf_counter() - t0
        if dt < best:
            best, samples = dt, out
    acc = float(accs.mean())
    assert 0.05 < acc < 0.95, f"degenerate RAM acceptance {acc}"
    return float(ess(samples[:, 0, :])) / best


def bench_ess_per_s_adaptive_hmc(model):
    """ESS/s of μ via the fused AdaptiveHMC engine: 500 joint (ε, mass)
    warmup steps, then frozen trajectories — HMC's decorrelated draws buy
    ESS/draw near 1 at L gradient evals per draw."""
    from advancedmh_tpu.diagnostics import ess
    from advancedmh_tpu.ops.pallas_hmc_adapt import fused_adaptive_hmc_sample

    N, W, L = 2000, 500, 8
    run = fused_adaptive_hmc_sample(
        model.tile_density, d=2, n_samples=N, warmup=W, n_leapfrog=L,
        initial_step_size=0.05, consts=model.tile_consts, tile_chains=1024,
    )
    params = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, N_CHAINS))
    consts = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(params, *consts)
    g0 = jax.grad(lambda xm: jnp.sum(model.tile_density(xm, *consts)))(params)

    def go(seed):
        samples, _, accs, _eps, _minv = run(params, lp0, g0, seed)
        float(samples[-1, 0, 0])  # scalar-read fence
        return samples, accs

    go(0)
    best, samples = float("inf"), None
    for trial in range(3):
        t0 = time.perf_counter()
        out, accs = go(1 + trial)
        dt = time.perf_counter() - t0
        if dt < best:
            best, samples = dt, out
    acc = float(accs.mean())
    assert 0.1 < acc < 0.99, f"degenerate AdaptiveHMC acceptance {acc}"
    return float(ess(samples[:, 0, :])) / best


def bench_ess_per_s_chees(model):
    """ESS/s of μ for ChEES-HMC on the XLA batched path: 500 warmup steps
    tune (T, ε, mass) from cross-chain statistics, then frozen jittered
    trajectories — near-independent draws at a handful of gradient evals
    each."""
    from advancedmh_tpu import ChEESHMC
    from advancedmh_tpu.diagnostics import ess

    N, W = 1500, 500
    spl = ChEESHMC(initial_step_size=0.05, initial_trajectory_length=0.25,
                   max_leapfrog=16)
    master = jax.random.key(0)

    @jax.jit
    def run(seed_key):
        _, state = jax.vmap(
            lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
        )(jax.random.split(seed_key, N_CHAINS))

        def wbody(s, j):
            _, s = spl.step_warmup_batched(
                jax.random.fold_in(seed_key, j), s, model, (N_CHAINS,)
            )
            return s, None

        state, _ = jax.lax.scan(wbody, state, jnp.arange(W))

        def body(s, j):
            t, s = spl.step_batched(
                jax.random.fold_in(seed_key, W + j), s, model, (N_CHAINS,)
            )
            return s, t.params[:, 0]

        _, mus = jax.lax.scan(body, state, jnp.arange(N))
        return mus  # (N, C)

    def go(sk):
        mus = run(sk)
        float(mus[-1, 0])  # scalar-read fence
        return mus

    go(master)
    best, mus = float("inf"), None
    for trial in range(3):
        sk = jax.random.key(1 + trial)
        t0 = time.perf_counter()
        out = go(sk)
        dt = time.perf_counter() - t0
        if dt < best:
            best, mus = dt, out
    return float(ess(mus)) / best


def bench_ess_per_s_adapt_rwmh(model):
    """ESS/s of μ for StepSizeAdaptation-wrapped RWMH on the XLA batched
    path: 1000 dual-averaging warmup steps, then frozen-ε̄ draws."""
    from advancedmh_tpu import StepSizeAdaptation
    from advancedmh_tpu.diagnostics import ess

    N, W = 4000, 1000
    spl = StepSizeAdaptation.rwmh(2, initial_step_size=1.0)
    master = jax.random.key(0)

    @jax.jit
    def run(seed_key):
        _, state = jax.vmap(
            lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
        )(jax.random.split(seed_key, N_CHAINS))

        def wbody(s, j):
            _, s = spl.step_warmup_batched(
                jax.random.fold_in(seed_key, j), s, model, (N_CHAINS,)
            )
            return s, None

        state, _ = jax.lax.scan(wbody, state, jnp.arange(W))

        def body(s, j):
            t, s = spl.step_batched(
                jax.random.fold_in(seed_key, W + j), s, model, (N_CHAINS,)
            )
            return s, t.params[:, 0]

        _, mus = jax.lax.scan(body, state, jnp.arange(N))
        return mus  # (N, C)

    def go(sk):
        mus = run(sk)
        float(mus[-1, 0])  # scalar-read fence
        return mus

    go(master)
    best, mus = float("inf"), None
    for trial in range(3):
        sk = jax.random.key(1 + trial)
        t0 = time.perf_counter()
        out = go(sk)
        dt = time.perf_counter() - t0
        if dt < best:
            best, mus = dt, out
    return float(ess(mus)) / best


def main():
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    try:
        throughput, engine = bench_pallas(model)
    except AssertionError:
        # The degenerate-acceptance sanity check exists to catch a broken
        # kernel — that must fail the benchmark loudly, never silently
        # substitute the XLA number.
        raise
    except Exception as e:  # Pallas unavailable (CPU) or compile failure
        print(f"pallas path failed ({type(e).__name__}: {e}); "
              "falling back to XLA", file=sys.stderr)
        throughput, engine = bench_xla(model)

    # ESS/s companions (the BASELINE.json north-star metric) — the adaptive
    # samplers are what win it, so report them alongside the RWMH headline.
    ess_fields = {}
    for field, fn in [
        ("ess_per_s_mu", bench_ess_per_s),
        ("ess_per_s_mu_mala", bench_ess_per_s_mala),
        ("ess_per_s_mu_ram", bench_ess_per_s_ram),
        ("ess_per_s_mu_adapt_rwmh", bench_ess_per_s_adapt_rwmh),
        ("ess_per_s_mu_adaptive_hmc", bench_ess_per_s_adaptive_hmc),
        ("ess_per_s_mu_chees", bench_ess_per_s_chees),
    ]:
        try:
            ess_fields[field] = fn(model)
        except Exception as e:
            print(f"{field} skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
            ess_fields[field] = None

    print(
        json.dumps(
            {
                "metric": "rwmh_chain_steps_per_s",
                "value": throughput,
                "unit": f"chain-steps/s ({N_CHAINS} chains, README 2-param "
                        f"Gaussian model, engine={engine})",
                "vs_baseline": throughput / REFERENCE_SEQ_THROUGHPUT,
                **ess_fields,
            }
        )
    )


if __name__ == "__main__":
    main()

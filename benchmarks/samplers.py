"""Per-sampler throughput on the local accelerator.

Measures steady-state chain-steps/s (or walker-steps/s for emcee) of each
sampler's hot loop under `lax.scan`, with compile excluded (warmup uses the
same static step count as the timed run).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json
import time
from functools import partial

import jax

# Env vars alone cannot select the CPU backend here (a sitecustomize hook
# force-registers the TPU platform first); honor JAX_PLATFORMS=cpu
# explicitly so the XLA-only CPU path is actually reachable.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from timing import best_of


def _time_scan(step, state, n):
    @partial(jax.jit, static_argnums=1)
    def run(state, n):
        def body(s, j):
            return step(j, s), None

        s, _ = jax.lax.scan(body, state, jnp.arange(n))
        return s

    def go():
        # scalar-read fence: block_until_ready can return early on the axon
        # tunnel (see CLAUDE.md); a dependent host read is a true sync.
        out = run(state, n)
        return float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])

    go()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_rwmh(C=16384, n=4000):
    from advancedmh_tpu import MvNormal, RWMH, Transition
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
    master = jax.random.key(0)
    params = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (C, 1))
    state = Transition(params, jax.vmap(model.logdensity_fn)(params),
                       jnp.zeros((C,), bool))
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_mala(C=16384, n=4000):
    from advancedmh_tpu import MALA, MvNormal
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    s2 = 1e-3
    spl = MALA(lambda g: MvNormal(s2 / 2.0 * g, scale=jnp.sqrt(s2)))
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(jax.vmap(
        lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
    ))(keys)
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_ram_warmup(C=16384, n=2000, d=2):
    from advancedmh_tpu import RobustAdaptiveMetropolis
    from advancedmh_tpu.models.targets import correlated_gaussian_model

    cov = np.eye(d, dtype=np.float32)
    cov[0, 1] = cov[1, 0] = 0.5
    model = correlated_gaussian_model(cov)
    spl = RobustAdaptiveMetropolis()
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(jax.vmap(
        lambda k: spl.init(k, model, jnp.zeros(d))
    ))(keys)
    step = lambda j, s: spl.step_warmup_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_adapt_rwmh(C=16384, n=4000):
    """StepSizeAdaptation-wrapped RWMH on the batched warmup kernel: the
    dual-averaging update is ~5 elementwise ops per chain on top of the
    plain RWMH step, so the target is within ~10% of bench_rwmh."""
    from advancedmh_tpu import StepSizeAdaptation
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = StepSizeAdaptation.rwmh(2, initial_step_size=0.1)
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(jax.vmap(
        lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
    ))(keys)
    step = lambda j, s: spl.step_warmup_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_mtm(C=16384, n=1000, k=4):
    from advancedmh_tpu import (
        MultipleTryMetropolis, MvNormal, RandomWalkProposal, Transition,
    )
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = MultipleTryMetropolis(
        RandomWalkProposal(MvNormal(jnp.zeros(2), scale=0.2)), k=k
    )
    master = jax.random.key(0)
    params = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (C, 1))
    state = Transition(params, jax.vmap(model.logdensity_fn)(params),
                       jnp.zeros((C,), bool))
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_am(C=16384, n=2000):
    from advancedmh_tpu import AdaptiveMetropolis
    from advancedmh_tpu.models.targets import correlated_gaussian_model

    model = correlated_gaussian_model(
        jnp.asarray([[1.5, 0.35], [0.35, 1.0]])
    )
    spl = AdaptiveMetropolis()
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(
        jax.vmap(lambda k: spl.init(k, model, jnp.zeros(2)))
    )(keys)
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_barker(C=16384, n=4000):
    from advancedmh_tpu import Barker
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = Barker(step_size=0.05)
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(jax.vmap(
        lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
    ))(keys)
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_mtm_fused(C=16384, n=2000, k=4):
    """Fused Pallas MTM engine (TPU only): 2k−1 in-VMEM density evals/step."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops import fused_mtm

    model = gaussian_mean_scale_model()
    run = fused_mtm(
        model.tile_density, d=2, scale=0.2, k=k, n_steps=n,
        consts=model.tile_consts, tile_chains=1024,
    )
    params = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, C))
    lp0 = model.tile_density(params, jnp.asarray(model.tile_consts[0]))

    def go(seed):
        out = run(params, lp0, seed)
        return _fence(out[2])

    go(0)
    best = float("inf")
    for t in range(2):
        t0 = time.perf_counter()
        go(1 + t)
        best = min(best, time.perf_counter() - t0)
    return C * n / best


def bench_emcee(W=16384, n=2000):
    from advancedmh_tpu import Ensemble, InverseGamma, Normal, StretchProposal
    from advancedmh_tpu.models.targets import emcee_demo_model

    model = emcee_demo_model()
    spl = Ensemble(W, StretchProposal([InverseGamma(2.0, 3.0), Normal(0.0, 1.0)]))
    master = jax.random.key(0)
    _, state = jax.jit(lambda k: spl.init(k, model))(master)
    step = lambda j, s: spl.step(jax.random.fold_in(master, j), s, model)[1]
    return W * n / _time_scan(step, state, n)


def bench_emcee_fused(W=16384, n=4000):
    """Fused Pallas emcee engine (TPU only): every draw emitted, thin=1.

    Walkers must start *spread* (an ensemble collapsed to one point is a
    fixed point of the stretch move), and the warmup run uses a different
    seed so the timed call can't be served from any result cache."""
    from advancedmh_tpu.models.targets import emcee_demo_model
    from advancedmh_tpu.ops import fused_emcee_sample

    model = emcee_demo_model()
    run = fused_emcee_sample(
        model.tile_density, d=2, n_samples=n, burn=0, thin=1,
        tile_walkers=1024,
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    x_t = jnp.stack([
        1.0 + jax.random.gamma(k1, 2.0, (W,)),  # s > 0, spread
        jax.random.normal(k2, (W,)),
    ])
    lp0 = model.tile_density(x_t)

    def go(seed):
        # One tiny dependent host transfer as the fence: on the axon tunnel
        # block_until_ready alone often returns before the kernel finishes
        # (observed), while a scalar read is a true sync and costs only one
        # RTT (~2 ms) — verified against steady-state block timing.
        s, lp, acc = run(x_t, lp0, seed)
        return float(lp[-1, 0, 0])

    best, _ = best_of(go)  # warm via go(0), 3 timed trials
    return W * n / best


def bench_dr(C=16384, n=2000):
    from advancedmh_tpu import DelayedRejection, MvNormal, RandomWalkProposal, Transition
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = DelayedRejection(
        RandomWalkProposal(MvNormal(jnp.zeros(2), scale=0.5), symmetric=True),
        RandomWalkProposal(MvNormal(jnp.zeros(2), scale=0.1), symmetric=True),
    )
    master = jax.random.key(0)
    params = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (C, 1))
    state = Transition(params, jax.vmap(model.logdensity_fn)(params),
                       jnp.zeros((C,), bool))
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_dr_fused(C=16384, n=4000):
    """Fused delayed-rejection engine (TPU only): 2 densities + 2 Gaussian
    draws per step, stage-2 masked in-kernel."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops import fused_dr_sample

    model = gaussian_mean_scale_model()
    run = fused_dr_sample(
        model.tile_density, d=2, scale1=0.5, scale2=0.1, n_samples=n,
        burn=0, thin=1, consts=model.tile_consts, tile_chains=1024,
    )
    x_t = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, C))
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)

    def go(seed):
        s, lp, a = run(x_t, lp0, seed)
        return float(lp[-1, 0, 0])

    best, _ = best_of(go)
    return C * n / best


def bench_dram(C=16384, n=2000):
    from advancedmh_tpu import DRAM
    from advancedmh_tpu.models.targets import correlated_gaussian_model

    model = correlated_gaussian_model(
        jnp.asarray([[1.5, 0.35], [0.35, 1.0]])
    )
    spl = DRAM()
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(
        jax.vmap(lambda k: spl.init(k, model, jnp.zeros(2)))
    )(keys)
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_dram_fused(C=16384, n=2000, d=2):
    """Fused DRAM engine (TPU only): 2 adapted stages + Welford per step."""
    from advancedmh_tpu.models.targets import correlated_gaussian_model
    from advancedmh_tpu.ops import fused_dram_sample

    model = correlated_gaussian_model(
        jnp.asarray([[1.5, 0.35], [0.35, 1.0]])
    )
    run = fused_dram_sample(
        model.tile_density, d=d, n_samples=n, burn=0, thin=1,
        consts=model.tile_consts, tile_chains=1024,
    )
    x_t = jnp.zeros((d, C), jnp.float32)
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)
    L0 = jnp.broadcast_to(
        (0.1 / np.sqrt(d)) * jnp.eye(d).reshape(d * d, 1), (d * d, C)
    )
    n0 = jnp.ones((1, C), jnp.float32)

    def go(seed):
        s, lp, a, mf, Lf, nf = run(x_t, lp0, x_t, L0, n0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * n / best


def bench_pcn(C=16384, n=4000):
    from advancedmh_tpu import Normal, PreconditionedCrankNicolson, Transition
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    # likelihood-only target: prior N(0,1) on both params via the sampler
    model = gaussian_mean_scale_model()
    spl = PreconditionedCrankNicolson(
        Normal(0.0, 1.0), beta=0.2
    )
    master = jax.random.key(0)
    params = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (C, 1))
    state = Transition(params, jax.vmap(model.logdensity_fn)(params),
                       jnp.zeros((C,), bool))
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_pcn_fused(C=16384, n=4000):
    """Fused pCN engine (TPU only): RWMH kernel + mean contraction."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops import fused_pcn_sample

    model = gaussian_mean_scale_model()
    run = fused_pcn_sample(
        model.tile_density, d=2, loc=0.0, scale=1.0, beta=0.2,
        n_samples=n, burn=0, thin=1, consts=model.tile_consts,
        tile_chains=1024,
    )
    x_t = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, C))
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)

    def go(seed):
        s, lp, a = run(x_t, lp0, seed)
        return float(lp[-1, 0, 0])

    best, _ = best_of(go)
    return C * n / best


def bench_demc(M=16384, n=2000):
    from advancedmh_tpu import DifferentialEvolution, InverseGamma, Normal
    from advancedmh_tpu.models.targets import emcee_demo_model

    model = emcee_demo_model()
    spl = DifferentialEvolution(
        M, [InverseGamma(2.0, 3.0), Normal(0.0, 1.0)]
    )
    master = jax.random.key(0)
    _, state = jax.jit(lambda k: spl.init(k, model))(master)
    step = lambda j, s: spl.step(jax.random.fold_in(master, j), s, model)[1]
    return M * n / _time_scan(step, state, n)


def bench_demc_fused(M=16384, n=4000):
    """Fused Pallas DE-MC engine (TPU only): every draw emitted, thin=1.

    tile_members=512 is the measured peak (the one-hot-difference matmul is
    O(H^2) per half-move, so larger tiles pay quadratically; 256 pays grid
    overhead instead — 512: 6.0e8, 1024: 5.5e8, 256: 4.8e8)."""
    from advancedmh_tpu import DifferentialEvolution
    from advancedmh_tpu.models.targets import emcee_demo_model
    from advancedmh_tpu.ops import fused_demc_sample

    model = emcee_demo_model()
    gamma = DifferentialEvolution._gamma(
        DifferentialEvolution(M, None, gamma=None), 2
    )
    run = fused_demc_sample(
        model.tile_density, d=2, n_samples=n, gamma=gamma, burn=0, thin=1,
        tile_members=512,
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    x_t = jnp.stack([
        1.0 + jax.random.gamma(k1, 2.0, (M,)),  # s > 0, spread
        jax.random.normal(k2, (M,)),
    ])
    lp0 = model.tile_density(x_t)

    def go(seed):
        s, lp, acc = run(x_t, lp0, seed)
        return float(lp[-1, 0, 0])

    best, _ = best_of(go)
    return M * n / best


def _fence(*arrs):
    """Scalar host reads as a true sync (see _time_scan)."""
    return sum(float(jnp.ravel(a)[0]) for a in arrs)


def bench_mala_fused(C=16384, n=4000):
    """Fused Langevin-MALA engine (TPU only), every draw emitted."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops import fused_mala_sample

    model = gaussian_mean_scale_model()
    # tile 2048 is the measured MALA peak (RWMH/RAM peak at 1024)
    run = fused_mala_sample(
        model.tile_density, d=2, step_size_sq=1e-3, n_samples=n, burn=0,
        thin=1, consts=model.tile_consts, tile_chains=2048,
    )
    x_t = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, C))
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)
    g0 = jax.grad(lambda xm: jnp.sum(model.tile_density(xm, *ca)))(x_t)

    def go(seed):
        s, lp, a = run(x_t, lp0, g0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * n / best


def bench_hmc(C=16384, n=1000, L=5):
    """XLA batched HMC: L leapfrog steps (L+0 value_and_grad evals) per
    chain-step — reported in chain-steps/s (multiply by L for grad-evals)."""
    from advancedmh_tpu import HamiltonianMC
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = HamiltonianMC(0.05, L)
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(jax.vmap(
        lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
    ))(keys)
    step = lambda j, s: spl.step_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_adaptive_hmc(C=16384, n=1000, L=5):
    """XLA batched AdaptiveHMC warmup step: HMC trajectory + dual-averaging
    + Welford mass update per step (the adaptation overhead should be
    invisible next to L gradient evals)."""
    from advancedmh_tpu import AdaptiveHMC
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = AdaptiveHMC(n_leapfrog=L, initial_step_size=0.05)
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(jax.vmap(
        lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
    ))(keys)
    step = lambda j, s: spl.step_warmup_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_chees(C=16384, n=500):
    """XLA batched ChEES-HMC warmup: one shared jittered trajectory (traced
    while_loop) + Adam/dual-averaging/pooled-Welford updates per step.
    Reported in chain-steps/s; per-step gradient evals vary with the
    adapted L (the while_loop trip count)."""
    from advancedmh_tpu import ChEESHMC
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model

    model = gaussian_mean_scale_model()
    spl = ChEESHMC(initial_step_size=0.05, initial_trajectory_length=0.25,
                   max_leapfrog=16)
    master = jax.random.key(0)
    keys = jax.random.split(master, C)
    _, state = jax.jit(jax.vmap(
        lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
    ))(keys)
    step = lambda j, s: spl.step_warmup_batched(
        jax.random.fold_in(master, j), s, model, (C,)
    )[1]
    return C * n / _time_scan(step, state, n)


def bench_hmc_fused(C=16384, n=1000, L=5):
    """Fused HMC engine (TPU only): whole trajectories in VMEM."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops.pallas_hmc import fused_hmc_sample

    model = gaussian_mean_scale_model()
    run = fused_hmc_sample(
        model.tile_density, d=2, step_size=0.05, n_leapfrog=L, n_samples=n,
        burn=0, thin=1, consts=model.tile_consts, tile_chains=2048,
    )
    x_t = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, C))
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)
    g0 = jax.grad(lambda xm: jnp.sum(model.tile_density(xm, *ca)))(x_t)

    def go(seed):
        s, lp, a = run(x_t, lp0, g0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * n / best


def bench_barker_fused(C=16384, n=4000):
    """Fused Barker engine (TPU only), every draw emitted."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops import fused_barker_sample

    model = gaussian_mean_scale_model()
    run = fused_barker_sample(
        model.tile_density, d=2, step_size=0.05, n_samples=n, burn=0,
        thin=1, consts=model.tile_consts, tile_chains=2048,
    )
    x_t = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, C))
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)
    g0 = jax.grad(lambda xm: jnp.sum(model.tile_density(xm, *ca)))(x_t)

    def go(seed):
        s, lp, a = run(x_t, lp0, g0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * n / best


def bench_am_fused(C=16384, n=2000, d=2):
    """Fused AM engine (TPU only): mixture proposal + Welford Cholesky
    adaptation on every step, every draw emitted."""
    from advancedmh_tpu.models.targets import correlated_gaussian_model
    from advancedmh_tpu.ops import fused_am_sample

    cov = np.eye(d, dtype=np.float32)
    cov[0, 1] = cov[1, 0] = 0.5
    model = correlated_gaussian_model(cov)
    run = fused_am_sample(
        model.tile_density, d=d, n_samples=n, burn=0,
        consts=model.tile_consts, tile_chains=1024,
    )
    x_t = jnp.zeros((d, C), jnp.float32)
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)
    mean0 = x_t
    L0 = jnp.broadcast_to(
        (0.1 / np.sqrt(d)) * jnp.eye(d, dtype=jnp.float32).reshape(d * d, 1),
        (d * d, C),
    )
    n0 = jnp.ones((1, C), jnp.float32)

    def go(seed):
        s, lp, a, m, L, cnt = run(x_t, lp0, mean0, L0, n0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * n / best


def bench_tempering_fused(C=16384, n=1000, K=5):
    """Fused replica-exchange engine (TPU only): K tempered RWMH replicas +
    even-odd swaps per chain per step (K·n densities per chain counted as
    replica-steps)."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops import fused_tempering_sample

    model = gaussian_mean_scale_model()
    betas = tuple(float(b) for b in np.geomspace(1.0, 0.05, K))
    run = fused_tempering_sample(
        model.tile_density, d=2, betas=betas, scale=0.1, n_samples=n,
        burn=0, thin=1, consts=model.tile_consts, tile_chains=1024,
    )
    x_t = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (K, C))
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    ell0 = jnp.broadcast_to(
        model.tile_density(x_t[:2], *ca), (K, C)
    )

    def go(seed):
        s, lp, a, xf, ef, sw = run(x_t, ell0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * K * n / best  # replica-steps/s


def bench_ram_fused(C=16384, n=2000, d=2):
    """Fused RAM engine (TPU only): the standard 50/50 schedule — n adaptive
    warmup steps then n frozen-S emitted draws (the mix the README table
    reports; 2n total steps counted)."""
    from advancedmh_tpu.models.targets import correlated_gaussian_model
    from advancedmh_tpu.ops import fused_ram_sample

    cov = np.eye(d, dtype=np.float32)
    cov[0, 1] = cov[1, 0] = 0.5
    model = correlated_gaussian_model(cov)
    run = fused_ram_sample(
        model.tile_density, d=d, n_samples=n, warmup=n,
        consts=model.tile_consts, tile_chains=1024,
    )
    x_t = jnp.zeros((d, C), jnp.float32)
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)
    S0 = jnp.broadcast_to(
        jnp.eye(d, dtype=jnp.float32).reshape(d * d, 1), (d * d, C)
    )

    def go(seed):
        s, lp, a, S = run(x_t, lp0, S0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * 2 * n / best  # n warmup + n emitted steps per run


def bench_adapt_rwmh_fused(C=16384, n=2000):
    """Fused dual-averaging engine: n adaptive warmup steps + n emitted
    frozen-eps draws (2n total steps counted, ≙ bench_ram_fused)."""
    from advancedmh_tpu.models.targets import gaussian_mean_scale_model
    from advancedmh_tpu.ops import fused_adapt_rwmh_sample

    model = gaussian_mean_scale_model()
    run = fused_adapt_rwmh_sample(
        model.tile_density, d=2, n_samples=n, warmup=n,
        initial_step_size=1.0, consts=model.tile_consts, tile_chains=1024,
    )
    x_t = jnp.tile(jnp.asarray([[0.0], [1.0]], jnp.float32), (1, C))
    ca = tuple(jnp.asarray(c) for c in model.tile_consts)
    lp0 = model.tile_density(x_t, *ca)

    def go(seed):
        s, lp, a, eps = run(x_t, lp0, seed)
        return _fence(lp[-1])

    best, _ = best_of(go)
    return C * 2 * n / best


def main():
    out = {}
    on_tpu = jax.default_backend() in ("tpu", "axon")
    for name, fn in [
        ("rwmh", bench_rwmh),
        ("mala", bench_mala),
        ("ram_warmup", bench_ram_warmup),
        ("adapt_rwmh", bench_adapt_rwmh),
        ("emcee", bench_emcee),
        ("demc", bench_demc),
        ("dr", bench_dr),
        ("dram", bench_dram),
        ("pcn", bench_pcn),
        ("mtm", bench_mtm),
        ("am", bench_am),
        ("barker", bench_barker),
        ("hmc", bench_hmc),
        ("adaptive_hmc", bench_adaptive_hmc),
        ("chees", bench_chees),
    ] + ([
        ("mala_fused", bench_mala_fused),
        ("hmc_fused", bench_hmc_fused),
        ("ram_fused", bench_ram_fused),
        ("adapt_rwmh_fused", bench_adapt_rwmh_fused),
        ("am_fused", bench_am_fused),
        ("barker_fused", bench_barker_fused),
        ("tempering_fused", bench_tempering_fused),
        ("emcee_fused", bench_emcee_fused),
        ("demc_fused", bench_demc_fused),
        ("dr_fused", bench_dr_fused),
        ("dram_fused", bench_dram_fused),
        ("pcn_fused", bench_pcn_fused),
        ("mtm_fused", bench_mtm_fused),
    ] if on_tpu else []):
        out[name] = fn()
        unit = ("walker-steps" if "emcee" in name else
                "member-steps" if "demc" in name else "chain-steps")
        print(f"{name}: {out[name]/1e6:.1f} M {unit}/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Effective sample size, split-R̂, and MCSE.

The reference delegates these to MCMCChains downstream (reference
README.md:57-63 shows ess/rhat columns); here they are first-class, computed
with FFT-based autocovariance (O(N log N)) so they run on-device over the
full (draws × chains) batch.

Algorithms follow Vehtari et al. 2021 (rank-normalization omitted for the
plain variants): ESS via Geyer's initial monotone positive sequence over
chain-averaged autocorrelations; R̂ as split-chain potential scale reduction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _autocov(x: jax.Array) -> jax.Array:
    """Biased autocovariance per chain via FFT. x: (N, C) -> (N, C)."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    nfft = 1 << (2 * n - 1).bit_length()
    f = jnp.fft.rfft(xc, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:n]
    return acov / n


def ess(x: jax.Array) -> jax.Array:
    """Effective sample size of draws ``x`` shaped (N,), (N, C).

    Returns a scalar ESS aggregated over chains (total draws deflated by the
    integrated autocorrelation time).
    """
    if x.ndim == 1:
        x = x[:, None]
    n, c = x.shape
    acov = _autocov(x)  # (N, C)
    # Between/within blending as in Vehtari et al. (2021), eq. 10.
    mean_var = jnp.mean(acov[0]) * n / (n - 1.0)
    var_plus = mean_var * (n - 1.0) / n
    if c > 1:
        var_plus = var_plus + jnp.var(jnp.mean(x, axis=0), ddof=1)
    rho = 1.0 - (mean_var - jnp.mean(acov, axis=1)) / var_plus  # (N,)

    # Geyer initial positive monotone sequence on paired sums
    # P_k = rho_{2k} + rho_{2k+1}: monotone-enforce via running min, then the
    # first non-positive pair truncates everything after it (the running min
    # keeps subsequent pairs non-positive, so masking == truncation).
    n_pairs = n // 2
    pair_sums = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]
    pair_sums = jax.lax.associative_scan(jnp.minimum, pair_sums)
    tau = 2.0 * jnp.sum(jnp.where(pair_sums > 0, pair_sums, 0.0)) - 1.0
    tau = jnp.maximum(tau, 1e-6)
    return n * c / tau


def rhat(x: jax.Array) -> jax.Array:
    """Split-chain R̂ of draws ``x`` shaped (N,) or (N, C)."""
    if x.ndim == 1:
        x = x[:, None]
    n, c = x.shape
    half = n // 2
    x = jnp.concatenate([x[:half], x[half : 2 * half]], axis=1)  # (half, 2C)
    n, m = x.shape
    chain_means = jnp.mean(x, axis=0)
    chain_vars = jnp.var(x, axis=0, ddof=1)
    between = n * jnp.var(chain_means, ddof=1)
    within = jnp.mean(chain_vars)
    var_plus = (n - 1.0) / n * within + between / n
    return jnp.sqrt(var_plus / within)


def mcse(x: jax.Array) -> jax.Array:
    """Monte-Carlo standard error of the mean via ESS."""
    if x.ndim == 1:
        x = x[:, None]
    return jnp.std(x) / jnp.sqrt(ess(x))


# -- rank-normalized diagnostics (Vehtari et al. 2021, §4.1-4.3) ------------
#
# The plain ess/rhat above match the classic formulas; the rank-normalized
# variants below are the modern recommended defaults (what reference users
# get from current MCMCChains/ArviZ downstream): robust to heavy tails and
# nonlinear transformations because draws are replaced by normal quantiles
# of their pooled ranks before the autocovariance analysis.


def _rank_normalize(x: jax.Array) -> jax.Array:
    """Fractional (average) ranks over all draws → standard-normal quantiles.

    x: (N, C). Ranks are computed over the pooled N·C draws with the
    Blom-style offset (r − 3/8)/(S + 1/4), then mapped through Φ⁻¹.
    """
    n, c = x.shape
    s = n * c
    flat = x.reshape(-1)
    order = jnp.argsort(flat)
    ranks = jnp.empty_like(flat).at[order].set(
        jnp.arange(1, s + 1, dtype=x.dtype)
    )
    p = (ranks - 0.375) / (s + 0.25)
    # f32 guard: for s > 2²⁴ the top fractional ranks round to exactly 1.0
    # and Φ⁻¹ returns +inf, which poisons the FFT autocovariance and
    # collapses τ to its clamp — ESS then reads as N·C/1e-6 (first hit at
    # the 4000-draw × 16384-chain bench batch). Clip into the widest open
    # interval f32 resolves around (0, 1); the extreme-tail scores
    # saturate at |z| ≈ 5.1, irrelevant for the autocorrelation analysis.
    tiny = jnp.asarray(1.5e-7, p.dtype)
    z = jax.scipy.special.ndtri(jnp.clip(p, tiny, 1.0 - tiny))
    return z.reshape(n, c)


def ess_bulk(x: jax.Array) -> jax.Array:
    """Bulk ESS: ESS of the rank-normalized draws (Vehtari 2021 eq. 14)."""
    if x.ndim == 1:
        x = x[:, None]
    return ess(_rank_normalize(x))


def ess_tail(x: jax.Array, prob: float = 0.05) -> jax.Array:
    """Tail ESS: min ESS of the {prob, 1−prob} quantile indicator draws —
    sampling efficiency in the distribution tails (Vehtari 2021 §4.3)."""
    if x.ndim == 1:
        x = x[:, None]
    lo = jnp.quantile(x, prob)
    hi = jnp.quantile(x, 1.0 - prob)
    e_lo = ess((x <= lo).astype(jnp.float32))
    e_hi = ess((x >= hi).astype(jnp.float32))
    return jnp.minimum(e_lo, e_hi)


def rhat_rank(x: jax.Array) -> jax.Array:
    """Rank-normalized split-R̂: max of R̂ on the rank-normalized draws and
    on the folded (|x − median|) rank-normalized draws (Vehtari 2021 §4.2)
    — catches location *and* scale disagreement between chains."""
    if x.ndim == 1:
        x = x[:, None]
    bulk = rhat(_rank_normalize(x))
    folded = rhat(_rank_normalize(jnp.abs(x - jnp.median(x))))
    return jnp.maximum(bulk, folded)


# -- integrated autocorrelation time (Sokal window) --------------------------


def integrated_autocorr_time(
    x: jax.Array, c: float = 5.0
) -> jax.Array:
    """Integrated autocorrelation time τ of draws ``x`` shaped (N,) or
    (N, C) — the ensemble-MCMC convergence diagnostic of Goodman-Weare 2010
    §3 / Sokal 1997 (what emcee exposes as ``get_autocorr_time``; chains or
    walkers both average the same way).

    The per-chain autocorrelation functions are averaged, then
    τ(M) = 1 + 2·Σ_{t≤M} ρ(t) is evaluated at the smallest Sokal window M
    with M ≥ c·τ(M) (c = 5 is the emcee default). A run is trusted when
    N ≳ 50·τ; below that the estimate itself is noisy — callers should
    compare τ against ``x.shape[0] / 50`` (we return τ rather than raising,
    so the check composes with jit).
    """
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    acov = _autocov(x)  # (N, C), per-chain
    rho = jnp.mean(acov / acov[0], axis=1)  # ensemble-averaged ACF, ρ(0)=1
    taus = 2.0 * jnp.cumsum(rho) - 1.0  # τ(M) including t=0 term once
    m = jnp.arange(n, dtype=taus.dtype)
    windowed = m >= c * taus
    # smallest window satisfying the Sokal criterion; fall back to N−1
    idx = jnp.where(jnp.any(windowed), jnp.argmax(windowed), n - 1)
    return jnp.maximum(taus[idx], 1.0)


def rhat_nested(x: jax.Array, num_superchains: int) -> jax.Array:
    """Nested R̂ (Margossian, Hoffman, Sountsov, Vehtari et al. 2022) —
    convergence assessment for the **many-short-chains regime** this
    framework runs in (10k+ chains × tens of draws), where classic split-R̂
    is powerless: with N small the within-chain variance estimate is pure
    noise, and split-R̂ needs long chains to compare halves.

    Chains are grouped into ``num_superchains`` groups of M = C/K chains
    (contiguous along the chain axis; initialize each superchain's chains
    from ONE common draw of an overdispersed init so between-superchain
    spread witnesses non-convergence). With B̂ the population variance of
    superchain means and Ŵ = mean_k(B̂_k + Ŵ_k) — the between-chain and
    mean within-chain variances inside superchain k —

        nR̂ = sqrt(1 + B̂ / Ŵ).

    Valid down to N = 1 draw per chain (Ŵ_k degenerates to 0 and the
    between-chain term carries the test) — the property that makes it the
    right diagnostic after a short sampling phase on a big chain batch.

    ``x``: draws shaped (N, C); C must be divisible by ``num_superchains``.
    """
    if x.ndim == 1:
        raise ValueError("rhat_nested needs a chain axis: x shaped (N, C)")
    n, c = x.shape
    k = int(num_superchains)
    if k < 2:
        raise ValueError("num_superchains must be >= 2")
    if c % k != 0:
        raise ValueError(
            f"num chains {c} must be divisible by num_superchains {k}"
        )
    m = c // k
    xs = x.reshape(n, k, m)
    chain_means = jnp.mean(xs, axis=0)  # (K, M)
    within_chain = (
        jnp.var(xs, axis=0, ddof=1) if n > 1
        else jnp.zeros_like(chain_means)
    )  # (K, M): s²_km (0 when a single draw per chain)
    super_means = jnp.mean(chain_means, axis=1)  # (K,)
    b_k = jnp.var(chain_means, axis=1)  # population var of chain means
    w_k = jnp.mean(within_chain, axis=1)
    b_hat = jnp.var(super_means)  # population var of superchain means
    w_hat = jnp.mean(b_k + w_k)
    return jnp.sqrt(1.0 + b_hat / jnp.maximum(w_hat, 1e-30))

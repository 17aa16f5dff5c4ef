"""Discrete distributions.

The reference accepts any Distributions.jl sampleable as a proposal payload,
including discrete ones (static integer-support proposals, symmetric
random-walk moves on lattices). Samples are returned as floats so they flow
through the same accept/select pytree machinery; log_prob evaluates on the
(integer-valued) float draws.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random as jr

from ..utils import pytree_dataclass
from .base import Distribution
from .univariate import _bshape


@pytree_dataclass
class Bernoulli(Distribution):
    p: jax.Array = 0.5

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.p)
        return jr.bernoulli(key, self.p, shape).astype(jnp.float32)

    def log_prob(self, x):
        return jnp.where(x > 0.5, jnp.log(self.p), jnp.log1p(-self.p))


@pytree_dataclass
class Poisson(Distribution):
    rate: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.rate)
        return jr.poisson(key, self.rate, shape).astype(jnp.float32)

    def log_prob(self, x):
        lp = x * jnp.log(self.rate) - self.rate - jax.scipy.special.gammaln(x + 1.0)
        return jnp.where(x >= 0, lp, -jnp.inf)


@pytree_dataclass
class Binomial(Distribution):
    n: jax.Array = 1.0
    p: jax.Array = 0.5

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.n, self.p)
        return jr.binomial(key, self.n, self.p, shape=shape).astype(jnp.float32)

    def log_prob(self, x):
        n, p = self.n, self.p
        logc = (
            jax.scipy.special.gammaln(n + 1.0)
            - jax.scipy.special.gammaln(x + 1.0)
            - jax.scipy.special.gammaln(n - x + 1.0)
        )
        lp = logc + x * jnp.log(p) + (n - x) * jnp.log1p(-p)
        return jnp.where((x >= 0) & (x <= n), lp, -jnp.inf)


@pytree_dataclass
class Geometric(Distribution):
    """Number of failures before the first success (Distributions.jl
    convention), support {0, 1, ...}."""

    p: jax.Array = 0.5

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.p)
        u = jr.uniform(key, shape)
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-self.p))

    def log_prob(self, x):
        lp = x * jnp.log1p(-self.p) + jnp.log(self.p)
        return jnp.where(x >= 0, lp, -jnp.inf)


@pytree_dataclass
class Categorical(Distribution):
    """Categories 0..K-1 with probability vector ``probs`` (last axis)."""

    probs: jax.Array = None

    def sample(self, key, sample_shape=()):
        logits = jnp.log(self.probs)
        shape = sample_shape + jnp.shape(self.probs)[:-1]
        return jr.categorical(key, logits, shape=shape).astype(jnp.float32)

    def log_prob(self, x):
        idx = x.astype(jnp.int32)
        lp = jnp.log(jnp.take_along_axis(
            jnp.broadcast_to(self.probs, jnp.shape(x) + jnp.shape(self.probs)[-1:]),
            idx[..., None], axis=-1,
        ))[..., 0]
        k = jnp.shape(self.probs)[-1]
        return jnp.where((x >= 0) & (x < k), lp, -jnp.inf)


@pytree_dataclass
class DiscreteUniform(Distribution):
    """Uniform on integers {low, ..., high} inclusive."""

    low: jax.Array = 0.0
    high: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.low, self.high)
        lo = jnp.asarray(self.low, jnp.int32)
        hi = jnp.asarray(self.high, jnp.int32)
        return jr.randint(key, shape, lo, hi + 1).astype(jnp.float32)

    def log_prob(self, x):
        n = self.high - self.low + 1.0
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, -jnp.log(n), -jnp.inf)

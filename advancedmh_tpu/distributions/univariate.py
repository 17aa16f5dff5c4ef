"""Univariate distributions (vectorized over batch shapes).

Log-densities are hand-written in terms of ``jax.numpy`` primitives so XLA can
fuse them into the sampler's scanned kernel; sampling uses ``jax.random``
counter-based draws. Covers the set exercised by the reference's tests
(Normal, MvNormal, InverseGamma, Laplace, Cauchy, TDist — reference
test/runtests.jl:262-285) plus the common extras.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import random as jr

from ..utils import pytree_dataclass
from .base import Distribution

_LOG_2PI = math.log(2.0 * math.pi)


def _bshape(*params):
    """Broadcast shape of distribution parameters (batch shape)."""
    return jnp.broadcast_shapes(*(jnp.shape(p) for p in params))


@pytree_dataclass
class Normal(Distribution):
    loc: jax.Array = 0.0
    scale: jax.Array = 1.0

    def sample(self, key, sample_shape: Tuple[int, ...] = ()):
        shape = sample_shape + _bshape(self.loc, self.scale)
        return self.loc + self.scale * jr.normal(key, shape)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)


@pytree_dataclass
class LogNormal(Distribution):
    loc: jax.Array = 0.0
    scale: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.loc, self.scale)
        return jnp.exp(self.loc + self.scale * jr.normal(key, shape))

    def log_prob(self, x):
        logx = jnp.log(x)
        z = (logx - self.loc) / self.scale
        lp = -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale) - logx
        return jnp.where(x > 0, lp, -jnp.inf)


@pytree_dataclass
class Uniform(Distribution):
    low: jax.Array = 0.0
    high: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.low, self.high)
        return jr.uniform(key, shape, minval=self.low, maxval=self.high)

    def log_prob(self, x):
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)


@pytree_dataclass
class Exponential(Distribution):
    rate: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.rate)
        return jr.exponential(key, shape) / self.rate

    def log_prob(self, x):
        lp = jnp.log(self.rate) - self.rate * x
        return jnp.where(x >= 0, lp, -jnp.inf)


@pytree_dataclass
class Laplace(Distribution):
    loc: jax.Array = 0.0
    scale: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.loc, self.scale)
        return self.loc + self.scale * jr.laplace(key, shape)

    def log_prob(self, x):
        return -jnp.abs(x - self.loc) / self.scale - jnp.log(2.0 * self.scale)


@pytree_dataclass
class Cauchy(Distribution):
    loc: jax.Array = 0.0
    scale: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.loc, self.scale)
        return self.loc + self.scale * jr.cauchy(key, shape)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -jnp.log1p(z * z) - jnp.log(jnp.pi * self.scale)


@pytree_dataclass
class StudentT(Distribution):
    """Student's t distribution (≙ Distributions.jl ``TDist`` when loc=0, scale=1)."""

    df: jax.Array = 1.0
    loc: jax.Array = 0.0
    scale: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.df, self.loc, self.scale)
        return self.loc + self.scale * jr.t(key, self.df, shape)

    def log_prob(self, x):
        df = self.df
        z = (x - self.loc) / self.scale
        lognorm = (
            jax.scipy.special.gammaln(0.5 * (df + 1.0))
            - jax.scipy.special.gammaln(0.5 * df)
            - 0.5 * jnp.log(df * jnp.pi)
            - jnp.log(self.scale)
        )
        return lognorm - 0.5 * (df + 1.0) * jnp.log1p(z * z / df)


def TDist(df):
    """Alias matching the reference's ``TDist(ν)`` (standard Student's t)."""
    return StudentT(df=df)


@pytree_dataclass
class Gamma(Distribution):
    """Gamma(shape=concentration, rate) — Distributions.jl uses (shape, scale)."""

    concentration: jax.Array = 1.0
    rate: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.concentration, self.rate)
        return jr.gamma(key, self.concentration, shape) / self.rate

    def log_prob(self, x):
        a, b = self.concentration, self.rate
        lp = (
            a * jnp.log(b)
            - jax.scipy.special.gammaln(a)
            + (a - 1.0) * jnp.log(x)
            - b * x
        )
        return jnp.where(x > 0, lp, -jnp.inf)


@pytree_dataclass
class InverseGamma(Distribution):
    """InverseGamma(shape, scale) matching Distributions.jl ``InverseGamma(α, θ)``.

    Used by the reference's mixed-proposal and emcee tests
    (reference test/runtests.jl:184, test/emcee.jl:13).
    """

    concentration: jax.Array = 1.0
    scale: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.concentration, self.scale)
        return self.scale / jr.gamma(key, self.concentration, shape)

    def log_prob(self, x):
        a, s = self.concentration, self.scale
        lp = (
            a * jnp.log(s)
            - jax.scipy.special.gammaln(a)
            - (a + 1.0) * jnp.log(x)
            - s / x
        )
        return jnp.where(x > 0, lp, -jnp.inf)


@pytree_dataclass
class Beta(Distribution):
    a: jax.Array = 1.0
    b: jax.Array = 1.0

    def sample(self, key, sample_shape=()):
        shape = sample_shape + _bshape(self.a, self.b)
        return jr.beta(key, self.a, self.b, shape)

    def log_prob(self, x):
        lp = (
            (self.a - 1.0) * jnp.log(x)
            + (self.b - 1.0) * jnp.log1p(-x)
            - jax.scipy.special.betaln(self.a, self.b)
        )
        return jnp.where((x > 0) & (x < 1), lp, -jnp.inf)

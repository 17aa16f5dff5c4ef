from .base import Distribution
from .univariate import (
    Normal,
    LogNormal,
    Uniform,
    Exponential,
    Laplace,
    Cauchy,
    StudentT,
    TDist,
    Gamma,
    InverseGamma,
    Beta,
)
from .multivariate import MvNormal
from .discrete import (
    Bernoulli,
    Poisson,
    Binomial,
    Geometric,
    Categorical,
    DiscreteUniform,
)

__all__ = [
    "Bernoulli",
    "Poisson",
    "Binomial",
    "Geometric",
    "Categorical",
    "DiscreteUniform",
    "Distribution",
    "Normal",
    "LogNormal",
    "Uniform",
    "Exponential",
    "Laplace",
    "Cauchy",
    "StudentT",
    "TDist",
    "Gamma",
    "InverseGamma",
    "Beta",
    "MvNormal",
]

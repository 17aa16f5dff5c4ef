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

__all__ = [
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

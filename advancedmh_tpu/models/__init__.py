from .density import (
    DensityModel,
    CapabilityOrder,
    as_model,
    logdensity,
    logdensity_batched,
    logdensity_and_gradient,
    check_capabilities,
    guarded_logdensity,
)
from .targets import (
    gaussian_mean_scale_model,
    correlated_gaussian_model,
    emcee_demo_model,
    logistic_regression_model,
    gp_latent_model,
)

__all__ = [
    "DensityModel",
    "CapabilityOrder",
    "as_model",
    "logdensity",
    "logdensity_batched",
    "logdensity_and_gradient",
    "check_capabilities",
    "guarded_logdensity",
    "gaussian_mean_scale_model",
    "correlated_gaussian_model",
    "emcee_demo_model",
    "logistic_regression_model",
    "gp_latent_model",
]

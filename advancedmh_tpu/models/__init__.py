from .density import (
    DensityModel,
    CapabilityOrder,
    as_model,
    logdensity,
    logdensity_and_gradient,
    check_capabilities,
    guarded_logdensity,
)

__all__ = [
    "DensityModel",
    "CapabilityOrder",
    "as_model",
    "logdensity",
    "logdensity_and_gradient",
    "check_capabilities",
    "guarded_logdensity",
]

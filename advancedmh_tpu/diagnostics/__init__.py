from .ess import ess, rhat, mcse

__all__ = ["ess", "rhat", "mcse"]

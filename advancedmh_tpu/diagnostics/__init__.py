from .ess import ess, ess_bulk, ess_tail, rhat, rhat_rank, mcse

__all__ = ["ess", "ess_bulk", "ess_tail", "rhat", "rhat_rank", "mcse"]

from .ess import (ess, ess_bulk, ess_tail, integrated_autocorr_time, mcse,
                  rhat, rhat_nested, rhat_rank)

__all__ = ["ess", "ess_bulk", "ess_tail", "integrated_autocorr_time",
           "mcse", "rhat", "rhat_nested", "rhat_rank"]

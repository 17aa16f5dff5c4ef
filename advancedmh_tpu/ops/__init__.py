from .cholesky import chol_rank1_update, chol_rank1_update_batched

__all__ = ["chol_rank1_update", "chol_rank1_update_batched"]

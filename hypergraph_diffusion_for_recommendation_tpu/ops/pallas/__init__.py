from .segment_spmm import BlockedCOO, blocked_spmm, pack_blocked

__all__ = ["BlockedCOO", "blocked_spmm", "pack_blocked"]

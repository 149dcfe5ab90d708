from .segment_spmm import BlockedCOO, blocked_spmm, pack_blocked, pack_blocked_dedup

__all__ = ["BlockedCOO", "blocked_spmm", "pack_blocked", "pack_blocked_dedup"]

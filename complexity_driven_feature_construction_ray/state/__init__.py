from .checkpoint import LineageStore, resumable_backfill

__all__ = ["LineageStore", "resumable_backfill"]

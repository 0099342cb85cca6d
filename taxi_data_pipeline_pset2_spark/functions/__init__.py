from .scalars import duration_hours, guarded_pct, surrogate_id

__all__ = ["duration_hours", "guarded_pct", "surrogate_id"]

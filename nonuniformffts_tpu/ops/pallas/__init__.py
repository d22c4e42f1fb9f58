from .blocked import spread_blocked, interpolate_blocked

__all__ = ["spread_blocked", "interpolate_blocked"]

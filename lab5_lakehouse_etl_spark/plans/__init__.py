"""Physical-plan inspection helpers (scale hygiene checks)."""

from .inspect import (
    explain_str,
    has_broadcast_join,
    job_count,
    has_pushed_filters,
    scan_read_schema,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "job_count",
    "has_pushed_filters",
    "scan_read_schema",
    "shuffle_count",
]

"""Versioned parquet lakehouse tables with MERGE upsert (Delta stand-in)."""

from .table import LakeTable, create_or_merge

__all__ = ["LakeTable", "create_or_merge"]

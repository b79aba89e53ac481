"""Versioned parquet lakehouse tables with MERGE upsert (Delta stand-in)."""

from .table import LakeTable

__all__ = ["LakeTable"]

"""Declared-query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
ANSI-SQL string a DuckDB oracle runs over the same parquet tables.
``__spark_entry__`` re-exports this registry to the correctness driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> query callable
QUERIES: dict[str, QueryFn] = {}
#: name -> DuckDB oracle SQL (absent => rows-only check)
ORACLES: dict[str, str] = {}

_MODULES = (
    "relational",
    "sources_ops",
    "aggregates",
    "windows",
    "joins",
    "scalar_fns",
    "text_ops",
    "dedup_ops",
    "corpus_ops",
    "similarity_ops",
    "multimodal_ops",
    "lakehouse_ops",
    "streaming_ops",
    "pipeline_ops",
    "subqueries",
    "tpch",
    "events_ops",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle`` is its DuckDB twin SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")

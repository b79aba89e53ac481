"""Orchestrator replacing the Step Functions state machine
(step_functions/state_machine.json, SURVEY §3.1).

The reference's Choice state routes to exactly ONE Glue job per
execution, first-match order products > orders > order_items
(state_machine.json:25-45 — the README's claim of parallel fan-out is
wrong, SURVEY §2.12). `choose_job` reproduces that routing;
`run_all` is the sane local default: all three in FK dependency order
(orders → order_items → products, so the RI joins see fresh tables).
Crawler+Athena validation collapses to a spark.sql smoke query over
the written tables (schema lives in the parquet/manifest, no separate
catalog materialization step). SNS failure notify → raised exceptions;
per-run metrics dicts replace CloudWatch logs.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from ..lakehouse import LakeTable
from .config import ZoneConfig
from .order_items import run_order_items
from .orders import run_orders
from .products import run_products


def _has_files(zones: ZoneConfig, job: str) -> bool:
    """The CountFiles Lambda (state_machine.json:5-24): probe the raw
    zone for each job's input."""
    return bool(glob.glob(os.path.join(zones.raw, job, "*.csv")))


def choose_job(zones: ZoneConfig) -> str | None:
    """FileCountChoice first-match routing (state_machine.json:25-45)."""
    for job in ("products", "orders", "order_items"):
        if _has_files(zones, job):
            return job
    return None  # → the reference's SNS "no files" notify


def validate(spark: SparkSession, zones: ZoneConfig, table: str) -> int:
    """Crawler + Athena validation (state_machine.json:117-124): register
    the written snapshot in the persistent ``lakehouse_dwh`` database
    (the crawler step), then run the reference's exact
    SELECT * ... LIMIT 10 through the catalog (the Athena step)."""
    qualified = LakeTable(zones.table_path(table)).register(spark, table)
    return spark.sql(f"SELECT * FROM {qualified} LIMIT 10").count()


_RUNNERS = {
    "products": run_products,
    "orders": run_orders,
    "order_items": run_order_items,
}


def _run_with_retry(
    fn,
    *args,
    max_attempts: int = 3,
    interval: float = 5.0,
    backoff: float = 2.0,
    sleep=None,
):
    """Step Functions Retry block twin (state_machine.json:52-59:
    IntervalSeconds 5, MaxAttempts 3, BackoffRate 2): re-run a failed
    job up to ``max_attempts`` times with exponential backoff, then
    re-raise (the Catch → "Notify Job Failed" path maps to the raised
    exception per this module's docstring).  ``sleep`` is injectable
    for tests; delays are 5s, 10s for the default policy."""
    import time as _time

    sleep = sleep or _time.sleep
    delay = interval
    for attempt in range(1, max_attempts + 1):
        try:
            return fn(*args)
        except Exception:
            if attempt == max_attempts:
                raise
            sleep(delay)
            delay *= backoff


def run_all(
    spark: SparkSession,
    zones: ZoneConfig,
    *,
    max_attempts: int = 3,
    retry_interval: float = 5.0,
    backoff: float = 2.0,
    _sleep=None,
) -> list[dict]:
    """Run every job with input, in FK dependency order, each followed
    by its validation read.  Each job gets the reference's per-job
    retry policy (3 attempts, backoff 2 — state_machine.json:52-59);
    a job that exhausts its retries raises, matching the Catch →
    SNS-notify terminal state."""
    metrics = []
    for job in ("orders", "order_items", "products"):
        if not _has_files(zones, job):
            continue
        m = _run_with_retry(
            _RUNNERS[job],
            spark,
            zones,
            max_attempts=max_attempts,
            interval=retry_interval,
            backoff=backoff,
            sleep=_sleep,
        )
        m["validated_rows"] = validate(spark, zones, job)
        metrics.append(m)
    return metrics

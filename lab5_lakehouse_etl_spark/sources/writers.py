"""Sinks + archival (SURVEY §2.1 S9-S13).

The reference writes rejected rows as JSON (orders) or CSV (items),
run logs as single-file text, and archives processed raw files with a
timestamp suffix via boto3 copy+delete (jobs/order_glue_job.py:58-82).
Local FS replaces S3; everything else keeps the same contract.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def write_rejected_json(df: DataFrame, path: str) -> None:
    """S9: overwrite-JSON quarantine sink (jobs/order_glue_job.py:171)."""
    df.write.mode("overwrite").json(path)


def write_rejected_csv(df: DataFrame, path: str) -> None:
    """S10: overwrite-CSV quarantine sink
    (jobs/order_items_glue_job.py:143)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_log_text(lines: list[str], path: str, spark) -> None:
    """S11/S12: run-metrics log as a single text file.

    The reference does ``parallelize(...).coalesce(1).saveAsTextFile``
    (jobs/order_glue_job.py:210) — an RDD detour we replace with a
    1-column DataFrame write; coalesce(1) is correct here because a log
    is inherently a single small file."""
    df = spark.createDataFrame([(line,) for line in lines], "line STRING")
    df.coalesce(1).write.mode("overwrite").text(path)


def archive_file(src: str, archive_dir: str, now: datetime | None = None) -> str:
    """S13: move a processed raw file into the archive zone with a
    timestamp suffix (tests/utils.py:11-47 copy+delete semantics;
    shutil.move replaces the S3 copy+delete pair)."""
    now = now or datetime.now(timezone.utc)
    os.makedirs(archive_dir, exist_ok=True)
    base, ext = os.path.splitext(os.path.basename(src))
    dst = os.path.join(
        archive_dir, f"{base}_{now.strftime('%Y%m%d_%H%M%S')}{ext}"
    )
    shutil.move(src, dst)
    return dst

"""Bucketed tables: pre-shuffled storage for exchange-free joins.

The reference's warehouse partitions by a low-cardinality column
(date / department_id) for pruning. Bucketing is the complementary
layout for JOIN keys: ``bucketBy(N, key)`` hash-partitions rows into N
files per partition at WRITE time, and Spark's scan reports that
distribution — so a join or aggregation on the bucket key needs NO
Exchange at read time. At 100 TB this converts the recurring cost of
shuffling a fact table on every join into a one-time write-side cost,
the same trade Hive/Iceberg/Delta clustered tables make.

tests/test_bucketing.py asserts the plan property: bucketed join → zero
Exchange operators; unbucketed same join → two.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table.

    Sorting within buckets additionally removes the Sort below a
    sort-merge join. n_buckets should divide evenly into cluster cores;
    both join sides must use the SAME n_buckets for co-location.

    Idempotent across JVMs: a managed table's location can outlive the
    in-memory catalog entry (previous session wrote it, this session's
    catalog is empty), in which case saveAsTable refuses with
    LOCATION_ALREADY_EXISTS — so drop the table AND clear any orphaned
    location first.
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planned as a
    SortMergeJoin with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
